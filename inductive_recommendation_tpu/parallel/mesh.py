"""Mesh construction + parameter sharding rules."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int | None = None, devices=None):
    """Mesh with axes ('data', 'model').

    Defaults: use all devices; put as much as possible on 'model' (embedding
    tables dominate memory in recsys) unless n_data given.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None and n_model is None:
        n_data, n_model = 1, n
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, (n_data, n_model, n)
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


# parameter partition rules: embedding-like tables row-sharded over 'model',
# everything else replicated
_TABLE_KEYS = (
    "embedding",
    "user_embedding",
    "item_embedding",
    "mf_user_embedding",
    "mf_item_embedding",
    "mlp_user_embedding",
    "mlp_item_embedding",
)


def param_spec(path_key: str, value) -> P:
    if path_key in _TABLE_KEYS and np.ndim(value) == 2:
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh: tables row-sharded over
    'model', the rest replicated."""

    def place(path, value):
        key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return jax.device_put(value, NamedSharding(mesh, param_spec(key, value)))

    return jax.tree_util.tree_map_with_path(place, params)
