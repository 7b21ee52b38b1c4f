"""Checkpointing: parameter pytrees + auxiliary payloads in one msgpack blob.

Replaces torch.save/load of state_dicts (model.py:49-53) and the IGCN
family's extended payload (user_map/item_map/alpha, model.py:4208-4220).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path, params, opt_state=None, aux=None):
    path = os.fspath(path)
    payload = {
        "params": serialization.to_state_dict(jax.device_get(params)),
        "aux": serialization.to_state_dict(aux or {}),
    }
    if opt_state is not None:
        # optax states are (nested) NamedTuples; to_state_dict flattens them
        # into msgpack-serializable dicts, restore_like re-shapes on load
        payload["opt_state"] = serialization.to_state_dict(jax.device_get(opt_state))
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        blob = f.read()
    payload = serialization.msgpack_restore(blob)
    return payload


def restore_like(template, restored):
    """Coerce a restored (dict-of-numpy) tree onto the dtypes/structure of
    ``template`` (msgpack loses tuple/list distinctions in opt states).

    Restoration is BY PATH (flax from_state_dict), not by flatten order —
    msgpack turns lists into dicts keyed '0', '1', ..., whose lexicographic
    leaf order ('0', '1', '10', '2', ...) silently permutes equal-shaped
    entries once a serialized list exceeds 10 elements."""
    restored_t = serialization.from_state_dict(template, restored)
    return jax.tree_util.tree_map(
        lambda t, r: np.asarray(r)
        .astype(np.asarray(t).dtype)
        .reshape(np.shape(t)),
        template,
        restored_t,
    )
