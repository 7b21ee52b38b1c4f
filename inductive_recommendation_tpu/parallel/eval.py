"""Sharded exact retrieval: score against item-sharded representations and
merge per-device top-k candidates.

The north-star serving path: item embeddings live row-sharded over the
'model' mesh axis; each device scores its item shard for the user batch,
takes a LOCAL masked top-k, and only the k candidates per device cross the
interconnect (all-gather + k-way merge, ops/topk.py::sharded_topk) —
communication O(n_dev * k) instead of O(n_items) per user row.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from inductive_recommendation_tpu.ops.topk import mask_scores, sharded_topk


def pad_items_to_mesh(n_items: int, mesh: Mesh) -> int:
    n_model = mesh.shape["model"]
    return -(-n_items // n_model) * n_model


def make_sharded_recommender(mesh: Mesh, n_items: int, k: int, jit: bool = True):
    """-> fn(users_rep [B, d], items_rep [n_items_pad, d], exclude [B, L],
    banned [n_items_pad] bool) -> [B, k] global item ids.

    ``items_rep``/``banned`` must be padded to a multiple of the 'model'
    axis size (pad rows scored -inf via ``banned``). ``exclude`` uses global
    item ids; any id outside a shard's local range (incl. the n_items or
    n_items_pad sentinels) is a no-op there. ``jit=False`` returns the bare
    shard_map for embedding into a caller's larger jit.
    """
    n_pad = pad_items_to_mesh(n_items, mesh)
    n_local = n_pad // mesh.shape["model"]

    def local_fn(users_rep, items_local, exclude, banned_local):
        shard = jax.lax.axis_index("model")
        scores = users_rep @ items_local.T  # [B, n_local]
        # exclusion: map global ids into this shard's local range; ids
        # outside it become the sentinel n_local, which masked_topk's
        # drop-mode scatter discards
        local_e = exclude - shard * n_local
        safe_e = jnp.where((local_e >= 0) & (local_e < n_local), local_e, n_local)
        scores = mask_scores(scores, safe_e, banned_local)
        _, idx = sharded_topk(scores, k, "model")
        return idx

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None), P("model", None), P(None, None), P("model")),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(fn) if jit else fn


@functools.lru_cache(maxsize=8)
def _batched_recommenders(mesh: Mesh, n_items: int, k: int):
    """Cached jitted batch runners: jax's jit cache is keyed on the callable,
    so rebuilding these closures per evaluate() would re-trace (and, without
    a warm persistent cache, recompile) the whole sharded retrieval program
    every epoch. Mesh is hashable; one entry per (mesh, n_items, k)."""
    n_pad = pad_items_to_mesh(n_items, mesh)
    recommender = make_sharded_recommender(mesh, n_items, k, jit=False)

    @jax.jit
    def run_batch(rep, items_rep, excl, banned, users):
        users_rep = rep[users]
        e = excl[users]
        return recommender(users_rep, items_rep, e, banned)

    @jax.jit
    def run_batch_plain(rep, items_rep, banned, users):
        users_rep = rep[users]
        e = jnp.full((users.shape[0], 1), n_pad, jnp.int32)
        return recommender(users_rep, items_rep, e, banned)

    return run_batch, run_batch_plain


def sharded_recommend_all_users(
    mesh: Mesh,
    rep: jnp.ndarray,
    n_users: int,
    n_items: int,
    k: int,
    exclude_rows: np.ndarray | None = None,
    banned_items=None,
    batch_size: int = 512,
):
    """Full-catalog top-k for every user with item-sharded scoring.

    ``rep`` is the [(n_users+n_items), d] representation matrix;
    ``exclude_rows`` the padded per-user exclusion index matrix — pass the
    DEVICE matrix (the evaluator's device_padded_from_lists product); a host
    array is uploaded once, never in per-batch slices (H2D is ~MB/s on
    tunneled backends). Per batch only the [B] user ids go host->device, and
    the user-row/exclusion gathers happen in-jit.
    """
    n_pad = pad_items_to_mesh(n_items, mesh)
    items_rep = jnp.zeros((n_pad, rep.shape[1]), rep.dtype)
    items_rep = items_rep.at[:n_items].set(rep[n_users:])
    banned = np.zeros(n_pad, dtype=bool)
    banned[n_items:] = True  # padding rows never retrievable
    if banned_items is not None:
        banned[np.asarray(banned_items)] = True
    banned = jnp.asarray(banned)
    items_rep = jax.device_put(
        items_rep, jax.sharding.NamedSharding(mesh, P("model", None))
    )
    banned = jax.device_put(banned, jax.sharding.NamedSharding(mesh, P("model")))

    kk = min(k, n_items)
    excl_dev = None
    if exclude_rows is not None:
        excl_dev = jnp.asarray(np.asarray(exclude_rows).astype(np.int32)) \
            if isinstance(exclude_rows, np.ndarray) else exclude_rows
    run_batch, run_batch_plain = _batched_recommenders(mesh, n_items, kk)

    parts = []
    for start in range(0, n_users, batch_size):
        users = np.arange(start, min(start + batch_size, n_users))
        pad = batch_size - len(users)
        users_p = jnp.asarray(np.concatenate([users, np.zeros(pad, users.dtype)]))
        if excl_dev is not None:
            idx = run_batch(rep, items_rep, excl_dev, banned, users_p)
        else:
            idx = run_batch_plain(rep, items_rep, banned, users_p)
        # keep device handles; fetch once (pipelines the dispatches)
        parts.append((idx, len(users)))
    fetched = jax.device_get([p for p, _ in parts])
    return np.concatenate(
        [np.asarray(r)[:n] for r, (_, n) in zip(fetched, parts)], axis=0
    )
