"""Blockwise cosine-similarity top-k over the full user x item grid.

The DOSE family selects edge candidates by ranking all n_users*n_items
cosine similarities (model.py:503-545) — the reference materializes the full
matrix on the CPU with sklearn. Here similarity blocks are streamed through a
running top-k so peak memory is O(block * n_items + k), and everything stays
on device inside one jitted scan (the framework's analog of
blockwise/ring-attention memory behavior).

Divergence (documented): the reference splits the flattened matrix into two
halves and un-flattens the second half's indices with an ``aug_num//2`` offset
instead of ``numel//2`` (model.py:537-540), mapping those pairs onto
near-zero user ids. We implement the evident intent: one exact global top-k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def blockwise_cosine_topk(
    users_r: jnp.ndarray,
    items_r: jnp.ndarray,
    k: int,
    negate_items: bool = False,
    block_rows: int = 512,
):
    """Exact top-k (u, i) pairs by cosine similarity, streamed blockwise.

    ``negate_items=True`` reproduces DOSE_aug's ``all_items_r *= -1``
    (model.py:509): top-k of cos(u, -i) == the k *lowest*-similarity pairs.

    Returns (values [k], user_idx [k], item_idx [k]).
    """
    n_users = users_r.shape[0]
    n_items = items_r.shape[0]
    un = _l2_normalize(users_r.astype(jnp.float32))
    itn = _l2_normalize(items_r.astype(jnp.float32))
    if negate_items:
        itn = -itn

    n_blocks = -(-n_users // block_rows)
    pad_rows = n_blocks * block_rows - n_users
    un = jnp.pad(un, ((0, pad_rows), (0, 0)))
    un_blocks = un.reshape(n_blocks, block_rows, -1)

    def body(carry, inp):
        best_vals, best_uid, best_iid = carry
        block, block_idx = inp
        sims = block @ itn.T  # [block_rows, n_items]
        row_ids = block_idx * block_rows + jnp.arange(block_rows)[:, None]
        valid = row_ids < n_users
        sims = jnp.where(valid, sims, -jnp.inf)
        kk = min(k, block_rows * n_items)
        flat = sims.reshape(-1)
        vals, flat_idx = jax.lax.top_k(flat, kk)
        uid = block_idx * block_rows + flat_idx // n_items
        iid = flat_idx % n_items
        cand_vals = jnp.concatenate([best_vals, vals])
        cand_uid = jnp.concatenate([best_uid, uid.astype(jnp.int32)])
        cand_iid = jnp.concatenate([best_iid, iid.astype(jnp.int32)])
        new_vals, pos = jax.lax.top_k(cand_vals, k)
        return (new_vals, cand_uid[pos], cand_iid[pos]), None

    init = (
        jnp.full((k,), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((k,), dtype=jnp.int32),
        jnp.zeros((k,), dtype=jnp.int32),
    )
    (vals, uid, iid), _ = jax.lax.scan(
        body, init, (un_blocks, jnp.arange(n_blocks))
    )
    return vals, uid, iid
