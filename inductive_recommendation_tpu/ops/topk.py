"""Top-k retrieval kernels: masked scoring top-k and the sharded exact
variant with cross-device k-way merge.

Replaces ``torch.topk`` at trainer.py:169 (retrieval) and the selection in
DOSE's cal_cos_sim (model.py:525). The sharded form implements the north-star
"exact sharded top-k dot-product with cross-host k-way merge": each device
ranks its item shard locally, then the k-sized partial results (not the full
score rows) are all-gathered and merged — communication is O(k) per device
instead of O(n_items).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_scores(scores: jnp.ndarray, k: int):
    """Exact top-k along the last axis; returns (values, indices)."""
    return jax.lax.top_k(scores, k)


def masked_topk(
    scores: jnp.ndarray,
    k: int,
    exclude_idx: jnp.ndarray | None = None,
    banned_mask: jnp.ndarray | None = None,
):
    """Top-k after masking excluded per-row items and globally banned items.

    ``exclude_idx`` is [n_rows, m] padded with ``n_items``: under jit,
    ``mode='drop'`` discards the out-of-range sentinel updates, so no
    sentinel column (and no extra [n_rows, n_items] copy for the
    concatenate+slice) is needed — mirroring the -inf masking at
    trainer.py:155-167. ``banned_mask`` is a [n_items] bool.
    """
    return jax.lax.top_k(mask_scores(scores, exclude_idx, banned_mask), k)


def mask_scores(scores, exclude_idx=None, banned_mask=None):
    """-inf the excluded per-row ids (out-of-range ids dropped) and banned
    columns; shared by masked_topk and the sharded retrieval's local shards."""
    n_rows, _ = scores.shape
    if banned_mask is not None:
        scores = jnp.where(banned_mask[None, :], -jnp.inf, scores)
    if exclude_idx is not None:
        rows = jnp.arange(n_rows)[:, None]
        scores = scores.at[rows, exclude_idx].set(-jnp.inf, mode="drop")
    return scores


def sharded_topk(local_scores: jnp.ndarray, k: int, axis_name: str):
    """Exact global top-k over an item axis sharded across ``axis_name``.

    To be called inside ``shard_map``: ``local_scores`` is [rows, n_local].
    Local top-k -> all-gather the k candidates per device -> merge. Returns
    (values, global_indices) of shape [rows, k].
    """
    n_local = local_scores.shape[-1]
    kk = min(k, n_local)
    local_vals, local_idx = jax.lax.top_k(local_scores, kk)
    shard = jax.lax.axis_index(axis_name)
    global_idx = local_idx + shard * n_local
    # [n_dev, rows, kk] -> concat along candidate axis
    all_vals = jax.lax.all_gather(local_vals, axis_name)
    all_idx = jax.lax.all_gather(global_idx, axis_name)
    n_dev = all_vals.shape[0]
    cand_vals = jnp.moveaxis(all_vals, 0, -2).reshape(
        local_scores.shape[:-1] + (n_dev * kk,)
    )
    cand_idx = jnp.moveaxis(all_idx, 0, -2).reshape(
        local_scores.shape[:-1] + (n_dev * kk,)
    )
    merged_vals, merged_pos = jax.lax.top_k(cand_vals, k)
    merged_idx = jnp.take_along_axis(cand_idx, merged_pos, axis=-1)
    return merged_vals, merged_idx
