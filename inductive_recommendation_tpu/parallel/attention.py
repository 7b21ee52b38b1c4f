"""Edge-block-sharded attention-weighted SpMM (AttIGCN under a mesh).

The single-device kernel (ops/attention_spmm.py, reference spec
model.py:4224-4287) computes a per-row edge softmax as a dense masked row
softmax over the bucketed ELL slot axis. Under the edge-sharded layout
(parallel/spmm.py: A's COLUMNS split into contiguous blocks per shard) a
row's edges span shards, so the row softmax needs two tiny cross-shard
reductions over [n_rows_pad, h] row statistics:

    per shard:  scores[e] = qk[row_e] . sg(v_local[col_e]) + qb[row_e]
                (the FOLDED query qk = q @ Wk^T — keys are a linear map of
                the detached value rows, so the scores reuse the value
                gather and no key table is gathered at all; 2.4x measured)
                rmax_s[r] = max over the shard's edges of r
    all-reduce: rmax[r]   = pmax_s rmax_s[r]
    per shard:  ex[e]     = exp((scores[e] - rmax[row_e]) / T)
                den_s[r]  = sum over the shard's edges of r
    all-reduce: den[r]    = psum_s den_s[r]
    per shard:  partial[r] = sum_e (mean_h ex/den) * v_local[col_e]
    collective: out = psum_scatter(partial)             (rows sharded)

qk/qb are produced row-sharded (q is a feat-SpMM output) and all-gathered
inside the shard_map — O(n·h·dv) per device, the analog of the operand
all-gather in the plain SpMM backward. The v table is operand-sharded
([block, ...] per shard), so value gathers stay local. Within one
shard every edge of a row sits in ONE bucket row (buckets are keyed on the
row's local degree), so per-shard row statistics assemble exactly like the
SpMM output: concat per-bucket blocks + one shared degree-0 slot, then
``inv_perm``.

The row maxes are ``stop_gradient``-ed: the max cancels analytically in
ex/den, and ``lax.pmax`` has no transpose rule. Everything else
differentiates through XLA autodiff — deliberately, matching the measured
single-device decision (attention_spmm.py docstring: autodiff beats the
hand gather-only VJP for this op).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from inductive_recommendation_tpu.parallel.spmm import EdgeShardedSpMM


def build_attention_perm(mat: EdgeShardedSpMM) -> jnp.ndarray:
    """[S, T] packed-slot -> global-row map for ``mat.fwd`` (the inverse of
    ``inv_perm``, which the stacked layout does not keep). Padding slots
    (bucket rows beyond a shard's member count) map to row 0 — their edges
    are all zero-valued, so the mask kills them."""
    inv = np.asarray(mat.fwd.inv_perm)  # [S, n_rows], slots 0..T (T = zero slot)
    T = sum(int(b.idx.shape[1]) for b in mat.fwd.buckets)
    S = inv.shape[0]
    perm = np.zeros((S, max(T, 1)), dtype=np.int32)
    for s in range(S):
        rows = np.nonzero(inv[s] < T)[0]
        perm[s, inv[s, rows]] = rows
    return jnp.asarray(perm)


def _assemble(parts, fill_row, inv_perm):
    """Per-bucket row blocks -> [n_rows, ...] via inv_perm, with ``fill_row``
    for the shared degree-0 slot."""
    stacked = jnp.concatenate(list(parts) + [fill_row], axis=0)
    return jnp.take(stacked, inv_perm, axis=0)


def make_edge_sharded_attention(
    mat: EdgeShardedSpMM, mesh, axis: str = "model", temperature: float = 1.0
):
    """-> fn(fwd, perm, qk, qb, v_table) with
    qk [n_rows_pad, h, dv] and qb [n_rows_pad, h] row-sharded over ``axis``
    (the FOLDED query: qk = q @ Wk^T per head, qb = q . bk — see
    ops/attention_spmm.py attention_spmm_fused_kv; keys are a linear map of
    the detached value rows, so the scores reuse the value gather and no
    key table exists at all), v_table [n_cols_pad, dv] operand-sharded;
    returns [n_rows_pad, dv] row-sharded. ``fwd``/``perm`` are
    ``mat.fwd``/``build_attention_perm(mat)`` passed as jit arguments.
    Measured single-device: the fold is 2.4x on fwd+bwd at 4 heads."""
    temperature = float(temperature)

    def local_attn(fwd, perm, qk_shard, qb_shard, v_local):
        # fwd/perm leaves carry the shard_map-sliced [1, ...] stacked axis;
        # qk/qb/v are plain row-sharded arrays (their slice has no such axis)
        perm = perm[0]
        qk = jax.lax.all_gather(qk_shard, axis, axis=0, tiled=True)
        qb = jax.lax.all_gather(qb_shard, axis, axis=0, tiled=True)
        h = qk.shape[1]
        neg = jnp.asarray(-jnp.inf, qk.dtype)

        # pass 1: per-bucket masked scores (from the VALUE gather, reused in
        # pass 3) + per-shard row maxes
        off = 0
        scores_all, masks_all, rows_all, vals_all, max_parts = [], [], [], [], []
        for b in fwd.buckets:
            m, cap = b.idx[0].shape
            rows = perm[off : off + m]
            off += m
            mask = b.val[0] != 0
            vals = jnp.take(v_local, b.idx[0], axis=0)  # [m, cap, dv]
            s = jnp.einsum(
                "mhv,mkv->mkh", qk[rows], jax.lax.stop_gradient(vals)
            ) + qb[rows][:, None, :]
            s = jnp.where(mask[:, :, None], s, neg)
            scores_all.append(s)
            masks_all.append(mask)
            rows_all.append(rows)
            vals_all.append(vals)
            max_parts.append(jnp.max(s, axis=1))  # [m, h]
        rmax_local = _assemble(
            max_parts, jnp.full((1, h), neg, qk.dtype), fwd.inv_perm[0]
        )
        # cross-shard max via all_gather (lax.pmax has no differentiation
        # rule, even on a stop_gradient'd operand); [S, n_rows, h] is tiny
        rmax = jnp.max(
            jax.lax.all_gather(jax.lax.stop_gradient(rmax_local), axis, axis=0),
            axis=0,
        )
        # degree-0 rows everywhere: exp offset 0 (matches the single-device
        # isfinite guard; their denom stays 0 and the output row is 0)
        rmax = jnp.where(jnp.isfinite(rmax), rmax, 0.0)

        # pass 2: exponentials + per-shard row denominators
        ex_all, den_parts = [], []
        for s, mask, rows in zip(scores_all, masks_all, rows_all):
            ex = jnp.exp((s - rmax[rows][:, None, :]) / temperature)
            ex = ex * mask[:, :, None]
            ex_all.append(ex)
            den_parts.append(jnp.sum(ex, axis=1))  # [m, h]
        den_local = _assemble(
            den_parts, jnp.zeros((1, h), qk.dtype), fwd.inv_perm[0]
        )
        den = jax.lax.psum(den_local, axis)

        # pass 3: head-mean attention x the pass-1 value gathers
        dv = v_local.shape[-1]
        out_parts = []
        for ex, rows, vals in zip(ex_all, rows_all, vals_all):
            attn = (ex / jnp.maximum(den[rows][:, None, :], 1e-12)).mean(axis=-1)
            out_parts.append(jnp.einsum("mk,mkd->md", attn, vals))
        partial = _assemble(
            out_parts, jnp.zeros((1, dv), qk.dtype), fwd.inv_perm[0]
        )
        return jax.lax.psum_scatter(partial, axis, scatter_dimension=0, tiled=True)

    return jax.shard_map(
        local_attn,
        mesh=mesh,
        in_specs=(P(axis), P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
