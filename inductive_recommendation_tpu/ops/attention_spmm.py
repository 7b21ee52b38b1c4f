"""Attention-weighted SpMM (the AttIGCN kernel, reference model.py:4224-4287).

The reference computes per-edge attention over the feature matrix with five
DGL passes: chunked masked q.k products (model.py:4246-4255), two
edge-softmax segment reductions via gspmm copy_rhs/max + copy_rhs/sum
(model.py:4270-4274), and a final weighted gspmm. In the degree-bucketed ELL
layout the per-row softmax is a *dense masked row softmax* over the k-slot
axis — no segment reductions at all:

    scores[r, s]  = q[r] . k_table[idx[r, s]]          (one gather + einsum)
    attn          = softmax_s(scores / T) with padding masked
    out[r]        = sum_s attn[r, s] * v_table[idx[r, s]]

Multi-head: scores are computed per head and the attention is the mean over
heads (model.py:4275), matching the reference.

There is deliberately NO Pallas implementation. Both hand-kernel directions
were built and measured on v5e at Gowalla scale (1.79M nnz, d=64) and lost
to this jnp path, so they were removed (r2; benchmarks/attn_eval_bench.py
was the gate):

- training: a gather-only custom VJP measured 100-105 ms fwd+bwd vs 80 ms
  for XLA autodiff of this forward (see attention_spmm's docstring);
- eval: a fused flash-style forward (grid over row tiles per bucket per
  head, streaming k-slot chunks with running max/denominator so scores and
  attention weights never left VMEM; whole-operand VMEM pinning, lane/
  sublane tile padding, and wide-cap fallbacks all handled) measured
  25.1 ms vs 16.3 ms for the jnp forward (1 head, rel err 1.1e-6). The
  [m, k]-shaped score/attn HBM round trips the fusion removes are minor
  next to the transaction-bound neighbor gathers (which stay in XLA either
  way), while per-bucket Mosaic kernels lose XLA's cross-bucket pipelining
  and its MXU-scheduled einsums, and the 16 MB scoped-VMEM limit forces
  short row tiles on wide-cap buckets (a cap-1024 bucket fits 8-row
  tiles). Re-attempts should start from a fundamentally different layout,
  not from re-fusing this one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.ops.bucketed_spmm import BucketedSpMM


def _iter_buckets(side):
    """(bucket, original-row ids) pairs, tracking the packed offset once —
    the layout packs buckets contiguously in permuted order (side.perm)."""
    off = 0
    for b in side.buckets:
        m = b.idx.shape[0]
        yield b, side.perm[off : off + m]
        off += m


def _assemble_rows(side, parts, width, dtype):
    """Concat per-bucket row blocks, zero-fill degree-0 rows, undo the
    bucket permutation — the same assembly bucketed_spmm._apply_one_side
    uses (kept in lockstep with its packing convention)."""
    n_have = sum(p.shape[0] for p in parts)
    if side.n_rows - n_have > 0:
        parts = list(parts) + [jnp.zeros((side.n_rows - n_have, width), dtype)]
    return jnp.take(jnp.concatenate(parts, axis=0), side.inv_perm, axis=0)


def _bucket_attn_weights(q_rows, k_tab, idx, mask, temperature):
    """Per-head attention weights for one ELL bucket.

    q_rows [m, h, dh]; k_tab [n, h*dh]; returns attn_h [m, k, h] (padding
    slots zero) and the gathered keys [m, k, h, dh] for reuse."""
    m, k_slots = idx.shape
    h, dh = q_rows.shape[1], q_rows.shape[2]
    keys = jnp.take(k_tab, idx, axis=0).reshape(m, k_slots, h, dh)
    scores = jnp.einsum("mhd,mkhd->mkh", q_rows, keys)  # [m, k, h]
    neg = jnp.asarray(-1e30, scores.dtype)
    scores = jnp.where(mask[:, :, None] > 0, scores, neg)
    # stable softmax over the slot axis, reference temperature semantics:
    # exp((s - max) / T) (model.py:4271-4274)
    smax = jnp.max(scores, axis=1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp((scores - smax) / temperature)
    ex = ex * mask[:, :, None]
    denom = jnp.sum(ex, axis=1, keepdims=True)
    attn_h = ex / jnp.maximum(denom, 1e-12)
    return attn_h, keys


def _attention_forward(mat, q, k_table, v_table, temperature):
    side = mat.fwd
    parts = []
    for b, rows in _iter_buckets(side):
        mask = (b.val != 0).astype(q.dtype)
        attn_h, _ = _bucket_attn_weights(q[rows], k_table, b.idx, mask, temperature)
        attn = attn_h.mean(axis=-1)  # mean over heads (model.py:4275)
        vals = jnp.take(v_table, b.idx, axis=0)  # [m, k, dv]
        parts.append(jnp.einsum("mk,mkd->md", attn, vals))
    return _assemble_rows(side, parts, v_table.shape[-1], v_table.dtype)


def build_dv_slot_tables(mat: BucketedSpMM):
    """Layout-static fwd-slot index per TRANSPOSE-layout slot (host, once).

    The attention aggregation is bilinear in (attn, v), so its v-cotangent
    is a transpose-layout application with the ATTENTION as edge values.
    These tables let the backward read each transpose slot's attention
    weight from the forward layout's packed [sum m_b * k_b] vector with one
    flat GATHER — the scatter-free form measured 23.8 ms vs 31.4 ms for
    the XLA autodiff scatter at Gowalla scale (benchmarks/attn_dv_probe.py,
    recorded in ATT_BREAKDOWN_r05.json)."""
    import numpy as np

    total = sum(int(np.prod(b.eid.shape)) for b in mat.fwd.buckets)
    slot_of_eid = np.zeros(mat.nnz + 1, np.int64)
    off = 0
    for b in mat.fwd.buckets:
        e = np.asarray(b.eid).reshape(-1)
        m = np.asarray(b.val).reshape(-1) != 0
        slot_of_eid[e[m]] = off + np.nonzero(m)[0]
        off += e.size
    assert off == total
    return tuple(
        jnp.asarray(slot_of_eid[np.asarray(b.eid)].astype(np.int32))
        for b in mat.bwd.buckets
    )


@jax.custom_vjp
def _bilinear_aggregate(fwd_side, bwd_side, slots, attns, v_table):
    """sum_s attn[r, s] * v[idx[r, s]] with a gather-only custom VJP.

    d(v) runs as the transpose-layout application with the attention as
    edge values (see :func:`build_dv_slot_tables`); d(attn) recomputes the
    value gather (cheaper than saving the [m, k, d] residual). The score
    chain (softmax -> q/Wk) stays on XLA autodiff — the r2 lesson that a
    FULL custom backward loses still holds (module docstring); only the
    bilinear core's scatter is replaced."""
    parts = []
    for b, a in zip(fwd_side.buckets, attns):
        vals = jnp.take(v_table, b.idx, axis=0)
        parts.append(jnp.einsum("mk,mkd->md", a, vals))
    return _assemble_rows(fwd_side, parts, v_table.shape[-1], v_table.dtype)


def _bilinear_fwd(fwd_side, bwd_side, slots, attns, v_table):
    out = _bilinear_aggregate(fwd_side, bwd_side, slots, attns, v_table)
    return out, (fwd_side, bwd_side, slots, attns, v_table)


def _bilinear_bwd(res, g):
    fwd_side, bwd_side, slots, attns, v_table = res
    d_attns = []
    for b, rows in _iter_buckets(fwd_side):
        vals = jnp.take(v_table, b.idx, axis=0)
        d_attns.append(
            jnp.einsum("md,mkd->mk", jnp.take(g, rows, axis=0), vals)
            * (b.val != 0)
        )
    flat = jnp.concatenate([a.reshape(-1) for a in attns])
    parts = []
    for b, s in zip(bwd_side.buckets, slots):
        a_b = jnp.take(flat, s, axis=0) * (b.val != 0)
        parts.append(
            jnp.einsum("mk,mkd->md", a_b, jnp.take(g, b.idx, axis=0))
        )
    d_v = _assemble_rows(bwd_side, parts, v_table.shape[-1], v_table.dtype)
    zf = jax.tree_util.tree_map(jnp.zeros_like, fwd_side)
    zb = jax.tree_util.tree_map(jnp.zeros_like, bwd_side)
    zs = jax.tree_util.tree_map(jnp.zeros_like, slots)
    return (zf, zb, zs, tuple(d_attns), d_v)


_bilinear_aggregate.defvjp(_bilinear_fwd, _bilinear_bwd)


def _attention_forward_qk(mat, qk, qb, v_table, temperature, dv_slots=None):
    """Fused-key attention forward: scores from the VALUE gather.

    When the key table is a linear map of the value table (AttIGCN:
    k = sg(emb) @ Wk + bk, v = emb — reference model.py:4258-4279), the
    per-edge score q[r]·k[c] = (q[r] @ Wk^T)·v[c] + q[r]·bk. Folding Wk
    into the QUERY side (``qk`` [n_rows, h, dv], ``qb`` [n_rows, h]) means
    the scores reuse the [dv]-wide value gather the output needs ANYWAY —
    no [h·dh]-wide key-row gathers in the forward and no key-table
    scatter-adds in the backward (dWk flows through the dense qk einsum
    instead). Measured on v5e at Gowalla scale, 4 heads, d=64: fwd 40 ms ->
    ~13 ms, fwd+bwd 166 ms -> ~45 ms (see benchmarks/attn_eval_bench.py
    note in BASELINE.md r03).

    The key-path values are stop-gradiented INSIDE (matching emb_sg);
    ``v_table`` gradients flow only through the output aggregation."""
    side = mat.fwd
    parts = []
    attns = []
    dv = v_table.shape[-1]
    for b, rows in _iter_buckets(side):
        m, k_slots = b.idx.shape
        mask = (b.val != 0).astype(v_table.dtype)
        vals = jnp.take(v_table, b.idx, axis=0)  # [m, k, dv] — the ONE gather
        vals_sg = jax.lax.stop_gradient(vals)
        # [m, k, h]: per-head scores via the folded query
        scores = jnp.einsum("mhd,mkd->mkh", qk[rows], vals_sg)
        scores = scores + qb[rows][:, None, :]
        neg = jnp.asarray(-1e30, scores.dtype)
        scores = jnp.where(mask[:, :, None] > 0, scores, neg)
        smax = jnp.max(scores, axis=1, keepdims=True)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        ex = jnp.exp((scores - smax) / temperature)
        ex = ex * mask[:, :, None]
        denom = jnp.sum(ex, axis=1, keepdims=True)
        attn = (ex / jnp.maximum(denom, 1e-12)).mean(axis=-1)  # head mean
        if dv_slots is None:
            parts.append(jnp.einsum("mk,mkd->md", attn, vals))
        else:
            attns.append(attn)
    if dv_slots is None:
        return _assemble_rows(side, parts, dv, v_table.dtype)
    # scatter-free bilinear core: d(v) via the transpose-layout gather (the
    # measured 1.3x over the autodiff scatter, benchmarks/attn_dv_probe.py);
    # the forward's internal value gather CSEs with the score path's
    return _bilinear_aggregate(side, mat.bwd, dv_slots, tuple(attns), v_table)


def attention_spmm_fused_kv(mat, q, w_k, b_k, v_table, temperature, dv_slots=None):
    """out[r] = sum_{c in N(r)} softmax_c(q[r]·(sg(v[c]) @ Wk + bk) / T) v[c].

    The AttIGCN attention with the key table fused into the query side (see
    :func:`_attention_forward_qk`). ``q`` [n_rows, h, dh]; ``w_k``
    [dv, h*dh]; ``b_k`` [h*dh]; ``v_table`` [n_cols, dv]. Numerically equal
    to ``attention_spmm(mat, q, sg(v) @ Wk + bk, v, T)`` up to fp
    reassociation (the per-row q·bk term is softmax-shift-invariant either
    way; it is kept so intermediate scores match too).

    ``dv_slots`` (optional, :func:`build_dv_slot_tables`): route the
    bilinear aggregation through the gather-only custom VJP — d(v) as a
    transpose-layout application instead of the autodiff scatter."""
    h, dh = q.shape[1], q.shape[2]
    dv = v_table.shape[-1]
    wk = w_k.reshape(dv, h, dh)
    qk = jnp.einsum("nhd,vhd->nhv", q, wk)  # [n_rows, h, dv] — dense MXU
    qb = jnp.einsum("nhd,hd->nh", q, b_k.reshape(h, dh))
    return _attention_forward_qk(
        mat, qk, qb, v_table, float(temperature), dv_slots=dv_slots
    )


def attention_spmm(
    mat, q, k_table, v_table, temperature
):
    """out[r] = sum_{c in N(r)} softmax_c(q[r].k[c] / T) * v[c] over the
    sparse structure of ``mat`` (differentiable).

    q: [n_rows, h, dh]; k_table: [n_cols, h*dh]; v_table: [n_cols, dv].

    The backward is XLA autodiff — deliberately, despite the repo's
    no-scatter rule. Measured on v5e (1.8M-nnz Gowalla-scale, d=64, 1 head,
    fwd 18 ms): autodiff fwd+bwd 80 ms vs 100-105 ms for a hand-written
    gather-only custom VJP (dk/dv as transpose-layout reduces over per-edge
    attention values routed through the eid indirection, flash-style
    recompute). Unlike the plain SpMM — whose scatter-add adjoint was 3x
    its gather — the attention adjoint's cost is dominated by recomputing
    the softmax weights and re-gathering v for the d(attn) inner products,
    which autodiff avoids by saving them; its [m, k, d] scatter-adds are
    d-wide (vector-lane friendly), not the 4-byte-per-edge kind the rule
    targets. Do not "fix" this back without re-measuring.
    """
    return _attention_forward(mat, q, k_table, v_table, float(temperature))
