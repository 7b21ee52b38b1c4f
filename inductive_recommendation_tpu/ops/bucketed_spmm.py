"""Degree-bucketed ELL SpMM with transpose-SpMM backward — the TPU fast path.

Why: XLA lowers ``segment_sum``/scatter-add poorly on TPU (measured 21 ms
forward / ~45 ms backward for a 1.8M-edge, d=64 SpMM on v5e vs a ~1-3 ms
random-gather roofline). Two structural fixes:

1. **No scatter anywhere.** Rows are grouped into power-of-two degree
   buckets; each bucket is a dense [rows, k] neighbor table reduced over the
   k axis (gather + einsum — pure gathers and dense reductions). Bucket
   outputs are concatenated and *gathered* back into row order through a
   precomputed inverse permutation (a gather, not a scatter).
2. **Backward is a forward.** grad_x of ``out = A @ x`` is ``A^T @ g``; we
   pre-build the transpose's bucketed layout and register a ``custom_vjp``
   so the backward pass is another gather-reduce instead of XLA's
   scatter-add of the gather adjoint.

Per-edge dynamic scales (edge dropout masks, IGCN's annealed feat-matrix
weights) are handled by an *edge-id indirection*: both layouts store the
originating edge id, and a caller-supplied ``edge_scale [nnz]`` vector is
gathered into either layout — so a mask sampled once in edge space is
consistent between forward and transpose (a requirement for correct
dropout gradients).

Measured on TPU v5e (Gowalla-scale, 1.8M edges, d=64): forward 21 ms -> ~11
ms, and the backward scatter (~30 ms) becomes another ~11 ms forward.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "val", "eid"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _Bucket:
    idx: jnp.ndarray  # [rows, k] neighbor column ids (0 padded)
    val: jnp.ndarray  # [rows, k] edge values (0 padded)
    eid: jnp.ndarray  # [rows, k] originating edge id (0 padded; val==0 kills it)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets", "inv_perm", "perm"],
    meta_fields=["n_rows", "n_cols", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class _OneSide:
    buckets: tuple  # tuple[_Bucket, ...]
    inv_perm: jnp.ndarray  # [n_rows] gather map from concat-bucket order
    perm: jnp.ndarray  # [n_rows] original row id at each concat-bucket slot
    n_rows: int
    n_cols: int
    nnz: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd"],
    meta_fields=["symmetric"],
)
@dataclasses.dataclass(frozen=True)
class BucketedSpMM:
    """Forward layout of A and (shared when symmetric) layout of A^T."""

    fwd: _OneSide
    bwd: _OneSide
    symmetric: bool

    @property
    def shape(self):
        return (self.fwd.n_rows, self.fwd.n_cols)

    @property
    def nnz(self) -> int:
        return self.fwd.nnz


def cap_ladder(max_deg: int):
    """The ~1.12x-stepped degree-cap ladder shared by every bucketed layout
    (single-device here; stacked per-shard in parallel/spmm.py).

    Measured on v5e (1.8M-nnz Gowalla-scale sym adjacency, d=64):

    | step | buckets | gathers/nnz | fwd ms | fwd+bwd ms |
    |------|---------|-------------|--------|------------|
    | 1.5  | 25      | 1.203x      | 9.65   | 18.20      |
    | 1.25 | 42      | 1.092x      | 8.07   | 14.62      |
    | 1.12 | 74      | 1.035x      | 6.65   | 12.15      |
    | 1.06 | 125     | 1.012x      | 7.17   | 12.30      |

    1.12 is the sweet spot: -33% vs the original 1.5x ladder (the win is
    larger than the padded-gather reduction alone — narrower buckets also
    give the [rows, k, d] gather+reduce better tile shapes), and tighter
    steps regress (per-kernel launch/fusion overhead of 125 tiny buckets
    outweighs the last 2% of padding). Cost: one-time compile roughly
    doubles (7.8s -> 16.6s for the lone fwd at this scale) — acceptable,
    all steps are compile-once. Merging small caps upward remains
    catastrophic (degree-1 rows padded into large-cap buckets dominated
    the gather count in early measurements).
    """
    caps = []
    c = 1
    while c < max(max_deg, 1):
        caps.append(c)
        c = max(c + 1, int(c * 1.12))
    caps.append(max(max_deg, 1))
    return caps


def budgeted_cap_merge(merged, nnz, count_fn, merge_fn):
    """Padding-budgeted upward merge of adjacent ladder buckets.

    Each bucket is a separate gather+reduce kernel, so tiny-row buckets cost
    more in launch/compile than their padding would. Greedily merge the
    cheapest adjacent (cap, members) pair upward while total EXTRA padded
    gathers stay within max(1% of nnz, 4096): at Gowalla scale this trims
    74 buckets -> 59 for +0.9% gathers (TPU runtime neutral: 6.65 -> 6.77 ms
    fwd, within noise), and the absolute floor collapses test-scale graphs
    to a handful of buckets (compile time, not bandwidth, dominates there —
    the 1.12x ladder alone grew the CPU test suite 745 s -> 1155 s). The
    budget bounds the degree-1-rows-into-huge-caps blowup that made
    unbounded upward merging catastrophic.

    ``count_fn(members)`` -> the number of padded row slots the cost scales
    with (``len`` for flat builders; shards x shard-max for stacked ones);
    ``merge_fn(a, b)`` combines two members payloads."""
    merged = list(merged)
    budget = max(0.01 * nnz, 4096.0)
    spent = 0.0
    while len(merged) > 1:
        costs = [
            count_fn(merged[i][1]) * (merged[i + 1][0] - merged[i][0])
            for i in range(len(merged) - 1)
        ]
        j = int(np.argmin(costs))
        if spent + costs[j] > budget:
            break
        spent += costs[j]
        merged[j + 1] = (merged[j + 1][0], merge_fn(merged[j][1], merged[j + 1][1]))
        del merged[j]
    return merged


def fill_bucket_rows(rows_m, deg, starts, ce, ve, ee, cap):
    """Dense [m, cap] idx/val/eid blocks for the given rows, from row-sorted
    COO arrays (``starts`` = exclusive per-row prefix offsets). Pad slots are
    zero: idx 0 gathers row 0 but val 0 kills the contribution."""
    m = len(rows_m)
    idx = np.zeros((m, cap), dtype=np.int32)
    val = np.zeros((m, cap), dtype=np.float32)
    eid = np.zeros((m, cap), dtype=np.int32)
    lens = deg[rows_m]
    rows_rep = np.repeat(np.arange(m), lens)
    slot = np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
    flat_pos = starts[rows_m][rows_rep] + slot
    idx[rows_rep, slot] = ce[flat_pos]
    val[rows_rep, slot] = ve[flat_pos]
    eid[rows_rep, slot] = ee[flat_pos]
    return idx, val, eid


def _build_one_side(row, col, val, eid, n_rows, n_cols, min_bucket_rows=0):
    """Host-side: rows -> degree-cap buckets (see :func:`cap_ladder`).

    ``min_bucket_rows`` is kept for API compatibility and ignored.
    """
    del min_bucket_rows
    deg = np.bincount(row, minlength=n_rows)
    order_e = np.argsort(row, kind="stable")
    re_, ce_, ve_, ee_ = row[order_e], col[order_e], val[order_e], eid[order_e]
    starts = np.concatenate([[0], np.cumsum(deg)])

    max_deg = int(deg.max(initial=0))
    caps = cap_ladder(max_deg)

    nonzero_rows = np.nonzero(deg > 0)[0]
    merged = []
    for i, cap in enumerate(caps):
        lo = caps[i - 1] if i else 0
        members = nonzero_rows[(deg[nonzero_rows] > lo) & (deg[nonzero_rows] <= cap)]
        if len(members):
            merged.append((cap, members))

    merged = budgeted_cap_merge(
        merged,
        nnz=len(row),
        count_fn=len,
        merge_fn=lambda a, b: np.concatenate([a, b]),
    )

    buckets = []
    perm = []
    for cap, rows_m in merged:
        idx, v, e = fill_bucket_rows(rows_m, deg, starts, ce_, ve_, ee_, cap)
        buckets.append(
            _Bucket(idx=jnp.asarray(idx), val=jnp.asarray(v), eid=jnp.asarray(e))
        )
        perm.append(rows_m)

    zero_rows = np.nonzero(deg == 0)[0]
    perm.append(zero_rows)  # mapped to an appended zero block
    perm = np.concatenate(perm) if perm else np.zeros(0, np.int64)
    inv_perm = np.empty(n_rows, dtype=np.int64)
    inv_perm[perm] = np.arange(n_rows)
    return _OneSide(
        buckets=tuple(buckets),
        inv_perm=jnp.asarray(inv_perm, dtype=jnp.int32),
        perm=jnp.asarray(perm, dtype=jnp.int32),
        n_rows=int(n_rows),
        n_cols=int(n_cols),
        nnz=int(len(row)),
    )


def build_bucketed_spmm(
    row, col, val, shape, symmetric: bool = False, min_bucket_rows: int = 256
) -> BucketedSpMM:
    """Host-side constructor from (coalesced) COO arrays.

    ``symmetric=True`` asserts A == A^T (e.g. the sym-normalized bipartite
    adjacency) and shares one layout for forward and backward. Edge ids are
    assigned in the given COO order; ``edge_scale`` vectors passed to
    :func:`spmm_bucketed` must use that order.
    """
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    val = np.asarray(val, dtype=np.float32)
    # ids are assigned over the RAW input order, BEFORE the zero filter —
    # edge_scale vectors are built in the caller's COO order, and assigning
    # after the filter shifted every later edge's id whenever an explicit
    # zero entry was present (parallel.build_edge_sharded_spmm shares this
    # contract)
    eid = np.arange(len(row), dtype=np.int64)
    nz = val != 0.0
    row, col, val, eid = row[nz], col[nz], val[nz], eid[nz]
    n_rows, n_cols = shape
    fwd = _build_one_side(row, col, val, eid, n_rows, n_cols, min_bucket_rows)
    if symmetric:
        bwd = fwd
    else:
        bwd = _build_one_side(col, row, val, eid, n_cols, n_rows, min_bucket_rows)
    return BucketedSpMM(fwd=fwd, bwd=bwd, symmetric=symmetric)


def _uniform_from_eid(key_data, eid):
    """U(0,1) per edge as a pure counter-based hash of the edge id — the same
    eid draws the same value in the forward and transpose layouts, WITHOUT a
    [nnz] vector + random 4-byte gathers (measured ~15 ms/side at 1.8M edges
    on v5e; this is a few fused VPU passes instead)."""
    key = jax.random.wrap_key_data(key_data)
    flat = jax.vmap(lambda e: jax.random.fold_in(key, e))(eid.ravel())
    u = jax.vmap(jax.random.uniform)(flat)
    return u.reshape(eid.shape)


def _apply_one_side(side: _OneSide, x: jnp.ndarray, edge_scale, drop=None) -> jnp.ndarray:
    parts = []
    for b in side.buckets:
        v = b.val
        if edge_scale is not None:
            v = v * edge_scale[b.eid]
        if drop is not None:
            key_data, p = drop
            keep = _uniform_from_eid(key_data, b.eid) >= p
            v = jnp.where(keep, v / (1.0 - p), 0.0)
        g = jnp.take(x, b.idx, axis=0)  # [rows, k, d]
        parts.append(jnp.einsum("rk,rkd->rd", v, g))
    d = x.shape[-1]
    n_have = sum(p.shape[0] for p in parts)
    n_zero = side.n_rows - n_have
    if n_zero > 0:
        parts.append(jnp.zeros((n_zero, d), x.dtype))
    stacked = jnp.concatenate(parts, axis=0) if parts else jnp.zeros((0, d), x.dtype)
    return jnp.take(stacked, side.inv_perm, axis=0)


@jax.custom_vjp
def _spmm_bucketed(mat: BucketedSpMM, edge_scale, x):
    return _apply_one_side(mat.fwd, x, edge_scale)


def _spmm_fwd(mat, edge_scale, x):
    return _apply_one_side(mat.fwd, x, edge_scale), (mat, edge_scale)


def _spmm_bwd(res, g):
    mat, edge_scale = res
    dx = _apply_one_side(mat.bwd, g, edge_scale)
    zeros_mat = jax.tree_util.tree_map(jnp.zeros_like, mat)
    zeros_scale = None if edge_scale is None else jnp.zeros_like(edge_scale)
    return (zeros_mat, zeros_scale, dx)


_spmm_bucketed.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_bucketed(mat: BucketedSpMM, x: jnp.ndarray, edge_scale=None) -> jnp.ndarray:
    """out = (A ∘ scale) @ x with gather-only forward AND backward.

    ``edge_scale``: optional [nnz] per-edge multiplier in the COO order used
    at construction (dropout mask, annealed weights). Gradients flow to
    ``x`` only — edge values are graph buffers, not parameters.

    A matrix built with ``symmetric=True`` shares one layout for A and A^T,
    which is only valid when every edge's scale is 1 — an arbitrary
    per-edge scale breaks the symmetry ((A∘S)^T = A^T∘S^T != A∘S). Build
    with ``symmetric=False`` to get the explicit transpose layout (whose
    edge-id indirection maps the SAME scale vector correctly on both sides).
    """
    if edge_scale is not None and mat.symmetric:
        raise ValueError(
            "edge_scale with a shared-symmetric layout is incorrect; build "
            "with symmetric=False"
        )
    return _spmm_bucketed(mat, edge_scale, x)


# -- in-layout edge dropout (no [nnz] vector, no eid gathers) -----------------


@jax.custom_vjp
def _spmm_bucketed_drop(mat: BucketedSpMM, key_data, p, x):
    return _apply_one_side(mat.fwd, x, None, drop=(key_data, p))


def _spmm_drop_fwd(mat, key_data, p, x):
    return _apply_one_side(mat.fwd, x, None, drop=(key_data, p)), (mat, key_data, p)


def _spmm_drop_bwd(res, g):
    mat, key_data, p = res
    dx = _apply_one_side(mat.bwd, g, None, drop=(key_data, p))
    return (
        jax.tree_util.tree_map(jnp.zeros_like, mat),
        jnp.zeros_like(key_data),
        jnp.zeros_like(p),
        dx,
    )


_spmm_bucketed_drop.defvjp(_spmm_drop_fwd, _spmm_drop_bwd)


def spmm_bucketed_dropout(mat: BucketedSpMM, x, rng, p) -> jnp.ndarray:
    """out = (A ∘ bernoulli-keep/(1-p)) @ x with the dropout mask generated
    IN the bucket layouts from the edge id (same eid -> same draw forward and
    transpose — the consistency edge dropout gradients require), instead of
    materializing a [nnz] scale vector and gathering it per bucket.

    Matches ``sparse_dropout`` semantics (keep with prob 1-p via U >= p,
    rescale by 1/(1-p); reference model.py:4016-4028). Requires a layout
    built with symmetric=False (the eid indirection).
    """
    if mat.symmetric:
        raise ValueError(
            "edge dropout with a shared-symmetric layout is incorrect; build "
            "with symmetric=False"
        )
    return _spmm_bucketed_drop(
        mat, jax.random.key_data(rng), jnp.asarray(p, jnp.float32), x
    )


def with_baked_edge_scale(mat: BucketedSpMM, edge_scale) -> BucketedSpMM:
    """New BucketedSpMM with a per-edge scale folded into the values of BOTH
    layouts (one eid gather per side, on device). For scales that change per
    EPOCH (DOSE view keep-masks x view normalization), this removes the
    per-STEP eid+scale gathers from every view SpMM — jit this and call it
    at view-regeneration time."""
    if mat.symmetric:
        raise ValueError("edge scales require symmetric=False")

    def bake(side: _OneSide):
        return dataclasses.replace(
            side,
            buckets=tuple(
                _Bucket(idx=b.idx, val=b.val * edge_scale[b.eid], eid=b.eid)
                for b in side.buckets
            ),
        )

    return BucketedSpMM(fwd=bake(mat.fwd), bwd=bake(mat.bwd), symmetric=False)


def with_annealed_values(mat: BucketedSpMM, row_sum, alpha) -> BucketedSpMM:
    """New BucketedSpMM whose values carry IGCN's annealed degree-power
    weights ``val * row_sum[feat_row]^((alpha-1)/2 - 0.5)`` (reference
    model.py:4127-4175), computed ON DEVICE — call once per epoch at
    feat_mat_anneal instead of gathering a [nnz] scale vector per step.

    The feat row of an edge is its ROW in the forward layout (all k slots of
    a bucket row share it — one [rows] gather + broadcast) and its COLUMN in
    the transpose layout (one [rows, k] gather, per epoch not per step).
    ``row_sum`` must be padded/indexable by every row id in fwd.perm and
    every column id stored in bwd bucket idx (pad slots hold 0 edges, so any
    finite value works there).
    """
    expo = (jnp.asarray(alpha, jnp.float32) - 1.0) / 2.0 - 0.5
    # clamp: rows touched only by zero-valued padding slots must not produce
    # inf * 0 = NaN
    rs = jnp.maximum(jnp.asarray(row_sum, jnp.float32), 1e-12)

    def scale_fwd(side: _OneSide):
        new_buckets = []
        off = 0
        for b in side.buckets:
            rows_b = b.val.shape[0]
            w = jnp.power(rs[side.perm[off : off + rows_b]], expo)  # [rows]
            new_buckets.append(_Bucket(idx=b.idx, val=b.val * w[:, None], eid=b.eid))
            off += rows_b
        return dataclasses.replace(side, buckets=tuple(new_buckets))

    def scale_bwd(side: _OneSide):
        new_buckets = []
        for b in side.buckets:
            w = jnp.power(rs[b.idx], expo)  # [rows, k]: feat row == column id
            new_buckets.append(_Bucket(idx=b.idx, val=b.val * w, eid=b.eid))
        return dataclasses.replace(side, buckets=tuple(new_buckets))

    if mat.symmetric:
        raise ValueError("annealed values require symmetric=False")
    return BucketedSpMM(fwd=scale_fwd(mat.fwd), bwd=scale_bwd(mat.bwd), symmetric=False)
