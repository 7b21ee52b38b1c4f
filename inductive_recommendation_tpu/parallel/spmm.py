"""Edge-block-sharded SpMM: scale the graph itself across devices.

The reference propagates the FULL graph per minibatch on one device
(reference model.py:100-110); its scale ceiling is one device's HBM and
bandwidth (SURVEY.md §2.7 names removing it the sequence-parallel analog
for this workload). This module partitions A's columns — and the [n, d]
operand's rows — into contiguous blocks over a mesh axis; each device holds
the degree-bucketed gather layout of its own column block plus the matching
operand rows:

  forward:   partial_s = A[:, blk_s] @ x[blk_s]            (local gathers)
             out = psum_scatter(partial_s)                 (rows sharded)
  backward:  g = all_gather(g_shard)                       (rows of out)
             dx[blk_s] = A[:, blk_s]^T @ g                 (local gathers)

One reduce-scatter forward + one all-gather backward per SpMM — the same
collective pattern as ring/blockwise sequence parallelism — and neither x
nor dx ever materializes on a single device. With a square adjacency the
output sharding equals the input sharding, so GCN layers chain with no
re-sharding (see :func:`make_edge_sharded_propagation`).

A ``replicated`` mode (psum forward, backward needs no gather) is provided
for forward-only / scoring use where the operand is cheap to replicate.

The per-shard layout is the same no-scatter design as
``ops/bucketed_spmm.py`` (degree-cap ladder buckets, gather-only forward
AND backward via a prebuilt transpose layout, per-edge ``edge_scale``
through a global edge-id indirection), stacked over a leading shard axis so
``shard_map`` can slice it.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from inductive_recommendation_tpu.ops.bucketed_spmm import (
    budgeted_cap_merge,
    cap_ladder,
    fill_bucket_rows,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "val", "eid"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _StackedBucket:
    idx: jnp.ndarray  # [S, rows, k] local column ids (0 padded)
    val: jnp.ndarray  # [S, rows, k] edge values (0 padded)
    eid: jnp.ndarray  # [S, rows, k] global edge id (0 padded; val==0 kills it)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["buckets", "inv_perm"],
    meta_fields=["n_rows"],
)
@dataclasses.dataclass(frozen=True)
class _StackedSide:
    buckets: tuple  # tuple[_StackedBucket, ...]
    inv_perm: jnp.ndarray  # [S, n_rows] gather map from concat-bucket order
    n_rows: int  # rows of THIS side's local matrix (fwd: global; bwd: block)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd", "eid_map"],
    meta_fields=["n_rows", "n_cols", "n_rows_pad", "n_cols_pad", "n_shards", "nnz"],
)
@dataclasses.dataclass(frozen=True)
class EdgeShardedSpMM:
    """Column-block-sharded A: per-shard forward and transpose layouts.

    Bucket ``eid`` entries are LOCAL to the shard (0..nnz_shard-1, raw COO
    order within the shard) and shared between the forward and transpose
    sides (a shard holds the same edge set in both). ``eid_map`` [S, E_pad]
    maps local -> GLOBAL edge id (raw COO order, zero-valued entries
    included) so per-edge state keyed on global ids — a global edge_scale
    vector, counter-hash dropout — reaches each shard through an O(nnz/S)
    sharded gather instead of an O(nnz) replicated vector."""

    fwd: _StackedSide  # shard s: A[:, blk_s]      ([n_rows_pad] x block)
    bwd: _StackedSide  # shard s: A[:, blk_s]^T    (block x [n_rows_pad])
    eid_map: jnp.ndarray  # [S, E_pad] int32 global eid per local slot (0 pad)
    n_rows: int
    n_cols: int
    n_rows_pad: int  # padded to a multiple of n_shards (psum_scatter tiles)
    n_cols_pad: int  # padded to a multiple of n_shards (operand blocks)
    n_shards: int
    nnz: int

    @property
    def block(self) -> int:
        return self.n_cols_pad // self.n_shards


def _build_stacked_side(shards, n_rows: int) -> _StackedSide:
    """shards: per-shard (row, col_local, val, eid) COO arrays.

    Buckets use one shared cap ladder with the same padding-budgeted upward
    merge as the flat builder (costed at shards x shard-max rows); each
    bucket's row count is padded to the max across shards so the arrays
    stack on a leading shard axis.
    Padded rows are all-zero (idx 0 gathers row 0, val 0 kills it) and are
    never referenced by ``inv_perm``. Degree-0 rows map to one shared
    appended zero slot.
    """
    S = len(shards)
    degs = [np.bincount(r.astype(np.int64), minlength=n_rows) for r, _, _, _ in shards]
    max_deg = max(int(d.max(initial=0)) for d in degs)
    caps = cap_ladder(max_deg)

    sorted_shards, starts_all = [], []
    for (r, c, v, e), d in zip(shards, degs):
        o = np.argsort(r, kind="stable")
        sorted_shards.append((r[o], c[o], v[o], e[o]))
        starts_all.append(np.concatenate([[0], np.cumsum(d)]))

    merged = []
    for i, cap in enumerate(caps):
        lo = caps[i - 1] if i else 0
        members = [np.nonzero((d > lo) & (d <= cap))[0] for d in degs]
        if any(len(m) for m in members):
            merged.append((cap, members))

    # The padded-slot cost of a stacked bucket is shards x shard-max (every
    # shard's block is padded to the widest shard), so the merge budget uses
    # that count rather than the flat builder's len
    merged = budgeted_cap_merge(
        merged,
        nnz=sum(len(r) for r, _, _, _ in shards),
        count_fn=lambda ms: S * max(len(m) for m in ms),
        merge_fn=lambda a, b: [np.concatenate([x, y]) for x, y in zip(a, b)],
    )

    buckets = []
    inv = np.full((S, n_rows), -1, dtype=np.int64)
    T = 0
    for cap, members in merged:
        M = max(len(m) for m in members)
        idx = np.zeros((S, M, cap), dtype=np.int32)
        val = np.zeros((S, M, cap), dtype=np.float32)
        eid = np.zeros((S, M, cap), dtype=np.int32)
        for s, rows_m in enumerate(members):
            m = len(rows_m)
            if m == 0:
                continue
            _, ce_, ve_, ee_ = sorted_shards[s]
            idx[s, :m], val[s, :m], eid[s, :m] = fill_bucket_rows(
                rows_m, degs[s], starts_all[s], ce_, ve_, ee_, cap
            )
            inv[s, rows_m] = T + np.arange(m)
        buckets.append(
            _StackedBucket(
                idx=jnp.asarray(idx), val=jnp.asarray(val), eid=jnp.asarray(eid)
            )
        )
        T += M
    inv[inv < 0] = T  # shared zero slot
    return _StackedSide(
        buckets=tuple(buckets),
        inv_perm=jnp.asarray(inv, dtype=jnp.int32),
        n_rows=int(n_rows),
    )


def build_edge_sharded_spmm(row, col, val, shape, n_shards: int) -> EdgeShardedSpMM:
    """Host-side constructor from (coalesced) COO arrays.

    Columns are split into ``n_shards`` contiguous blocks; both dimensions
    are zero-padded to multiples of ``n_shards`` (pad rows/cols carry no
    edges, so they only pad the operand/output). GLOBAL edge ids are
    assigned over the RAW input order — zero-valued entries included, so an
    ``edge_scale`` vector built in the caller's COO order stays aligned
    (assigning after the zero filter shifted every later edge's id) —
    exactly as in :func:`ops.bucketed_spmm.spmm_bucketed`. Bucket eids are
    per-shard LOCAL ids; ``eid_map`` carries local -> global.
    """
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    val = np.asarray(val, dtype=np.float32)
    eid = np.arange(len(row), dtype=np.int64)  # raw order, BEFORE filtering
    nz = val != 0.0
    row, col, val, eid = row[nz], col[nz], val[nz], eid[nz]
    n_rows, n_cols = shape
    n_rows_pad = -(-n_rows // n_shards) * n_shards
    n_cols_pad = -(-n_cols // n_shards) * n_shards
    blk = n_cols_pad // n_shards

    fwd_shards, bwd_shards, eid_shards = [], [], []
    for s in range(n_shards):
        m = (col >= s * blk) & (col < (s + 1) * blk)
        local = np.arange(int(m.sum()), dtype=np.int64)
        fwd_shards.append((row[m], col[m] - s * blk, val[m], local))
        bwd_shards.append((col[m] - s * blk, row[m], val[m], local))
        eid_shards.append(eid[m])
    e_pad = max((len(e) for e in eid_shards), default=0) or 1
    eid_map = np.zeros((n_shards, e_pad), dtype=np.int32)
    for s, e in enumerate(eid_shards):
        eid_map[s, : len(e)] = e
    return EdgeShardedSpMM(
        fwd=_build_stacked_side(fwd_shards, n_rows_pad),
        bwd=_build_stacked_side(bwd_shards, blk),
        eid_map=jnp.asarray(eid_map),
        n_rows=int(n_rows),
        n_cols=int(n_cols),
        n_rows_pad=int(n_rows_pad),
        n_cols_pad=int(n_cols_pad),
        n_shards=int(n_shards),
        nnz=int(sum(len(e) for e in eid_shards)),
    )


def _apply_stacked(side: _StackedSide, x: jnp.ndarray, edge_scale) -> jnp.ndarray:
    """Local gather-reduce; leaves carry the shard_map-sliced [1, ...] axis.

    ``edge_scale`` is this shard's LOCAL [E_pad] per-edge vector (bucket eids
    are local ids) — an O(nnz/S) slice, not the global vector."""
    parts = []
    for b in side.buckets:
        v = b.val[0]
        if edge_scale is not None:
            v = v * edge_scale[b.eid[0]]
        g = jnp.take(x, b.idx[0], axis=0)  # [rows, k, d]
        parts.append(jnp.einsum("rk,rkd->rd", v, g))
    parts.append(jnp.zeros((1, x.shape[-1]), x.dtype))  # shared zero slot
    stacked = jnp.concatenate(parts, axis=0)
    return jnp.take(stacked, side.inv_perm[0], axis=0)


def bake_stacked_scale(side: _StackedSide, scale_st, mesh=None, axis="model"):
    """Fold a per-epoch [S, E_pad] LOCAL-edge-id scale into a copy of the
    side's bucket VALUES (one eid gather per bucket, outside the hot step).

    The sharded analog of ``ops.bucketed_spmm.with_baked_edge_scale``: for
    scales that change once per EPOCH (IGCN's annealed feature weights,
    DOSE/SGL view keep-masks x normalization), baking removes the per-STEP
    eid+scale gather from every SpMM side — the gather that made the edge
    steps' S=1 tax +85-89% for IGCN/DOSE in the pre-fix BENCH_DETAIL r04
    measurement (BPR, which passes no scale, measured -2%). Call under jit
    at epoch boundaries; idx/eid/inv_perm are shared with the raw layout,
    only the value arrays are new (same shapes -> consuming steps never
    retrace)."""
    def bake_val(b: _StackedBucket):
        v = b.val * jax.vmap(lambda sc, e: sc[e])(scale_st, b.eid)
        if mesh is not None:
            v = jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, P(axis, None, None))
            )
        return v

    return _StackedSide(
        buckets=tuple(
            _StackedBucket(idx=b.idx, val=bake_val(b), eid=b.eid)
            for b in side.buckets
        ),
        inv_perm=side.inv_perm,
        n_rows=side.n_rows,
    )


def _apply_stacked_hashdrop(side: _StackedSide, x, key, p: float) -> jnp.ndarray:
    """:func:`_apply_stacked` with in-layout edge dropout: the keep mask is
    a counter-hash of the LOCAL edge id (``ops.bucketed_spmm._uniform_from_eid``
    — same eid, same draw in the forward and transpose layouts of a shard,
    the consistency dropout gradients require), so no per-step [E_pad]
    scale vector is built or gathered."""
    from inductive_recommendation_tpu.ops.bucketed_spmm import _uniform_from_eid

    inv = 1.0 / (1.0 - p)
    parts = []
    for b in side.buckets:
        keep = _uniform_from_eid(jax.random.key_data(key), b.eid[0]) >= p
        v = b.val[0] * jnp.where(keep, inv, 0.0)
        g = jnp.take(x, b.idx[0], axis=0)
        parts.append(jnp.einsum("rk,rkd->rd", v, g))
    parts.append(jnp.zeros((1, x.shape[-1]), x.dtype))
    stacked = jnp.concatenate(parts, axis=0)
    return jnp.take(stacked, side.inv_perm[0], axis=0)


def _make_local_fn(axis: str, mode: str):
    """The per-device function with a gather-only custom VJP.

    ``scatter``: out rows sharded (psum_scatter fwd, all_gather bwd).
    ``replicated``: out replicated (psum fwd, bwd uses g as-is).
    ``edge_scale`` here is the STACKED [S, E_pad] local-id form (shard_map
    slices it to [1, E_pad]); it receives a ZERO cotangent — edge scales are
    graph buffers, not parameters (same contract as ops.bucketed_spmm).
    """

    @jax.custom_vjp
    def local_spmm(fwd, bwd, edge_scale, x):
        edge_scale = None if edge_scale is None else edge_scale[0]
        part = _apply_stacked(fwd, x, edge_scale)
        if mode == "scatter":
            return jax.lax.psum_scatter(part, axis, scatter_dimension=0, tiled=True)
        return jax.lax.psum(part, axis)

    def fwd_rule(fwd, bwd, edge_scale, x):
        return local_spmm(fwd, bwd, edge_scale, x), (fwd, bwd, edge_scale)

    def bwd_rule(res, g):
        fwd, bwd, edge_scale = res
        scale_local = None if edge_scale is None else edge_scale[0]
        if mode == "scatter":
            g = jax.lax.all_gather(g, axis, axis=0, tiled=True)
        else:
            # shard_map transposes a replicated (P(None)) output by handing
            # each device 1/S of the global cotangent — reassemble it
            g = jax.lax.psum(g, axis)
        dx = _apply_stacked(bwd, g, scale_local)
        zf = jax.tree_util.tree_map(jnp.zeros_like, fwd)
        zb = jax.tree_util.tree_map(jnp.zeros_like, bwd)
        # zero cotangent: edge scales are graph buffers, not parameters
        zs = None if edge_scale is None else jnp.zeros_like(edge_scale)
        return (zf, zb, zs, dx)

    local_spmm.defvjp(fwd_rule, bwd_rule)
    return local_spmm


def _wrap(mat: EdgeShardedSpMM, mesh, axis: str, mode: str):
    if mesh.shape[axis] != mat.n_shards:
        raise ValueError(
            f"mesh axis '{axis}' has size {mesh.shape[axis]}, layout was built "
            f"for {mat.n_shards} shards"
        )
    out_spec = P(axis, None) if mode == "scatter" else P(None, None)
    return jax.shard_map(
        _make_local_fn(axis, mode),
        mesh=mesh,
        # edge_scale is the stacked [S, E_pad] local-id form, sharded like
        # the layout leaves — each device holds only its own O(nnz/S) slice
        in_specs=(P(axis), P(axis), P(axis), P(axis, None)),
        out_specs=out_spec,
        check_vma=False,
    )


def _make_local_fn_dropout(axis: str, mode: str, p: float):
    """Per-device SpMM with IN-LAYOUT edge dropout (keep 1-p, rescale
    1/(1-p)): the mask hashes (shard index, local eid) per step — shards
    draw i.i.d. (the documented divergence from the single-device flat
    hash; same keep/rescale algebra), and the forward/transpose sides of a
    shard share draws per edge. ``key_data`` is a raw PRNG key-data array
    (replicated); gather-only custom VJP as in :func:`_make_local_fn`."""

    def _shard_key(key_data):
        return jax.random.fold_in(
            jax.random.wrap_key_data(key_data), jax.lax.axis_index(axis)
        )

    @jax.custom_vjp
    def local_spmm(fwd, bwd, key_data, x):
        part = _apply_stacked_hashdrop(fwd, x, _shard_key(key_data), p)
        if mode == "scatter":
            return jax.lax.psum_scatter(part, axis, scatter_dimension=0, tiled=True)
        return jax.lax.psum(part, axis)

    def fwd_rule(fwd, bwd, key_data, x):
        return local_spmm(fwd, bwd, key_data, x), (fwd, bwd, key_data)

    def bwd_rule(res, g):
        fwd, bwd, key_data = res
        if mode == "scatter":
            g = jax.lax.all_gather(g, axis, axis=0, tiled=True)
        else:
            g = jax.lax.psum(g, axis)
        dx = _apply_stacked_hashdrop(bwd, g, _shard_key(key_data), p)
        zf = jax.tree_util.tree_map(jnp.zeros_like, fwd)
        zb = jax.tree_util.tree_map(jnp.zeros_like, bwd)
        return (zf, zb, jnp.zeros_like(key_data), dx)

    local_spmm.defvjp(fwd_rule, bwd_rule)
    return local_spmm


def _wrap_dropout(mat: EdgeShardedSpMM, mesh, axis: str, mode: str, p: float):
    """:func:`_wrap` with in-layout edge dropout at static rate ``p`` —
    fn(fwd, bwd, key_data, x)."""
    if mesh.shape[axis] != mat.n_shards:
        raise ValueError(
            f"mesh axis '{axis}' has size {mesh.shape[axis]}, layout was built "
            f"for {mat.n_shards} shards"
        )
    out_spec = P(axis, None) if mode == "scatter" else P(None, None)
    return jax.shard_map(
        _make_local_fn_dropout(axis, mode, p),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(None), P(axis, None)),
        out_specs=out_spec,
        check_vma=False,
    )


def make_edge_sharded_spmm(mat: EdgeShardedSpMM, mesh, axis="model", mode="scatter"):
    """-> fn(x [n_cols_pad, d] row-sharded over ``axis``, edge_scale=None)

    ``edge_scale`` is a GLOBAL [raw nnz] per-edge vector in the COO order
    given at construction; it is re-indexed into each shard's local edge
    space in-jit through ``eid_map`` (an O(nnz/S)-per-device gather).
    ``scatter``: returns [n_rows_pad, d] row-sharded over ``axis``.
    ``replicated``: returns [n_rows_pad, d] replicated.
    The layout is passed as a jit ARGUMENT (never a closure constant — large
    constants break the remote-compile path).
    """
    wrapped = _wrap(mat, mesh, axis, mode)

    @jax.jit
    def run_plain(fwd, bwd, x):
        return wrapped(fwd, bwd, None, x)

    @jax.jit
    def run_scale(fwd, bwd, eid_map, edge_scale, x):
        stacked = jax.lax.with_sharding_constraint(
            edge_scale[eid_map], NamedSharding(mesh, P(axis, None))
        )
        return wrapped(fwd, bwd, stacked, x)

    def run(x, edge_scale=None):
        if edge_scale is None:
            return run_plain(mat.fwd, mat.bwd, x)
        return run_scale(
            mat.fwd, mat.bwd, mat.eid_map, jnp.asarray(edge_scale), x
        )

    return run


def make_edge_sharded_propagation(
    mat: EdgeShardedSpMM, mesh, n_layers: int, axis="model"
):
    """LightGCN-style propagation (mean of layer outputs incl. layer 0) with
    the operand row-sharded END TO END: every layer consumes and produces a
    P(axis, None)-sharded [n_pad, d]; one reduce-scatter per layer forward,
    one all-gather per layer backward. Requires a square adjacency."""
    if mat.n_rows_pad != mat.n_cols_pad:
        raise ValueError("layer chaining requires a square adjacency")
    spmm = _wrap(mat, mesh, axis, "scatter")

    def prop(fwd, bwd, eid_map, x, edge_scale=None):
        stacked = None
        if edge_scale is not None:
            stacked = jax.lax.with_sharding_constraint(
                edge_scale[eid_map], NamedSharding(mesh, P(axis, None))
            )
        acc, h = x, x
        for _ in range(n_layers):
            h = spmm(fwd, bwd, stacked, h)
            acc = acc + h
        return acc / (n_layers + 1)

    jitted = jax.jit(prop)

    def run(x, edge_scale=None):
        return jitted(mat.fwd, mat.bwd, mat.eid_map, x, edge_scale)

    return run


def shard_operand(x, mat: EdgeShardedSpMM, mesh, axis="model"):
    """Zero-pad x's rows to n_cols_pad and place it row-sharded over ``axis``."""
    x = jnp.asarray(x)
    pad = mat.n_cols_pad - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return jax.device_put(x, NamedSharding(mesh, P(axis, *[None] * (x.ndim - 1))))
