"""Auxiliary-graph views as masked base edges + an injected-edge delta.

Every DOSE/SGL view graph is train-with-edges-removed and/or
train-with-edges-added. Instead of rebuilding a sparse container per epoch
(and propagating it through the slow segment-sum path), a view is:

    A_view = (A_train_raw ∘ keep_mask) * norm + A_delta * norm

- the base part rides the degree-bucketed gather-only SpMM of the RAW
  deduplicated train adjacency (built once, shared by every view of a
  model); the per-edge ``scale`` = keep_mask x sym-normalization of the
  VIEW's degrees is BAKED into a per-view copy of the layout values
  (:class:`BakedView`) so the train step pays no per-step scale gathers;
- the delta part (injected pairs not in train) is a fixed-budget padded COO
  whose backward is the pre-built transpose COO (gather + segment-sum, no
  XLA scatter).

Per-epoch regeneration writes new value/delta arrays of FIXED shapes — no
retrace — and runs ENTIRELY ON DEVICE (:meth:`ViewEngine.make_view_on_device`
+ :func:`bake_view`): device-resident selections feed the view build with no
O(aug_num) device->host fetch and no O(|E|) host->device upload per epoch
(both multi-second on tunneled backends). The host :meth:`ViewEngine.make_view`
remains as the oracle/fallback path.

Normalization matches the reference view builders (utils.py:71-141 +
model.py:409-420): dedup pair set, D^-1/2 A D^-1/2 with view degrees
clamped >= 1.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.ops.bucketed_spmm import (
    build_bucketed_spmm,
    spmm_bucketed,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["base_scale", "d_row", "d_col", "d_val", "dt_row", "dt_col", "dt_val"],
    meta_fields=["n_nodes"],
)
@dataclasses.dataclass(frozen=True)
class EdgeView:
    """Device state of one view: base-edge scales + padded delta COO (both
    directions) + its transpose ordering (for the gather-only backward)."""

    base_scale: jnp.ndarray  # [E2] f32 over the base layout's edge ids
    d_row: jnp.ndarray  # [D] int32 delta rows (sorted)
    d_col: jnp.ndarray  # [D] int32
    d_val: jnp.ndarray  # [D] f32 (0 on padding)
    dt_row: jnp.ndarray  # [D] transpose-sorted copies
    dt_col: jnp.ndarray
    dt_val: jnp.ndarray
    n_nodes: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "base", "d_row", "d_col", "d_val", "dt_row", "dt_col", "dt_val",
        "ck_fwd", "ck_bwd",
    ],
    meta_fields=["n_nodes"],
)
@dataclasses.dataclass(frozen=True)
class BakedView:
    """A view whose keep-mask x normalization is FOLDED into a per-view copy
    of the base layout's values (ops.bucketed_spmm.with_baked_edge_scale).

    The scale changes once per epoch; baking it then removes the per-step
    eid+scale gathers (~15 ms/side at 1.8M edges on v5e) from every view
    SpMM. idx/eid arrays are shared with the raw layout — only the value
    arrays are new.

    ``ck_fwd``/``ck_bwd``: per-epoch chunked-gather structures for the
    delta (:func:`chunked_segment_structs`, both product directions) — the
    per-step delta then runs scatter-free (:func:`chunked_delta_spmm`,
    measured 6.93 ms vs the segment-sum oracle's 13.2 ms at 1M entries x d=64 on v5e, DOSE_BREAKDOWN_r04.json);
    ``None`` for drop-only views (delta_budget 0)."""

    base: object  # BucketedSpMM with baked values
    d_row: jnp.ndarray
    d_col: jnp.ndarray
    d_val: jnp.ndarray
    dt_row: jnp.ndarray
    dt_col: jnp.ndarray
    dt_val: jnp.ndarray
    ck_fwd: tuple | None
    ck_bwd: tuple | None
    n_nodes: int


@jax.jit
def bake_view(raw_base, view: EdgeView) -> BakedView:
    """EdgeView -> BakedView against the engine's raw train layout."""
    from inductive_recommendation_tpu.ops.bucketed_spmm import with_baked_edge_scale

    if view.d_row.shape[0]:
        ck_fwd = chunked_segment_structs(
            view.d_row, view.d_col, view.d_val, view.n_nodes
        )
        # the transpose product's rows are the col-sorted copy's columns
        ck_bwd = chunked_segment_structs(
            view.dt_col, view.dt_row, view.dt_val, view.n_nodes
        )
    else:
        ck_fwd = ck_bwd = None
    return BakedView(
        base=with_baked_edge_scale(raw_base, view.base_scale),
        d_row=view.d_row,
        d_col=view.d_col,
        d_val=view.d_val,
        dt_row=view.dt_row,
        dt_col=view.dt_col,
        dt_val=view.dt_val,
        ck_fwd=ck_fwd,
        ck_bwd=ck_bwd,
        n_nodes=view.n_nodes,
    )


@jax.custom_vjp
def _delta_spmm(delta, x):
    """delta = (d_row, d_col, d_val, dt_row, dt_col, dt_val); x [n_nodes, d]."""
    d_row, d_col, d_val = delta[0], delta[1], delta[2]
    g = jnp.take(x, d_col, axis=0) * d_val[:, None]
    return jax.ops.segment_sum(
        g, d_row, num_segments=x.shape[0], indices_are_sorted=True
    )


def _delta_fwd(delta, x):
    return _delta_spmm(delta, x), delta


def _delta_bwd(delta, g):
    # transpose product via the col-sorted copy: gather + segment-sum only
    dt_row, dt_col, dt_val = delta[3], delta[4], delta[5]
    gg = jnp.take(g, dt_row, axis=0) * dt_val[:, None]
    dx = jax.ops.segment_sum(
        gg, dt_col, num_segments=g.shape[0], indices_are_sorted=True
    )
    return jax.tree_util.tree_map(jnp.zeros_like, delta), dx


_delta_spmm.defvjp(_delta_fwd, _delta_bwd)


def chunked_segment_structs(d_row, d_col, d_val, n_out: int, C: int = 8):
    """Per-epoch gather structures for a scatter-free sorted segment-sum.

    ``segment_sum(x[d_col]·d_val, d_row)`` with sorted ``d_row`` decomposes
    EXACTLY into static-shape gathers + one small cumsum (out[r] =
    Z(bounds[r+1]) − Z(bounds[r]) with Z split into chunk-prefix + in-chunk
    tail): per-step cost is two bucket-style gather-reduces ([B/C, C] chunk
    sums + [n_out+1, C] boundary tails) and a [B/C, d] cumsum — measured
    6.93 ms vs the segment-sum oracle's 13.2 ms at B=1M, d=64 on v5e (1.9x, DOSE_BREAKDOWN_r04.json;
    scatter-add is ~4x the gather transaction floor there). Everything
    data-dependent (boundaries via bincount+cumsum of d_row, tail gather
    indices/values) lives HERE, once per epoch (~75 ms at 1M on v5e, noise
    against a ~60 s epoch); the per-step path is pure gathers.

    The last chunk zero-pads to a multiple of ``C`` with row ``n_out-1``
    entries of value 0 (sortedness and row sums preserved). Numerics: the
    cumsum-difference reconstruction loses low bits where a boundary's
    prefix is much larger than the row's sum — measured max 8.7e-6 relative
    at B=1M with zipf-concentrated rows (well inside the fp32 noise the
    tests' 1e-4-class tolerances allow).

    Returns ``(c_idx [M,C], c_val [M,C], t_idx [n_out+1,C],
    t_val [n_out+1,C], pc [n_out+1])`` — plain arrays, jit-transparent.
    """
    B = d_row.shape[0]
    M = -(-B // C)
    pad = M * C - B
    if pad:
        d_row = jnp.concatenate(
            [d_row, jnp.full((pad,), n_out - 1, d_row.dtype)]
        )
        d_col = jnp.concatenate([d_col, jnp.zeros((pad,), d_col.dtype)])
        d_val = jnp.concatenate([d_val, jnp.zeros((pad,), d_val.dtype)])
    Bp = M * C
    cnt = jnp.bincount(d_row, length=n_out)
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt).astype(jnp.int32)]
    )
    pc = bounds // C
    jj = pc[:, None] * C + jnp.arange(C, dtype=jnp.int32)[None, :]
    jj_safe = jnp.minimum(jj, Bp - 1)
    mask = jj < bounds[:, None]
    t_idx = d_col[jj_safe]
    t_val = jnp.where(mask, d_val[jj_safe], 0.0)
    return (d_col.reshape(M, C), d_val.reshape(M, C), t_idx, t_val, pc)


def _chunked_apply(struct, x):
    # tolerate the 7-tuple rect structs (extra key planes unused at p=0)
    c_idx, c_val, t_idx, t_val, pc = struct[:5]
    chunk = jnp.einsum("rk,rkd->rd", c_val, jnp.take(x, c_idx, axis=0))
    Zc = jnp.cumsum(chunk, axis=0)
    tails = jnp.einsum("rk,rkd->rd", t_val, jnp.take(x, t_idx, axis=0))
    Zc_pad = jnp.concatenate([jnp.zeros((1, x.shape[1]), x.dtype), Zc], axis=0)
    Zb = jnp.take(Zc_pad, pc, axis=0) + tails
    return Zb[1:] - Zb[:-1]


def chunked_rect_structs(rows, cols, vals, entry_keys, n_out: int, C: int = 8):
    """:func:`chunked_segment_structs` + per-entry KEY windows, for the
    rectangular deltas whose per-step dropout hashes the entry key
    (``delta_spmm_rect_dropout``'s ``row * n_cols + col``). ``entry_keys``
    must be the FORWARD-orientation key per entry (the transpose struct
    passes the same keys in its own order, so both product directions draw
    the same mask per entry — the consistency dropout gradients require).

    Returns ``(c_idx, c_val, t_idx, t_val, pc, c_key, t_key)``; feed to
    :func:`chunked_rect_delta_spmm_dropout` (or drop the key planes and use
    :func:`chunked_delta_spmm` when no dropout applies)."""
    B = rows.shape[0]
    M = -(-B // C)
    pad = M * C - B
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad,), n_out - 1, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
        entry_keys = jnp.concatenate(
            [entry_keys, jnp.zeros((pad,), entry_keys.dtype)]
        )
    Bp = M * C
    cnt = jnp.bincount(rows, length=n_out)
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt).astype(jnp.int32)]
    )
    pc = bounds // C
    jj = pc[:, None] * C + jnp.arange(C, dtype=jnp.int32)[None, :]
    jj_safe = jnp.minimum(jj, Bp - 1)
    mask = jj < bounds[:, None]
    return (
        cols.reshape(M, C),
        vals.reshape(M, C),
        cols[jj_safe],
        jnp.where(mask, vals[jj_safe], 0.0),
        pc,
        entry_keys.reshape(M, C),
        entry_keys[jj_safe],
    )


def _chunked_apply_drop(struct, key_data, p, x):
    """:func:`_chunked_apply` with the entry-key hash dropout folded into
    the chunk AND tail value planes (same key -> same draw in every plane
    and in both product directions)."""
    c_idx, c_val, t_idx, t_val, pc, c_key, t_key = struct
    inv = 1.0 / (1.0 - p)
    cv = c_val * jnp.where(_uniform_from_entry(key_data, c_key) >= p, inv, 0.0)
    tv = t_val * jnp.where(_uniform_from_entry(key_data, t_key) >= p, inv, 0.0)
    chunk = jnp.einsum("rk,rkd->rd", cv, jnp.take(x, c_idx, axis=0))
    Zc = jnp.cumsum(chunk, axis=0)
    tails = jnp.einsum("rk,rkd->rd", tv, jnp.take(x, t_idx, axis=0))
    Zc_pad = jnp.concatenate([jnp.zeros((1, x.shape[1]), x.dtype), Zc], axis=0)
    Zb = jnp.take(Zc_pad, pc, axis=0) + tails
    return Zb[1:] - Zb[:-1]


@jax.custom_vjp
def chunked_rect_delta_spmm_dropout(fwd_struct, bwd_struct, key_data, p, x):
    """Scatter-free rectangular delta SpMM with in-place entry dropout —
    the chunked form of :func:`delta_spmm_rect_dropout` (same entry-key
    hash, so masks match it exactly; measured 1.9x at 1M entries x d=64).
    The backward rides ``bwd_struct`` with the SAME key."""
    return _chunked_apply_drop(fwd_struct, key_data, p, x)


def _ckd_fwd(fwd_struct, bwd_struct, key_data, p, x):
    return (
        chunked_rect_delta_spmm_dropout(fwd_struct, bwd_struct, key_data, p, x),
        (fwd_struct, bwd_struct, key_data, p),
    )


def _ckd_bwd(res, g):
    fwd_struct, bwd_struct, key_data, p = res
    dx = _chunked_apply_drop(bwd_struct, key_data, p, g)
    zf = jax.tree_util.tree_map(jnp.zeros_like, fwd_struct)
    zb = jax.tree_util.tree_map(jnp.zeros_like, bwd_struct)
    return (zf, zb, jnp.zeros_like(key_data), jnp.zeros_like(p), dx)


chunked_rect_delta_spmm_dropout.defvjp(_ckd_fwd, _ckd_bwd)


def rect_chunk_pair(delta, n_out: int, n_in: int, n_cols: int, C: int = 8):
    """(d_row, d_col, d_val, dt_row, dt_col, dt_val) -> (fwd, bwd) chunked
    structures for a RECTANGULAR delta: forward D @ x into ``n_out`` rows,
    backward D^T @ g into ``n_in`` rows (x's row count). Entry keys use the
    forward orientation ``row * n_cols + col`` on BOTH sides, matching
    :func:`delta_spmm_rect_dropout` (int32 wraparound deterministic)."""
    d_row, d_col, d_val, dt_row, dt_col, dt_val = delta
    kf = d_row * jnp.int32(n_cols) + d_col
    kb = dt_row * jnp.int32(n_cols) + dt_col
    return (
        chunked_rect_structs(d_row, d_col, d_val, kf, n_out, C),
        chunked_rect_structs(dt_col, dt_row, dt_val, kb, n_in, C),
    )


@jax.custom_vjp
def chunked_delta_spmm(fwd_struct, bwd_struct, x):
    """Scatter-free delta SpMM: ``out = D @ x`` via the forward chunked
    structure; the backward ``dx = D^T @ g`` rides ``bwd_struct`` (built
    from the transpose-sorted copy) — gathers + cumsum on BOTH sides, no
    XLA scatter anywhere (the no-scatter architecture invariant)."""
    return _chunked_apply(fwd_struct, x)


def _ck_fwd(fwd_struct, bwd_struct, x):
    return chunked_delta_spmm(fwd_struct, bwd_struct, x), (fwd_struct, bwd_struct)


def _ck_bwd(res, g):
    fwd_struct, bwd_struct = res
    dx = _chunked_apply(bwd_struct, g)
    zf = jax.tree_util.tree_map(jnp.zeros_like, fwd_struct)
    zb = jax.tree_util.tree_map(jnp.zeros_like, bwd_struct)
    return (zf, zb, dx)


chunked_delta_spmm.defvjp(_ck_fwd, _ck_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def delta_spmm_rect(n_out: int, delta, x):
    """Rectangular fixed-budget delta SpMM: out [n_out, d] = D @ x.

    ``delta`` = (d_row, d_col, d_val, dt_row, dt_col, dt_val) with d_row
    sorted and dt_col sorted (transpose copy for the gather-only backward).
    Unlike :func:`_delta_spmm` the output row count is decoupled from
    ``x.shape[0]`` — needed for the (n_nodes x feat_cols) aug feature
    matrix's injected entries (DOSE_aug2, reference model.py:935-978)."""
    d_row, d_col, d_val = delta[0], delta[1], delta[2]
    g = jnp.take(x, d_col, axis=0) * d_val[:, None]
    return jax.ops.segment_sum(
        g, d_row, num_segments=n_out, indices_are_sorted=True
    )


def _rect_fwd(n_out, delta, x):
    return delta_spmm_rect(n_out, delta, x), (delta, x)


def _rect_bwd(n_out, res, g):
    delta, x = res
    dt_row, dt_col, dt_val = delta[3], delta[4], delta[5]
    gg = jnp.take(g, dt_row, axis=0) * dt_val[:, None]
    dx = jax.ops.segment_sum(
        gg, dt_col, num_segments=x.shape[0], indices_are_sorted=True
    )
    return jax.tree_util.tree_map(jnp.zeros_like, delta), dx


delta_spmm_rect.defvjp(_rect_fwd, _rect_bwd)


def _uniform_from_entry(key_data, ids):
    """U(0,1) per delta entry from a SALTED counter-hash of the entry key —
    order-invariant (the forward and transpose copies hold the same
    (row, col) entries in different orders) and decorrelated from the base
    layout's eid draws (ops.bucketed_spmm._uniform_from_eid)."""
    key = jax.random.fold_in(jax.random.wrap_key_data(key_data), 0x7FFFFFFF)
    flat = jax.vmap(lambda e: jax.random.fold_in(key, e))(ids.ravel())
    return jax.vmap(jax.random.uniform)(flat).reshape(ids.shape)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def delta_spmm_rect_dropout(n_out: int, n_cols: int, delta, key_data, p, x):
    """:func:`delta_spmm_rect` with in-place entry dropout (keep with prob
    1-p, rescale 1/(1-p)): the mask is a hash of the entry key
    row * n_cols + col (int32 wraparound is deterministic, so the forward
    and transpose orderings draw identically per entry)."""
    d_row, d_col, d_val = delta[0], delta[1], delta[2]
    keep = _uniform_from_entry(key_data, d_row * jnp.int32(n_cols) + d_col) >= p
    v = jnp.where(keep, d_val / (1.0 - p), 0.0)
    g = jnp.take(x, d_col, axis=0) * v[:, None]
    return jax.ops.segment_sum(
        g, d_row, num_segments=n_out, indices_are_sorted=True
    )


def _rect_drop_fwd(n_out, n_cols, delta, key_data, p, x):
    return delta_spmm_rect_dropout(n_out, n_cols, delta, key_data, p, x), (
        delta,
        key_data,
        p,
        x,
    )


def _rect_drop_bwd(n_out, n_cols, res, g):
    delta, key_data, p, x = res
    dt_row, dt_col, dt_val = delta[3], delta[4], delta[5]
    keep = _uniform_from_entry(key_data, dt_row * jnp.int32(n_cols) + dt_col) >= p
    v = jnp.where(keep, dt_val / (1.0 - p), 0.0)
    gg = jnp.take(g, dt_row, axis=0) * v[:, None]
    dx = jax.ops.segment_sum(
        gg, dt_col, num_segments=x.shape[0], indices_are_sorted=True
    )
    return (
        jax.tree_util.tree_map(jnp.zeros_like, delta),
        jnp.zeros_like(key_data),
        jnp.zeros_like(p),
        dx,
    )


delta_spmm_rect_dropout.defvjp(_rect_drop_fwd, _rect_drop_bwd)


class ViewEngine:
    """Per-model factory for EdgeViews over one shared raw-train layout."""

    def __init__(self, train_array, n_users, n_items, delta_budget: int = 0):
        self.n_users, self.n_items = n_users, n_items
        self.n_nodes = n_users + n_items
        pairs = np.unique(np.asarray(train_array, dtype=np.int64).reshape(-1, 2), axis=0)
        self.train_pairs = pairs
        self.train_keys = pairs[:, 0] * n_items + pairs[:, 1]  # sorted (unique)
        E = len(pairs)
        # both directions; edge ids 0..E-1 = u->i, E..2E-1 = i->u (same pair
        # id mod E, so one per-pair mask expands to both directions)
        row = np.concatenate([pairs[:, 0], n_users + pairs[:, 1]])
        col = np.concatenate([n_users + pairs[:, 1], pairs[:, 0]])
        order = np.argsort(row, kind="stable")
        self._eid_pair = np.concatenate([np.arange(E), np.arange(E)])[order]
        self.base = build_bucketed_spmm(
            row[order],
            col[order],
            np.ones(2 * E, np.float32),
            (self.n_nodes, self.n_nodes),
            symmetric=False,  # edge_scale requires the transpose layout
        )
        # NOTE build_bucketed_spmm assigns edge ids in the COO order it was
        # given, so eid e corresponds to (row[order][e], col[order][e]); the
        # pair id of base edge e is self._eid_pair[e]
        self._base_rows = row[order]
        self._base_cols = col[order]
        self.delta_budget = int(delta_budget)

    # -- view construction (host, once per epoch) ----------------------------
    def make_view(self, keep_pair_mask=None, add_pairs=None) -> EdgeView:
        """keep_pair_mask: bool [n_train_pairs] (None = keep all);
        add_pairs: (u, i) array of injected pairs (dedup vs train applied
        here). Degrees/normalization are those of the resulting view graph."""
        E = len(self.train_pairs)
        if keep_pair_mask is None:
            keep_pair_mask = np.ones(E, dtype=bool)
        keep_pair_mask = np.asarray(keep_pair_mask, dtype=bool)

        if add_pairs is not None and len(add_pairs):
            add_pairs = np.unique(
                np.asarray(add_pairs, dtype=np.int64).reshape(-1, 2), axis=0
            )
            keys = add_pairs[:, 0] * self.n_items + add_pairs[:, 1]
            pos = np.searchsorted(self.train_keys, keys)
            pos_c = np.clip(pos, 0, max(E - 1, 0))
            in_train = (self.train_keys[pos_c] == keys) if E else np.zeros(len(keys), bool)
            # injected pairs already in train: force-keep their base edges
            keep_pair_mask = keep_pair_mask.copy()
            keep_pair_mask[pos_c[in_train]] = True
            delta = add_pairs[~in_train]
        else:
            delta = np.zeros((0, 2), dtype=np.int64)
        D = len(delta)
        if D > self.delta_budget:
            raise ValueError(f"delta {D} exceeds budget {self.delta_budget}")

        # view degrees over nodes
        deg = np.zeros(self.n_nodes, dtype=np.float64)
        kept = self.train_pairs[keep_pair_mask]
        np.add.at(deg, kept[:, 0], 1.0)
        np.add.at(deg, self.n_users + kept[:, 1], 1.0)
        if D:
            np.add.at(deg, delta[:, 0], 1.0)
            np.add.at(deg, self.n_users + delta[:, 1], 1.0)
        d_inv = np.power(np.maximum(deg, 1.0), -0.5)

        base_scale = (
            keep_pair_mask[self._eid_pair]
            * d_inv[self._base_rows]
            * d_inv[self._base_cols]
        ).astype(np.float32)

        B = self.delta_budget
        d_row = np.zeros(2 * B, np.int64)
        d_col = np.zeros(2 * B, np.int64)
        d_val = np.zeros(2 * B, np.float32)
        if D:
            rr = np.concatenate([delta[:, 0], self.n_users + delta[:, 1]])
            cc = np.concatenate([self.n_users + delta[:, 1], delta[:, 0]])
            vv = (d_inv[rr] * d_inv[cc]).astype(np.float32)
            d_row[: 2 * D], d_col[: 2 * D], d_val[: 2 * D] = rr, cc, vv
        order = np.argsort(d_row, kind="stable")
        d_row, d_col, d_val = d_row[order], d_col[order], d_val[order]
        t_order = np.argsort(d_col, kind="stable")
        return EdgeView(
            base_scale=jnp.asarray(base_scale),
            d_row=jnp.asarray(d_row, jnp.int32),
            d_col=jnp.asarray(d_col, jnp.int32),
            d_val=jnp.asarray(d_val),
            dt_row=jnp.asarray(d_row[t_order], jnp.int32),
            dt_col=jnp.asarray(d_col[t_order], jnp.int32),
            dt_val=jnp.asarray(d_val[t_order]),
            n_nodes=self.n_nodes,
        )

    # -- device-side construction ---------------------------------------------
    def _device_buffers(self):
        """Static engine arrays on device (built lazily on first use)."""
        if not hasattr(self, "_dbuf"):
            self._dbuf = {
                "train_u": jnp.asarray(self.train_pairs[:, 0], jnp.int32),
                "train_i": jnp.asarray(self.train_pairs[:, 1], jnp.int32),
                # default int width (32-bit; the callers guard the range)
                "train_keys": jnp.asarray(self.train_keys),
                "eid_pair": jnp.asarray(self._eid_pair, jnp.int32),
                "base_rows": jnp.asarray(self._base_rows, jnp.int32),
                "base_cols": jnp.asarray(self._base_cols, jnp.int32),
            }
        return self._dbuf

    def make_view_on_device(
        self, keep_pair_mask=None, add_pairs=None, add_valid=None
    ) -> EdgeView:
        """``make_view`` computed entirely ON DEVICE (one jitted program).

        Selection outputs (cos-topk pair ids, random keys) stay on device and
        the resulting EdgeView arrays are produced there — no O(aug_num)
        device→host fetch and no O(|E|) host→device upload per epoch, which
        on tunneled backends dominates the epoch-update cost. Semantics match
        :meth:`make_view` (dedup within adds, dedup vs train with force-keep,
        view-degree normalization); only the intra-row-id ordering of the
        delta COO may differ (the represented matrix is identical).

        ``add_valid``: optional bool mask over ``add_pairs`` rows for
        selections whose accepted count is data-dependent (e.g. a cosine
        threshold) — invalid rows are ignored, keeping shapes static.

        The per-epoch degree accumulation uses scatter-add — outside the
        train step's no-scatter rule by design (once per epoch, not per
        step)."""
        # pair keys must fit the default 32-bit int lattice (x64 is off);
        # beyond that — or on a degenerate empty train set, whose zero-length
        # gathers are undefined inside jit — fall back to the host builder
        if (
            self.n_users * self.n_items + self.delta_budget >= 2**31
            or len(self.train_pairs) == 0
        ):
            add_host = None if add_pairs is None else np.asarray(add_pairs)
            if add_host is not None and add_valid is not None:
                add_host = add_host[np.asarray(add_valid)]
            return self.make_view(
                keep_pair_mask=None
                if keep_pair_mask is None
                else np.asarray(keep_pair_mask),
                add_pairs=add_host,
            )
        B = self.delta_budget
        d = self._device_buffers()
        if add_pairs is None:
            add_pairs = jnp.zeros((0, 2), jnp.int32)
        else:
            add_pairs = jnp.asarray(add_pairs)
            if add_pairs.shape[0] > B:
                # the host builder dedups and removes in-train pairs BEFORE
                # its budget check; more raw candidates than budget is legal
                # there, so fall back instead of imposing a stricter
                # precondition (it still raises if the DEDUPED count exceeds
                # the budget)
                add_host = np.asarray(add_pairs)
                if add_valid is not None:
                    add_host = add_host[np.asarray(add_valid)]
                return self.make_view(
                    keep_pair_mask=None
                    if keep_pair_mask is None
                    else np.asarray(keep_pair_mask),
                    add_pairs=add_host,
                )
        # everything below (padding included) runs inside one jitted program
        # — eager dispatch costs ~seconds per op on tunneled backends
        out = _device_make_view(
            d["train_u"],
            d["train_i"],
            d["train_keys"],
            d["eid_pair"],
            d["base_rows"],
            d["base_cols"],
            keep_pair_mask,
            add_pairs,
            add_valid,
            budget=B,
            n_users=self.n_users,
            n_items=self.n_items,
        )
        return EdgeView(*out, n_nodes=self.n_nodes)

    def keep_mask_from_drop_pairs_on_device(self, drop_pairs) -> jnp.ndarray:
        """Device analog of :meth:`keep_mask_from_drop_pairs`."""
        # 32-bit pair-key range; empty train set: the zero-length gather in
        # _device_keep_mask is undefined inside jit (same hazard as
        # make_view_on_device's guard)
        if self.n_users * self.n_items >= 2**31 or len(self.train_pairs) == 0:
            return jnp.asarray(
                self.keep_mask_from_drop_pairs(np.asarray(drop_pairs))
            )
        d = self._device_buffers()
        drop_pairs = jnp.asarray(drop_pairs)
        keys = drop_pairs[:, 0] * self.n_items + drop_pairs[:, 1]
        return _device_keep_mask(d["train_keys"], keys)

    def keep_mask_from_drop_pairs(self, drop_pairs) -> np.ndarray:
        """Train-pair keep mask dropping the given (u, i) pairs (set
        difference semantics, utils.py:123-141)."""
        E = len(self.train_pairs)
        mask = np.ones(E, dtype=bool)
        drop_pairs = np.asarray(drop_pairs, dtype=np.int64).reshape(-1, 2)
        if len(drop_pairs) == 0 or E == 0:
            return mask
        keys = drop_pairs[:, 0] * self.n_items + drop_pairs[:, 1]
        pos = np.clip(np.searchsorted(self.train_keys, keys), 0, E - 1)
        hit = self.train_keys[pos] == keys
        mask[pos[hit]] = False
        return mask


@partial(jax.jit, static_argnames=("budget", "n_users", "n_items"))
def _device_make_view(
    train_u,
    train_i,
    train_keys,
    eid_pair,
    base_rows,
    base_cols,
    keep_pair_mask,
    add_pairs,
    add_valid,
    *,
    budget: int,
    n_users: int,
    n_items: int,
):
    """On-device EdgeView arrays; mirrors ViewEngine.make_view exactly.

    ``keep_pair_mask``/``add_valid`` may be None (keep-all / all-valid);
    ``add_pairs`` [n, 2] is zero-padded to ``budget`` here, inside the jit.
    """
    E = train_u.shape[0]
    B = budget
    n = add_pairs.shape[0]
    pad = B - n
    add_u = jnp.concatenate(
        [add_pairs[:, 0].astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    add_i = jnp.concatenate(
        [add_pairs[:, 1].astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    head = (
        jnp.ones((n,), bool) if add_valid is None else jnp.asarray(add_valid, bool)
    )
    add_valid = jnp.concatenate([head, jnp.zeros((pad,), bool)])
    if keep_pair_mask is None:
        keep_pair_mask = jnp.ones((E,), bool)
    else:
        keep_pair_mask = jnp.asarray(keep_pair_mask, bool)
    n_nodes = n_users + n_items
    # pair keys in the default (32-bit) int lattice; make_view_on_device
    # guards the range. Invalid entries get distinct sentinel keys so they
    # neither match train nor dedup against real pairs.
    keys = add_u * n_items + add_i
    keys = jnp.where(add_valid, keys, n_users * n_items + jnp.arange(B))

    # dedup within adds (host path: np.unique over add_pairs)
    order = jnp.argsort(keys)
    sk = keys[order]
    dup_sorted = jnp.concatenate([jnp.zeros((1,), bool), sk[1:] == sk[:-1]])
    valid = jnp.zeros((B,), bool).at[order].set(~dup_sorted) & add_valid

    # dedup vs train; injected pairs already in train force-keep their edges
    pos = jnp.clip(jnp.searchsorted(train_keys, keys), 0, max(E - 1, 0))
    in_train = (train_keys[pos] == keys) & valid
    keep = (
        keep_pair_mask.astype(jnp.int32).at[pos].max(in_train.astype(jnp.int32)) > 0
    )
    delta_valid = valid & ~in_train

    # view degrees (scatter-add: once per epoch, not in the step hot path)
    kf = keep.astype(jnp.float32)
    df = delta_valid.astype(jnp.float32)
    deg = (
        jnp.zeros((n_nodes,), jnp.float32)
        .at[train_u].add(kf)
        .at[n_users + train_i].add(kf)
        .at[add_u].add(df)
        .at[n_users + add_i.astype(jnp.int32)].add(df)
    )
    d_inv = jnp.power(jnp.maximum(deg, 1.0), -0.5)

    base_scale = (
        keep[eid_pair].astype(jnp.float32) * d_inv[base_rows] * d_inv[base_cols]
    )

    # fixed-budget delta COO, both directions, zero on padding (padding gets
    # row/col 0 and val 0 — same as the host builder)
    au = jnp.where(delta_valid, add_u, 0)
    ai = jnp.where(delta_valid, n_users + add_i, 0)
    rr = jnp.concatenate([au, ai]).astype(jnp.int32)
    cc = jnp.concatenate([ai, au]).astype(jnp.int32)
    vv = d_inv[rr] * d_inv[cc] * jnp.concatenate([df, df])
    o = jnp.argsort(rr)
    d_row, d_col, d_val = rr[o], cc[o], vv[o]
    t = jnp.argsort(d_col)
    return base_scale, d_row, d_col, d_val, d_row[t], d_col[t], d_val[t]


@partial(jax.jit, static_argnames=("budget", "n_users", "n_items", "user_dim"))
def device_make_feat_delta(
    train_keys,
    user_map,
    item_map,
    base_row_sum,
    add_pairs,
    alpha,
    *,
    budget: int,
    n_users: int,
    n_items: int,
    user_dim: int,
):
    """Fixed-budget injected-entry delta for the IGCN aug FEATURE matrix over
    train ∪ add_pairs (DOSE_aug2, reference model.py:935-978) — the feat
    analog of :func:`_device_make_view`, entirely on device.

    Each non-train injected pair (u, i) contributes a user-row entry
    (u, user_dim + item_map[i]) and an item-row entry (n_users + i,
    user_map[u]) where the maps are >= 0 (core membership), all with
    multiplicity 1 (the union dedups). The train part of the matrix is the
    STATIC base layout; only the returned row sums and delta arrays change
    per epoch, so the train step never retraces.

    Returns (row_sum_view, d_row, d_col, d_val, dt_row, dt_col, dt_val):
    the view's unweighted row sums (base + injected entries; feeds
    with_annealed_values for the base part) and the delta COO in forward /
    transpose orderings with the alpha-annealed weights already applied.
    """
    E = train_keys.shape[0]
    B = budget
    m = add_pairs.shape[0]
    pad = B - m
    au = jnp.concatenate(
        [add_pairs[:, 0].astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    ai = jnp.concatenate(
        [add_pairs[:, 1].astype(jnp.int32), jnp.zeros((pad,), jnp.int32)]
    )
    valid = jnp.concatenate([jnp.ones((m,), bool), jnp.zeros((pad,), bool)])

    keys = au * n_items + ai
    keys = jnp.where(valid, keys, n_users * n_items + jnp.arange(B))
    # dedup within adds
    order = jnp.argsort(keys)
    sk = keys[order]
    dup_sorted = jnp.concatenate([jnp.zeros((1,), bool), sk[1:] == sk[:-1]])
    valid = jnp.zeros((B,), bool).at[order].set(~dup_sorted) & valid
    # union semantics: pairs already in train contribute nothing new
    pos = jnp.clip(jnp.searchsorted(train_keys, keys), 0, max(E - 1, 0))
    valid = valid & ~((train_keys[pos] == keys) if E else jnp.zeros((B,), bool))

    im = item_map[ai]
    um = user_map[au]
    e1_valid = valid & (im >= 0)
    e2_valid = valid & (um >= 0)
    rows1 = jnp.where(e1_valid, au, 0)
    cols1 = jnp.where(e1_valid, user_dim + jnp.maximum(im, 0), 0)
    rows2 = jnp.where(e2_valid, n_users + ai, 0)
    cols2 = jnp.where(e2_valid, jnp.maximum(um, 0), 0)
    e1f = e1_valid.astype(jnp.float32)
    e2f = e2_valid.astype(jnp.float32)

    row_sum_view = (
        jnp.asarray(base_row_sum, jnp.float32).at[rows1].add(e1f).at[rows2].add(e2f)
    )
    expo = (jnp.asarray(alpha, jnp.float32) - 1.0) / 2.0 - 0.5
    w = jnp.power(jnp.maximum(row_sum_view, 1e-12), expo)

    rr = jnp.concatenate([rows1, rows2]).astype(jnp.int32)
    cc = jnp.concatenate([cols1, cols2]).astype(jnp.int32)
    vv = jnp.concatenate([e1f, e2f]) * w[rr]
    o = jnp.argsort(rr)
    d_row, d_col, d_val = rr[o], cc[o], vv[o]
    t = jnp.argsort(d_col)
    return row_sum_view, d_row, d_col, d_val, d_row[t], d_col[t], d_val[t]


def feat_delta_host(
    train_keys,
    user_map,
    item_map,
    base_row_sum,
    add_pairs,
    alpha,
    *,
    budget: int,
    n_users: int,
    n_items: int,
    user_dim: int,
):
    """Host oracle / 64-bit fallback for :func:`device_make_feat_delta`
    (pair keys beyond the device's 32-bit int lattice). Same contract:
    (row_sum_view, d_row, d_col, d_val, dt_row, dt_col, dt_val) with the
    delta zero-padded to ``2 * budget`` entries and alpha-annealed values."""
    train_keys = np.asarray(train_keys, np.int64)
    user_map = np.asarray(user_map, np.int64)
    item_map = np.asarray(item_map, np.int64)
    add_pairs = np.unique(np.asarray(add_pairs, np.int64).reshape(-1, 2), axis=0)
    keys = add_pairs[:, 0] * n_items + add_pairs[:, 1]
    E = len(train_keys)
    pos = np.clip(np.searchsorted(train_keys, keys), 0, max(E - 1, 0))
    in_train = (train_keys[pos] == keys) if E else np.zeros(len(keys), bool)
    delta = add_pairs[~in_train]
    if len(delta) > budget:
        raise ValueError(f"aug delta {len(delta)} exceeds budget {budget}")

    au, ai = delta[:, 0], delta[:, 1]
    im, um = item_map[ai], user_map[au]
    e1 = im >= 0  # user-row entries (u, user_dim + item_map[i])
    e2 = um >= 0  # item-row entries (n_users + i, user_map[u])
    row_sum_view = np.asarray(base_row_sum, np.float64).copy()
    np.add.at(row_sum_view, au[e1], 1.0)
    np.add.at(row_sum_view, n_users + ai[e2], 1.0)
    expo = (float(alpha) - 1.0) / 2.0 - 0.5
    w = np.power(np.maximum(row_sum_view, 1e-12), expo)

    B = budget
    rr = np.zeros(2 * B, np.int64)
    cc = np.zeros(2 * B, np.int64)
    vv = np.zeros(2 * B, np.float32)
    n1, n2 = int(e1.sum()), int(e2.sum())
    rr[:n1], cc[:n1] = au[e1], user_dim + im[e1]
    rr[B : B + n2], cc[B : B + n2] = n_users + ai[e2], um[e2]
    vv[:n1] = w[rr[:n1]]
    vv[B : B + n2] = w[rr[B : B + n2]]
    o = np.argsort(rr, kind="stable")
    d_row, d_col, d_val = rr[o], cc[o], vv[o]
    t = np.argsort(d_col, kind="stable")
    return (
        jnp.asarray(row_sum_view, jnp.float32),
        jnp.asarray(d_row, jnp.int32),
        jnp.asarray(d_col, jnp.int32),
        jnp.asarray(d_val),
        jnp.asarray(d_row[t], jnp.int32),
        jnp.asarray(d_col[t], jnp.int32),
        jnp.asarray(d_val[t]),
    )


@partial(jax.jit, static_argnames=("n", "n_users", "n_items", "seed"))
def random_pairs_on_device(counter, *, n, n_users, n_items, seed):
    """n uniform random (u, i) pairs, generated on device (jitted; integer
    counter folded into the key — nothing crosses the host boundary)."""
    key = jax.random.fold_in(jax.random.key(seed), counter)
    r1, r2 = jax.random.split(key)
    u = jax.random.randint(r1, (n,), 0, n_users, dtype=jnp.int32)
    i = jax.random.randint(r2, (n,), 0, n_items, dtype=jnp.int32)
    return jnp.stack([u, i], axis=1)


@partial(jax.jit, static_argnames=("n_pairs", "n_keep", "seed"))
def random_keep_mask_on_device(counter, *, n_pairs, n_keep, seed):
    """Exactly n_keep kept pairs (reference random.sample semantics),
    generated on device."""
    key = jax.random.fold_in(jax.random.key(seed), counter)
    u = jax.random.uniform(key, (n_pairs,))
    kept = jax.lax.top_k(u, n_keep)[1]
    return jnp.zeros((n_pairs,), bool).at[kept].set(True)


@jax.jit
def _device_keep_mask(train_keys, drop_keys):
    E = train_keys.shape[0]
    pos = jnp.clip(jnp.searchsorted(train_keys, drop_keys), 0, max(E - 1, 0))
    hit = train_keys[pos] == drop_keys
    return jnp.ones((E,), jnp.int32).at[pos].min((~hit).astype(jnp.int32)) > 0


def view_spmm(base, view, x):
    """A_view @ x = masked base (bucketed gather path) + delta COO.

    ``view`` is an EdgeView (scale gathered per call) or a BakedView (scale
    already folded into its own base copy; ``base`` is ignored). Baked
    views apply the delta through the per-epoch chunked structures
    (:func:`chunked_delta_spmm` — scatter-free, 1.92x over the segment-sum
    at Gowalla-scale budgets); EdgeViews keep the segment-sum oracle."""
    if isinstance(view, BakedView):
        out = spmm_bucketed(view.base, x)
        if view.d_row.shape[0] == 0:  # drop-only views (delta_budget 0)
            return out
        if view.ck_fwd is not None:
            return out + chunked_delta_spmm(view.ck_fwd, view.ck_bwd, x)
    else:
        out = spmm_bucketed(base, x, edge_scale=view.base_scale)
        if view.d_row.shape[0] == 0:
            return out
    delta = (view.d_row, view.d_col, view.d_val, view.dt_row, view.dt_col, view.dt_val)
    return out + _delta_spmm(delta, x)


def view_propagate_mean(base, view: EdgeView, x0, n_layers: int):
    if n_layers <= 0:
        return x0

    def body(carry, _):
        x, acc = carry
        x = view_spmm(base, view, x)
        return (x, acc + x), None

    (_, acc), _ = jax.lax.scan(body, (x0, x0), None, length=n_layers)
    return acc / float(n_layers + 1)
