"""Auxiliary-graph views as masked base edges + an injected-edge delta.

Every DOSE/SGL view graph is train-with-edges-removed and/or
train-with-edges-added. Instead of rebuilding a sparse container per epoch
(and propagating it through the slow segment-sum path), a view is:

    A_view = (A_train_raw ∘ keep_mask) * norm + A_delta * norm

- the base part rides the degree-bucketed gather-only SpMM of the RAW
  deduplicated train adjacency (built once, shared by every view of a
  model) with a per-edge ``scale`` vector = keep_mask x sym-normalization
  of the VIEW's degrees;
- the delta part (injected pairs not in train) is a fixed-budget padded COO
  whose backward is the pre-built transpose COO (gather + segment-sum, no
  XLA scatter).

Per-epoch regeneration writes new scale/delta arrays of FIXED shapes — no
retrace, no host set-algebra beyond one vectorized key membership, no COO
propagation over the full graph.

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


@jax.custom_vjp
def _delta_spmm(view: EdgeView, x):
    g = jnp.take(x, view.d_col, axis=0) * view.d_val[:, None]
    return jax.ops.segment_sum(
        g, view.d_row, num_segments=view.n_nodes, indices_are_sorted=True
    )


def _delta_fwd(view, x):
    return _delta_spmm(view, x), view


def _delta_bwd(view, g):
    # transpose product via the col-sorted copy: gather + segment-sum only
    gg = jnp.take(g, view.dt_row, axis=0) * view.dt_val[:, None]
    dx = jax.ops.segment_sum(
        gg, view.dt_col, num_segments=view.n_nodes, indices_are_sorted=True
    )
    return jax.tree_util.tree_map(jnp.zeros_like, view), dx


_delta_spmm.defvjp(_delta_fwd, _delta_bwd)


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


def view_spmm(base, view: EdgeView, x):
    """A_view @ x = masked base (bucketed gather path) + delta COO."""
    out = spmm_bucketed(base, x, edge_scale=view.base_scale)
    return out + _delta_spmm(view, x)


def view_propagate_mean(base, view: EdgeView, x0, n_layers: int):
    if n_layers <= 0:
        return x0

    def body(carry, _):
        x, acc = carry
        x = view_spmm(base, view, x)
        return (x, acc + x), None

    (_, acc), _ = jax.lax.scan(body, (x0, x0), None, length=n_layers)
    return acc / float(n_layers + 1)
