"""EdgeView engine: masked-base + delta view SpMM vs dense oracles built the
reference way (dedup pair set -> sym-normalized adjacency)."""

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.graph.build import (
    aug_union_edges,
    drop_difference_edges,
)
from inductive_recommendation_tpu.graph.views import (
    ViewEngine,
    view_propagate_mean,
    view_spmm,
)


def _dense_view(pairs, n_users, n_items):
    n = n_users + n_items
    A = np.zeros((n, n))
    for u, i in np.asarray(pairs):
        A[u, n_users + i] = 1.0
        A[n_users + i, u] = 1.0
    d = np.maximum(A.sum(1), 1.0) ** -0.5
    return d[:, None] * A * d[None, :]


def test_view_engine_oracles(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    n = n_users + n_items
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=64)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    # 1) random drop (keep 60% of pairs)
    keep = rng.random(len(eng.train_pairs)) < 0.6
    view = eng.make_view(keep_pair_mask=keep)
    dense = _dense_view(eng.train_pairs[keep], n_users, n_items)
    np.testing.assert_allclose(
        np.asarray(view_spmm(eng.base, view, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )

    # 2) set-difference drop of specific pairs
    drop = eng.train_pairs[rng.choice(len(eng.train_pairs), 20, replace=False)]
    mask = eng.keep_mask_from_drop_pairs(drop)
    view = eng.make_view(keep_pair_mask=mask)
    remaining = drop_difference_edges(train_array, drop)
    dense = _dense_view(remaining, n_users, n_items)
    np.testing.assert_allclose(
        np.asarray(view_spmm(eng.base, view, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )

    # 3) union with injected pairs (some overlapping train)
    inject = np.stack(
        [rng.integers(0, n_users, 30), rng.integers(0, n_items, 30)], axis=1
    )
    view = eng.make_view(add_pairs=inject)
    union = aug_union_edges(train_array, inject)
    dense = _dense_view(union, n_users, n_items)
    np.testing.assert_allclose(
        np.asarray(view_spmm(eng.base, view, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )

    # 4) propagation + gradient parity on the union view
    w = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    def loss(x):
        return jnp.sum(view_propagate_mean(eng.base, view, x, 2) * w)

    g = np.asarray(jax.grad(loss)(x))
    # dense oracle gradient
    A = dense
    x_np = np.asarray(x)
    # rep = (x + Ax + A^2x)/3 ; dL/dx = (I + A^T + (A^2)^T) w / 3
    gd = (np.asarray(w) + A.T @ np.asarray(w) + A.T @ (A.T @ np.asarray(w))) / 3.0
    np.testing.assert_allclose(g, gd, rtol=1e-3, atol=1e-4)


def test_view_budget_enforced(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=2)
    inject = np.array([[0, 0], [1, 1], [2, 2], [3, 3], [4, 4]])
    # most of these are likely not in train -> budget exceeded
    try:
        eng.make_view(add_pairs=inject)
    except ValueError as e:
        assert "budget" in str(e)
