"""Bucketed (gather-only) SpMM parity vs dense oracle — values and grads."""

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.graph import sym_normalized_adjacency
from inductive_recommendation_tpu.ops import build_bucketed_spmm, spmm_bucketed


def _setup(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    dense = np.zeros((n, n), dtype=np.float64)
    np.add.at(dense, (row, col), val)
    return row, col, val, n, dense


def test_bucketed_spmm_matches_dense(tiny_graph, rng):
    row, col, val, n, dense = _setup(tiny_graph)
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=True)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    out = np.asarray(spmm_bucketed(mat, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_bucketed_spmm_rectangular(tiny_graph, rng):
    # non-symmetric: user->item rectangle
    train_array, n_users, n_items = tiny_graph
    ta = np.asarray(train_array)
    vals = rng.standard_normal(len(ta)).astype(np.float32)
    mat = build_bucketed_spmm(ta[:, 0], ta[:, 1], vals, (n_users, n_items))
    dense = np.zeros((n_users, n_items))
    np.add.at(dense, (ta[:, 0], ta[:, 1]), vals)
    x = rng.standard_normal((n_items, 8)).astype(np.float32)
    out = np.asarray(spmm_bucketed(mat, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_bucketed_spmm_grad_matches_dense(tiny_graph, rng):
    row, col, val, n, dense = _setup(tiny_graph)
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=True)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    g_bucketed = jax.grad(lambda x: jnp.sum(spmm_bucketed(mat, x) * w))(x)
    g_dense = np.asarray(dense).T @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(g_bucketed), g_dense, rtol=1e-4, atol=1e-4)


def test_bucketed_spmm_edge_scale_and_grad(tiny_graph, rng):
    """Edge-space scale must apply identically in forward and transpose
    (dropout-gradient correctness)."""
    row, col, val, n, dense = _setup(tiny_graph)
    # explicit transpose layout: required whenever edge_scale is used
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=False)
    scale = rng.random(len(row)).astype(np.float32)
    scaled_dense = np.zeros_like(dense)
    np.add.at(scaled_dense, (row, col), val * scale)

    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    s = jnp.asarray(scale)

    out = np.asarray(spmm_bucketed(mat, x, edge_scale=s))
    np.testing.assert_allclose(out, scaled_dense @ np.asarray(x), rtol=1e-4, atol=1e-4)

    g = jax.grad(lambda x: jnp.sum(spmm_bucketed(mat, x, edge_scale=s) * w))(x)
    g_dense = scaled_dense.T @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(g), g_dense, rtol=1e-4, atol=1e-4)


def test_bucketed_spmm_rect_grad(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    ta = np.asarray(train_array)
    vals = rng.standard_normal(len(ta)).astype(np.float32)
    mat = build_bucketed_spmm(ta[:, 0], ta[:, 1], vals, (n_users, n_items))
    dense = np.zeros((n_users, n_items))
    np.add.at(dense, (ta[:, 0], ta[:, 1]), vals)
    x = jnp.asarray(rng.standard_normal((n_items, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n_users, 8)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(spmm_bucketed(mat, x) * w))(x)
    np.testing.assert_allclose(
        np.asarray(g), dense.T @ np.asarray(w), rtol=1e-4, atol=1e-4
    )
