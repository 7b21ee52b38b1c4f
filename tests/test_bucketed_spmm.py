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


def test_with_annealed_values_matches_scale_vector(rng):
    """Baked annealed values == the [nnz] edge_scale vector path, fwd + grad."""
    from inductive_recommendation_tpu.ops.bucketed_spmm import with_annealed_values

    n_rows, n_cols, d = 37, 23, 6
    row = rng.integers(0, n_rows, 300)
    col = rng.integers(0, n_cols, 300)
    key = row * n_cols + col
    _, keep = np.unique(key, return_index=True)
    row, col = row[keep], col[keep]
    val = rng.uniform(0.5, 2.0, len(row)).astype(np.float32)
    row_sum = rng.uniform(1.0, 30.0, n_rows).astype(np.float32)
    alpha = 0.87
    expo = (alpha - 1.0) / 2.0 - 0.5

    mat = build_bucketed_spmm(row, col, val, (n_rows, n_cols), symmetric=False)
    scale = jnp.asarray(np.power(row_sum[row], expo))
    x = jnp.asarray(rng.standard_normal((n_cols, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n_rows, d)).astype(np.float32))

    annealed = jax.jit(with_annealed_values)(mat, jnp.asarray(row_sum), alpha)
    out_a = spmm_bucketed(annealed, x)
    out_s = spmm_bucketed(mat, x, edge_scale=scale)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_s), rtol=1e-5)

    g_a = jax.grad(lambda xx: jnp.sum(spmm_bucketed(annealed, xx) * w))(x)
    g_s = jax.grad(lambda xx: jnp.sum(spmm_bucketed(mat, xx, edge_scale=scale) * w))(x)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_s), rtol=1e-5)


def test_spmm_bucketed_dropout_consistent_and_correct(rng):
    """In-layout eid-hash dropout: p=0 is exact; p>0 matches a dense oracle
    built from the SAME per-edge mask, forward AND backward."""
    from inductive_recommendation_tpu.ops.bucketed_spmm import (
        _uniform_from_eid,
        spmm_bucketed_dropout,
    )

    n, d, p = 31, 5, 0.4
    row = rng.integers(0, n, 260)
    col = rng.integers(0, n, 260)
    key = row * n + col
    _, keep = np.unique(key, return_index=True)
    row, col = row[keep], col[keep]
    val = rng.normal(size=len(row)).astype(np.float32)
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=False)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    k = jax.random.key(7)

    out0 = spmm_bucketed_dropout(mat, x, k, 0.0)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(spmm_bucketed(mat, x)), rtol=1e-5, atol=1e-6
    )

    # mask per edge id (eids are assigned in COO order by the builder)
    eids = jnp.arange(len(row), dtype=jnp.int32)
    u = np.asarray(_uniform_from_eid(jax.random.key_data(k), eids))
    mask = (u >= p) / (1.0 - p)
    A = np.zeros((n, n), np.float32)
    A[row, col] = val * mask.astype(np.float32)

    out = jax.jit(spmm_bucketed_dropout)(mat, x, k, p)
    np.testing.assert_allclose(np.asarray(out), A @ np.asarray(x), rtol=1e-4, atol=1e-5)
    assert 0.0 < u.min() and u.max() < 1.0 and 0.2 < (u >= p).mean() < 0.9

    g = jax.grad(lambda xx: jnp.sum(spmm_bucketed_dropout(mat, xx, k, p) * w))(x)
    np.testing.assert_allclose(np.asarray(g), A.T @ np.asarray(w), rtol=1e-4, atol=1e-5)


def test_bucket_merge_respects_padding_budget(rng):
    """The upward bucket merge must stay within its extra-gather budget
    (max(1% nnz, 4096)) on a power-law-ish degree distribution, and the
    merged layout must still reproduce the dense product exactly."""
    n_rows, n_cols = 600, 400
    # zipf-ish degrees: many degree-1 rows, a heavy tail
    degs = np.minimum(rng.zipf(1.5, size=n_rows), n_cols)
    row = np.repeat(np.arange(n_rows), degs)
    col = np.concatenate(
        [rng.choice(n_cols, size=d, replace=False) for d in degs]
    )
    val = rng.random(len(row)).astype(np.float32) + 0.1
    nnz = len(row)

    mat = build_bucketed_spmm(row, col, val, (n_rows, n_cols))
    gathers = sum(b.idx.size for b in mat.fwd.buckets)
    budget = max(0.01 * nnz, 4096.0)
    # padded gathers = nnz + (ladder padding, small) + (merge padding <= budget)
    assert gathers <= nnz * 1.05 + budget
    # merged layouts stay compact at test scale (compile-time guard)
    assert len(mat.fwd.buckets) <= 12

    dense = np.zeros((n_rows, n_cols))
    np.add.at(dense, (row, col), val)
    x = rng.standard_normal((n_cols, 8)).astype(np.float32)
    out = np.asarray(spmm_bucketed(mat, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)
