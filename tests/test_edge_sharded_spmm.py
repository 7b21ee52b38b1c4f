"""Edge-block-sharded SpMM (parallel/spmm.py) vs dense and single-device
oracles on the 8-device virtual CPU mesh: forward (both modes), gradients
through the collective pattern, edge_scale indirection, layer chaining."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inductive_recommendation_tpu.ops.bucketed_spmm import (
    build_bucketed_spmm,
    spmm_bucketed,
)
from inductive_recommendation_tpu.parallel import make_mesh
from inductive_recommendation_tpu.parallel.spmm import (
    build_edge_sharded_spmm,
    make_edge_sharded_propagation,
    make_edge_sharded_spmm,
    shard_operand,
)


def _random_coo(rng, n_rows, n_cols, nnz):
    row = rng.integers(0, n_rows, nnz)
    col = rng.integers(0, n_cols, nnz)
    # coalesce duplicates (layouts assume one entry per (r, c))
    key = row * n_cols + col
    _, keep = np.unique(key, return_index=True)
    row, col = row[keep], col[keep]
    val = rng.normal(size=len(row)).astype(np.float32)
    return row, col, val


def _dense(row, col, val, shape):
    A = np.zeros(shape, np.float32)
    A[row, col] = val
    return A


@pytest.mark.parametrize("mode", ["scatter", "replicated"])
@pytest.mark.parametrize("n_model", [1, 4, 8])
def test_forward_matches_dense(rng, mode, n_model):
    n_rows, n_cols, d = 45, 37, 8
    row, col, val = _random_coo(rng, n_rows, n_cols, 400)
    mesh = make_mesh(n_data=8 // n_model if n_model < 8 else 1, n_model=n_model)
    mat = build_edge_sharded_spmm(row, col, val, (n_rows, n_cols), n_model)
    fn = make_edge_sharded_spmm(mat, mesh, mode=mode)

    x = rng.normal(size=(n_cols, d)).astype(np.float32)
    out = np.asarray(fn(shard_operand(x, mat, mesh)))[:n_rows]
    expect = _dense(row, col, val, (n_rows, n_cols)) @ x
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["scatter", "replicated"])
def test_grad_matches_dense(rng, mode):
    n_rows, n_cols, d = 30, 30, 4
    row, col, val = _random_coo(rng, n_rows, n_cols, 250)
    mesh = make_mesh(n_data=2, n_model=4)
    mat = build_edge_sharded_spmm(row, col, val, (n_rows, n_cols), 4)
    fn = make_edge_sharded_spmm(mat, mesh, mode=mode)

    x = rng.normal(size=(mat.n_cols_pad, d)).astype(np.float32)
    w = rng.normal(size=(mat.n_rows_pad, d)).astype(np.float32)

    def loss(xx):
        return jnp.sum(fn(xx) * w)

    gx = np.asarray(jax.grad(loss)(shard_operand(x[:n_cols], mat, mesh)))
    A = _dense(row, col, val, (mat.n_rows_pad, mat.n_cols_pad))
    np.testing.assert_allclose(gx, A.T @ w, rtol=1e-5, atol=1e-5)


def test_edge_scale_matches_scaled_dense(rng):
    n_rows = n_cols = 26
    row, col, val = _random_coo(rng, n_rows, n_cols, 200)
    scale = rng.uniform(0.0, 2.0, len(val)).astype(np.float32)
    mesh = make_mesh(n_data=4, n_model=2)
    mat = build_edge_sharded_spmm(row, col, val, (n_rows, n_cols), 2)
    fn = make_edge_sharded_spmm(mat, mesh, mode="scatter")

    x = rng.normal(size=(n_cols, 6)).astype(np.float32)
    out = np.asarray(fn(shard_operand(x, mat, mesh), jnp.asarray(scale)))[:n_rows]
    expect = _dense(row, col, val * scale, (n_rows, n_cols)) @ x
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)

    # gradient with a scale vector flows through the same edge ids
    w = rng.normal(size=(mat.n_rows_pad, 6)).astype(np.float32)
    gx = np.asarray(
        jax.grad(lambda xx: jnp.sum(fn(xx, jnp.asarray(scale)) * w))(
            shard_operand(x, mat, mesh)
        )
    )
    A = _dense(row, col, val * scale, (mat.n_rows_pad, mat.n_cols_pad))
    np.testing.assert_allclose(gx, A.T @ w, rtol=1e-5, atol=1e-5)


def test_propagation_chain_matches_single_device(rng):
    """3-layer mean propagation, operand sharded end-to-end, equals the
    single-device bucketed path."""
    n = 40
    row, col, val = _random_coo(rng, n, n, 350)
    mesh = make_mesh(n_data=1, n_model=8)
    mat = build_edge_sharded_spmm(row, col, val, (n, n), 8)
    prop = make_edge_sharded_propagation(mat, mesh, n_layers=3)

    x = rng.normal(size=(n, 8)).astype(np.float32)
    out = np.asarray(prop(shard_operand(x, mat, mesh)))[:n]

    single = build_bucketed_spmm(row, col, val, (n, n))
    acc, h = jnp.asarray(x), jnp.asarray(x)
    for _ in range(3):
        h = spmm_bucketed(single, h)
        acc = acc + h
    np.testing.assert_allclose(out, np.asarray(acc / 4), rtol=1e-4, atol=1e-5)


def test_output_is_sharded(rng):
    n = 32
    row, col, val = _random_coo(rng, n, n, 200)
    mesh = make_mesh(n_data=1, n_model=8)
    mat = build_edge_sharded_spmm(row, col, val, (n, n), 8)
    fn = make_edge_sharded_spmm(mat, mesh, mode="scatter")
    out = fn(shard_operand(np.ones((n, 4), np.float32), mat, mesh))
    assert not out.sharding.is_fully_replicated
