"""Attention-SpMM: jnp ELL path vs dense oracle; AttIGCN end-to-end.
(The Pallas variants were measured slower and removed — see the module
docstring of ops/attention_spmm.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inductive_recommendation_tpu.graph import sym_normalized_adjacency
from inductive_recommendation_tpu.ops import build_bucketed_spmm
from inductive_recommendation_tpu.ops.attention_spmm import attention_spmm


def _dense_attention_oracle(adj_dense, q, k_tab, v_tab, temperature):
    """Per-row softmax over nonzero columns, mean over heads."""
    n_rows, n_cols = adj_dense.shape
    h = q.shape[1]
    out = np.zeros((n_rows, v_tab.shape[1]))
    for r in range(n_rows):
        cols = np.nonzero(adj_dense[r])[0]
        if len(cols) == 0:
            continue
        scores = np.einsum("hd,chd->ch", q[r], k_tab[cols].reshape(len(cols), h, -1))
        smax = scores.max(axis=0, keepdims=True)
        ex = np.exp((scores - smax) / temperature)
        attn = (ex / ex.sum(axis=0, keepdims=True)).mean(axis=1)
        out[r] = attn @ v_tab[cols]
    return out


def test_attention_spmm_matches_dense(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=False)
    dense = np.zeros((n, n))
    np.add.at(dense, (row, col), val)

    h, dh, dv = 2, 8, 16
    q = rng.standard_normal((n, h, dh)).astype(np.float32)
    k_tab = rng.standard_normal((n, h * dh)).astype(np.float32)
    v_tab = rng.standard_normal((n, dv)).astype(np.float32)
    temperature = 3.0

    out = np.asarray(
        attention_spmm(mat, jnp.asarray(q), jnp.asarray(k_tab), jnp.asarray(v_tab), temperature)
    )
    oracle = _dense_attention_oracle(dense, q, k_tab, v_tab, temperature)
    np.testing.assert_allclose(out, oracle, rtol=1e-3, atol=1e-4)


def test_attention_spmm_fused_kv_matches_general(tiny_graph, rng):
    """The folded-query form (scores from the value gather, no key table —
    the measured 2.4x production path) equals the general kernel fed the
    materialized key table k = sg(v) @ Wk + bk, values AND gradients."""
    from inductive_recommendation_tpu.ops.attention_spmm import (
        attention_spmm_fused_kv,
    )

    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=False)
    h, dh, dv = 3, 8, 8
    q = jnp.asarray(rng.standard_normal((n, h, dh)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((dv, h * dh)).astype(np.float32))
    bk = jnp.asarray(rng.standard_normal((h * dh,)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, dv)).astype(np.float32))
    T = 5.0

    def general(q_, wk_, v_):
        k_ = jax.lax.stop_gradient(v_) @ wk_ + bk
        return attention_spmm(mat, q_, k_, v_, T)

    def fused(q_, wk_, v_):
        return attention_spmm_fused_kv(mat, q_, wk_, bk, v_, T)

    np.testing.assert_allclose(
        np.asarray(fused(q, wk, v)), np.asarray(general(q, wk, v)),
        rtol=1e-5, atol=1e-5,
    )
    g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(general(*a))), argnums=(0, 1, 2))(
        q, wk, v
    )
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a))), argnums=(0, 1, 2))(
        q, wk, v
    )
    for name, a, b in zip(("dq", "dwk", "dv"), g2, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_attention_spmm_grad_flows(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=False)
    q = jnp.asarray(rng.standard_normal((n, 1, 8)).astype(np.float32))
    k_tab = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    v_tab = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    def loss(v):
        return jnp.sum(attention_spmm(mat, q, k_tab, v, 2.0) ** 2)

    g = jax.grad(loss)(v_tab)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_att_igcn_end_to_end():
    from inductive_recommendation_tpu import get_dataset, get_model, get_trainer
    import os, tempfile

    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 40,
            "n_items": 30,
            "n_interactions": 500,
            "seed": 3,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 2,
        }
    )
    model = get_model(
        {
            "name": "AttIGCN",
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1,
            "n_heads": 2,
        },
        ds,
    )
    cwd = os.getcwd()
    os.chdir(tempfile.mkdtemp())
    try:
        trainer = get_trainer(
            {
                "name": "IGCNTrainer",
                "optimizer": "Adam",
                "lr": 1e-2,
                "l2_reg": 0.0,
                "aux_reg": 0.01,
                "n_epochs": 3,
                "batch_size": 128,
                "test_batch_size": 32,
                "topks": [1, 5, 10, 15, 20, 25],
                "val_interval": 1,
            },
            ds,
            model,
        )
        first = trainer.train_one_epoch()
        last = trainer.train_one_epoch()
        assert np.isfinite(first) and np.isfinite(last)
        _, m = trainer.eval("val")
        assert np.isfinite(m["NDCG"][20])
    finally:
        os.chdir(cwd)


def test_attention_grads_match_dense_oracle(tiny_graph, rng):
    """Gradients through the bucketed attention SpMM must equal autodiff
    through a dense masked-softmax oracle for dq, dk and dv."""
    import jax
    import jax.numpy as jnp
    from inductive_recommendation_tpu.ops import build_bucketed_spmm
    from inductive_recommendation_tpu.ops.attention_spmm import attention_spmm

    train_array, n_users, n_items = tiny_graph
    ta = np.asarray(train_array)
    vals = np.ones(len(ta), np.float32)
    mat = build_bucketed_spmm(
        ta[:, 0], ta[:, 1], vals, (n_users, n_items), symmetric=False
    )
    H, dh, dv = 2, 4, 6
    q = jnp.asarray(rng.standard_normal((n_users, H, dh)).astype(np.float32))
    k_tab = jnp.asarray(rng.standard_normal((n_items, H * dh)).astype(np.float32))
    v_tab = jnp.asarray(rng.standard_normal((n_items, dv)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n_users, dv)).astype(np.float32))
    T = 1.7

    adj = np.zeros((n_users, n_items), np.float32)
    adj[ta[:, 0], ta[:, 1]] = 1.0
    adj_d = jnp.asarray(adj)

    def loss_bucketed(q, k_tab, v_tab):
        return jnp.sum(attention_spmm(mat, q, k_tab, v_tab, T) * w)

    def loss_dense(q, k_tab, v_tab):
        keys = k_tab.reshape(n_items, H, dh)
        scores = jnp.einsum("rhd,chd->rch", q, keys)  # [n_u, n_i, h]
        scores = jnp.where(adj_d[:, :, None] > 0, scores, -jnp.inf)
        smax = jnp.max(scores, axis=1, keepdims=True)
        smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
        ex = jnp.exp((scores - smax) / T) * adj_d[:, :, None]
        attn = ex / jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-12)
        out = jnp.einsum("rc,cd->rd", attn.mean(-1), v_tab)
        return jnp.sum(out * w)

    gc = jax.grad(loss_bucketed, argnums=(0, 1, 2))(q, k_tab, v_tab)
    ga = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k_tab, v_tab)
    for name, a, b in zip("q k v".split(), gc, ga):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_fused_kv_bilinear_dv_slots_matches_autodiff(tiny_graph, rng):
    """The gather-only bilinear core (dv_slots route: d(v) as a transpose-
    layout application with the attention as edge values, d(attn) by
    re-gathering the value rows — benchmarks/attn_dv_probe.py's measured
    1.3x form) must agree with the XLA-autodiff aggregation on values AND
    every gradient."""
    from inductive_recommendation_tpu.ops.attention_spmm import (
        attention_spmm_fused_kv,
        build_dv_slot_tables,
    )

    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=False)
    slots = build_dv_slot_tables(mat)
    h, dh = 2, 8
    q = jnp.asarray(rng.standard_normal((n, h, dh)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((dh, h * dh)).astype(np.float32))
    bk = jnp.asarray(rng.standard_normal((h * dh,)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, dh)).astype(np.float32))
    T = 5.0

    def auto(q_, wk_, v_):
        return attention_spmm_fused_kv(mat, q_, wk_, bk, v_, T)

    def bilin(q_, wk_, v_):
        return attention_spmm_fused_kv(mat, q_, wk_, bk, v_, T, dv_slots=slots)

    np.testing.assert_allclose(
        np.asarray(bilin(q, wk, v)), np.asarray(auto(q, wk, v)),
        rtol=1e-5, atol=1e-6,
    )
    g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(auto(*a))), argnums=(0, 1, 2))(
        q, wk, v
    )
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(bilin(*a))), argnums=(0, 1, 2))(
        q, wk, v
    )
    for name, a, b in zip(("dq", "dwk", "dv"), g2, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )
