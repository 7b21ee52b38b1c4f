"""Every classic model family trains (or evaluates) end-to-end on a tiny
synthetic dataset through the matching trainer."""

import os

import jax
import numpy as np
import pytest

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer
from inductive_recommendation_tpu.train.checkpoint import save_checkpoint

pytestmark = pytest.mark.slow

TOPKS = [1, 5, 10, 15, 20, 25]


@pytest.fixture(scope="module")
def ds():
    return get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 60,
            "n_items": 50,
            "n_interactions": 900,
            "seed": 11,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 3,
        }
    )


def _base_trainer_cfg(name, **kw):
    cfg = {
        "name": name,
        "optimizer": "Adam",
        "lr": 1.0e-2,
        "l2_reg": 1.0e-4,
        "n_epochs": 8,
        "batch_size": 256,
        "test_batch_size": 32,
        "topks": TOPKS,
        "val_interval": 2,
        "seed": 0,
    }
    cfg.update(kw)
    return cfg


def _train(model_cfg, trainer_cfg, ds, tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(model_cfg, ds)
        trainer = get_trainer(trainer_cfg, ds, model)
        _, m0 = trainer.eval("val")
        best = trainer.train(verbose=False)
        return trainer, m0["NDCG"][TOPKS[4]], best
    finally:
        os.chdir(cwd)


def test_ngcf(ds, tmp_path):
    cfg = {
        "name": "NGCF",
        "embedding_size": 16,
        "layer_sizes": [16, 16],
        "dropout": 0.1,
    }
    _, ndcg0, best = _train(cfg, _base_trainer_cfg("BPRTrainer"), ds, tmp_path)
    assert best > ndcg0


def test_imcgae(ds, tmp_path):
    # tiny synthetic data puts random init near the chance-level NDCG
    # ceiling, so assert optimization (loss) rather than ranking lift
    cfg = {"name": "IMCGAE", "embedding_size": 16, "n_layers": 2, "dropout": 0.3}
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(cfg, ds)
        trainer = get_trainer(_base_trainer_cfg("BPRTrainer"), ds, model)
        first = trainer.train_one_epoch()
        for _ in range(8):
            last = trainer.train_one_epoch()
        assert last < first
        _, m = trainer.eval("val")
        assert np.isfinite(m["NDCG"][TOPKS[4]])
    finally:
        os.chdir(cwd)


def test_itemknn_matches_reference_scoring(ds):
    model = get_model({"name": "ItemKNN", "k": 10}, ds)
    # numpy oracle per model.py:4065-4088
    n_u, n_i = ds.n_users, ds.n_items
    R = np.zeros((n_u, n_i), dtype=np.float32)
    for u, its in enumerate(ds.train_data):
        R[u, its] = 1.0
    deg = R.sum(axis=0)
    sim = np.zeros((n_i, n_i), dtype=np.float32)
    for item in range(n_i):
        inter = R.T @ R[:, item]
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = inter / (deg + deg[item] - inter)
        sims[np.isnan(sims)] = 0.0
        # same tie-breaking as lax.top_k (stable, lowest index first); the
        # reference's argsort()[-k:] differs only among exact ties
        topk = np.argsort(-sims, kind="stable")[:10]
        sim[item, topk] = sims[topk]
    oracle_scores = R @ sim

    state = model.make_scoring_state({})
    users = np.arange(n_u)
    got = np.asarray(model.score(state, users))
    # ties in top-k selection may differ; compare scores closely
    np.testing.assert_allclose(got, oracle_scores, rtol=1e-3, atol=1e-3)


def test_popularity_eval(ds):
    model = get_model({"name": "Popularity"}, ds)
    trainer = get_trainer(
        _base_trainer_cfg("BasicTrainer", n_epochs=0), ds, model
    )
    ndcg = trainer.train(verbose=False)
    assert np.isfinite(ndcg) and ndcg > 0


def test_multivae(ds, tmp_path):
    cfg = {"name": "MultiVAE", "layer_sizes": [32, 16], "dropout": 0.5}
    tcfg = _base_trainer_cfg("MLTrainer", kl_reg=0.2, batch_size=32)
    _, ndcg0, best = _train(cfg, tcfg, ds, tmp_path)
    assert best > ndcg0


def test_neumf_three_phase(ds, tmp_path):
    cfg = {"name": "NeuMF", "embedding_size": 8, "layer_sizes": [16, 16]}
    tcfg = _base_trainer_cfg(
        "BCETrainer",
        n_epochs=7,
        mf_pretrain_epochs=2,
        mlp_pretrain_epochs=2,
        max_patience=100,
        val_interval=1,
        batch_size=128,
    )
    trainer, ndcg0, best = _train(cfg, tcfg, ds, tmp_path)
    assert trainer.model.arch == "neumf"
    assert best > 0


def test_idcf_lgcn(ds, tmp_path):
    # pretrain a LightGCN table, save, then train IDCF on top (frozen)
    lgcn = get_model({"name": "LightGCN", "embedding_size": 16, "n_layers": 2}, ds)
    params = lgcn.init_params(jax.random.key(3))
    lgcn_path = str(tmp_path / "lgcn.ckpt")
    save_checkpoint(lgcn_path, params)

    cfg = {
        "name": "IDCF_LGCN",
        "embedding_size": 16,
        "n_layers": 2,
        "n_headers": 2,
        "n_samples": 10,
        "lgcn_path": lgcn_path,
    }
    tcfg = _base_trainer_cfg("IDCFTrainer", contrastive_reg=1e-3)
    trainer, ndcg0, best = _train(cfg, tcfg, ds, tmp_path)
    assert best > 0
    # frozen table untouched by training
    np.testing.assert_array_equal(
        np.asarray(trainer.model.buffers["frozen_embedding"]),
        np.asarray(params["embedding"]),
    )


def test_evaluator_tracks_neumf_arch_phase(ds):
    """Regression: the Evaluator's jit cache must key on NeuMF's arch phase —
    a stale gmf-phase trace silently scored phases 2/3 of BCETrainer."""
    model = get_model(
        {
            "name": "NeuMF",
            "embedding_size": 8,
            "layer_sizes": [16, 8],
            "neg_ratio": 2,
        },
        ds,
    )
    from inductive_recommendation_tpu.eval.evaluator import Evaluator

    params = model.init_params(jax.random.key(0))
    ev = Evaluator(ds, [5, 10], test_batch_size=16)
    model.arch = "gmf"
    _, m_gmf = ev.evaluate(model, params, "val")
    model.arch = "neumf"
    _, m_neumf = ev.evaluate(model, params, "val")
    fresh = Evaluator(ds, [5, 10], test_batch_size=16)
    _, m_fresh = fresh.evaluate(model, params, "val")
    assert m_neumf["NDCG"][10] == m_fresh["NDCG"][10]
    model.arch = "gmf"
    _, m_gmf2 = ev.evaluate(model, params, "val")
    assert m_gmf2["NDCG"][10] == m_gmf["NDCG"][10]


def test_ngcf_isolated_node_dropped_selfloop_grads_finite():
    """Regression (r04 bench loss=nan): an isolated node's row of A+I is
    just its self-loop; edge dropout can zero the whole row, making h
    exactly 0 — and a norm clamped OUTSIDE the sqrt still nan's the
    backward there (norm's VJP computes h/norm = 0/0 before the clamp's
    zero cotangent kills it). Zero-degree items are real at catalog scale.
    The normalization must clamp INSIDE the sqrt."""
    import types

    import jax
    import jax.numpy as jnp

    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train import losses as L

    # items 3 and 4 have NO interactions -> isolated nodes (self-loop only)
    train = np.array([[0, 0], [0, 1], [1, 0], [1, 2], [2, 1], [2, 2]])
    ds = types.SimpleNamespace(n_users=3, n_items=5, train_array=train)
    model = get_model(
        {"name": "NGCF", "embedding_size": 8, "layer_sizes": [8, 8],
         "dropout": 0.95, "table_align": 1},
        ds,
    )
    params = model.init_params(jax.random.key(0))

    def loss(p, rng):
        u, pr, nr, l2 = model.bpr_forward(
            p,
            jnp.array([0, 1]), jnp.array([0, 1]), jnp.array([2, 0]),
            rng=rng, training=True,
        )
        return L.bpr_loss(u, pr, nr) + 1e-3 * l2.mean()

    # p=0.95: over a few keys the isolated self-loops WILL be dropped
    for seed in range(6):
        val, grads = jax.jit(jax.value_and_grad(loss))(
            params, jax.random.key(seed)
        )
        assert np.isfinite(float(val)), seed
        assert all(
            np.isfinite(np.asarray(g)).all()
            for g in jax.tree_util.tree_leaves(grads)
        ), seed
