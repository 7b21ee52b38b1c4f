"""IGCN/IMF: inductive rep parity, annealing, aux trainer, checkpoint aux,
and the retrain-free inductive protocol."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer
from inductive_recommendation_tpu.data.dataset import BasicDataset

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


def _igcn_cfg(**kw):
    cfg = {
        "name": "IGCN",
        "embedding_size": 16,
        "n_layers": 2,
        "dropout": 0.3,
        "feature_ratio": 0.8,
    }
    cfg.update(kw)
    return cfg


def _dense_feat_oracle(dataset, user_map, item_map, alpha):
    """Dense numpy oracle of the annealed feature matrix
    (model.py:4160-4175 + 4127-4130)."""
    n_users, n_items = dataset.n_users, dataset.n_items
    user_dim = int((user_map >= 0).sum())
    item_dim = int((item_map >= 0).sum())
    feat = np.zeros((n_users + n_items, user_dim + item_dim + 2))
    for user, item in np.asarray(dataset.train_array):
        if item_map[item] >= 0:
            feat[user, user_dim + item_map[item]] += 1
        if user_map[user] >= 0:
            feat[n_users + item, user_map[user]] += 1
    feat[:n_users, user_dim + item_dim] += 1
    feat[n_users:, user_dim + item_dim + 1] += 1
    row_sum = feat.sum(axis=1)
    weights = row_sum ** ((alpha - 1.0) / 2.0 - 0.5)
    return feat * weights[:, None]


def test_inductive_rep_matches_dense_oracle(ds):
    model = get_model(_igcn_cfg(), ds)
    params = model.init_params(jax.random.key(0))
    rep = np.asarray(
        model.inductive_rep_layer(params, model.buffers, training=False)
    )
    feat = _dense_feat_oracle(ds, model.user_map, model.item_map, model.alpha)
    oracle = feat @ np.asarray(params["embedding"])
    np.testing.assert_allclose(rep, oracle, rtol=1e-4, atol=1e-4)

    # annealing changes alpha and the rep follows the new weights
    model.feat_mat_anneal()
    assert abs(model.alpha - 0.99) < 1e-9
    rep2 = np.asarray(
        model.inductive_rep_layer(params, model.buffers, training=False)
    )
    oracle2 = _dense_feat_oracle(ds, model.user_map, model.item_map, 0.99) @ np.asarray(
        params["embedding"]
    )
    np.testing.assert_allclose(rep2, oracle2, rtol=1e-4, atol=1e-4)


def test_core_selection_ratio(ds):
    model = get_model(_igcn_cfg(feature_ratio=0.5), ds)
    assert model.user_dim == int(ds.n_users * 0.5)
    assert model.item_dim == int(ds.n_items * 0.5)
    assert model.feat_n_cols == model.user_dim + model.item_dim + 2


def test_igcn_trains_and_checkpoints(ds, tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(_igcn_cfg(), ds)
        trainer = get_trainer(
            {
                "name": "IGCNTrainer",
                "optimizer": "Adam",
                "lr": 1.0e-2,
                "l2_reg": 0.0,
                "aux_reg": 0.01,
                "n_epochs": 12,
                "batch_size": 256,
                "test_batch_size": 32,
                "topks": TOPKS,
                "val_interval": 3,
            },
            ds,
            model,
        )
        _, m0 = trainer.eval("val")
        best = trainer.train(verbose=False)
        assert best > m0["NDCG"][TOPKS[4]]
        # annealing advanced once per epoch
        assert model.alpha < 1.0
        # checkpoint aux round-trip: perturb alpha, reload, rep restored
        alpha_trained = model.alpha
        model.alpha = 0.123
        model.buffers = dict(model.buffers, alpha=jnp.asarray(0.123))
        trainer._load_model(trainer.save_path)
        assert model.alpha != 0.123
        _, m1 = trainer.eval("val")
        assert abs(m1["NDCG"][TOPKS[4]] - best) < 1e-6
        del alpha_trained
    finally:
        os.chdir(cwd)


def test_imf_rep_has_no_propagation(ds):
    imf = get_model(
        {
            "name": "IMF",
            "embedding_size": 16,
            "n_layers": 0,
            "dropout": 0.1,
            "feature_ratio": 1.0,
        },
        ds,
    )
    params = imf.init_params(jax.random.key(0))
    rep = imf.get_rep(params, training=False)
    ind = imf.inductive_rep_layer(params, imf.buffers, training=False)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(ind))


def test_inductive_attach_new_dataset(ds):
    """Retrain-free cold start: extend the graph with new users/items; old
    users' reps must be computable and new nodes get template-based reps."""
    model = get_model(_igcn_cfg(feature_ratio=1.0), ds)
    params = model.init_params(jax.random.key(0))

    # new dataset: same old nodes + 5 new users & 4 new items with edges
    new_ds = BasicDataset({"name": "BasicDataset"})
    new_ds.n_users = ds.n_users + 5
    new_ds.n_items = ds.n_items + 4
    rng = np.random.default_rng(0)
    extra = []
    for nu in range(ds.n_users, new_ds.n_users):
        for i in rng.choice(ds.n_items, size=3, replace=False):
            extra.append([nu, int(i)])
    new_ds.train_data = [list(t) for t in ds.train_data] + [[] for _ in range(5)]
    for u, i in extra:
        new_ds.train_data[u].append(i)
    new_ds.train_array = np.concatenate(
        [np.asarray(ds.train_array), np.asarray(extra)], axis=0
    )
    new_ds.val_data = [[] for _ in range(new_ds.n_users)]
    new_ds.test_data = [[] for _ in range(new_ds.n_users)]

    model.attach_dataset(new_ds)
    rep = np.asarray(model.get_rep(params, training=False))
    assert rep.shape[0] == new_ds.n_users + new_ds.n_items
    # new users interacted with core items -> non-zero inductive reps
    new_user_rep = rep[ds.n_users : new_ds.n_users]
    assert np.abs(new_user_rep).sum() > 0
    assert np.isfinite(rep).all()


def test_attigcn_query_weights_are_alpha_zero(ds):
    """Regression: AttIGCN's query aggregation must use alpha=0 weights
    (row_sum^-1, model.py:4231-4232) — the baked layout is rebaked at THIS
    model's alpha, not IGCN.__init__'s alpha=1, and no extra scale is
    applied on top. Stays alpha=0 through feat_mat_anneal."""
    from inductive_recommendation_tpu.ops import spmm_bucketed

    model = get_model(
        {"name": "AttIGCN", "embedding_size": 16, "n_layers": 2, "dropout": 0.0,
         "feature_ratio": 1.0},
        ds,
    )
    emb = np.random.default_rng(0).normal(size=(model.feat_n_cols, 16)).astype(
        np.float32
    )
    out = np.asarray(spmm_bucketed(model.buffers["feat"], jnp.asarray(emb)))
    oracle = _dense_feat_oracle(ds, model.user_map, model.item_map, 0.0) @ emb
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)

    model.feat_mat_anneal()  # alpha stays 0 -> weights unchanged
    out2 = np.asarray(spmm_bucketed(model.buffers["feat"], jnp.asarray(emb)))
    np.testing.assert_allclose(out2, oracle, rtol=1e-4, atol=1e-4)
