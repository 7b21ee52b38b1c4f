"""Evaluator with a mesh: the fused device-metrics pipeline runs with user
batches sharded across all devices and matches single-device metrics for
EVERY model class — rep-matrix models AND the ones whose scoring state is
not a rep matrix (MultiVAE, NeuMF, ItemKNN): no silent single-device
fallback, no host metrics pass (reference semantics: trainer.py:146-210)."""

import numpy as np

import jax
import pytest

from inductive_recommendation_tpu import get_dataset, get_model
from inductive_recommendation_tpu.eval.evaluator import Evaluator
from inductive_recommendation_tpu.parallel import make_mesh

TOPKS = [1, 5, 10, 15, 20, 25]


@pytest.fixture(scope="module")
def ds():
    return get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 50,
            "n_items": 44,
            "n_interactions": 700,
            "seed": 9,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 3,
        }
    )


def _assert_metrics_match(m1, m8, tag):
    for metric in m1:
        for k, v in m1[metric].items():
            # same program, different reduction partitioning: f32 partial
            # sums may reassociate
            assert abs(v - m8[metric][k]) < 1e-6, (tag, metric, k)


def test_evaluator_mesh_matches_single_device(ds):
    model = get_model({"name": "LightGCN", "embedding_size": 16, "n_layers": 2}, ds)
    params = model.init_params(jax.random.key(0))

    ev1 = Evaluator(ds, TOPKS, test_batch_size=16)
    ev8 = Evaluator(ds, TOPKS, test_batch_size=16, mesh=make_mesh(n_data=2, n_model=4))
    for stage in ("val", "test"):
        _, m1 = ev1.evaluate(model, params, stage)
        _, m8 = ev8.evaluate(model, params, stage)
        _assert_metrics_match(m1, m8, stage)

    # banned items (the inductive protocol's item slicing) under the mesh
    banned = np.arange(0, ds.n_items, 3)
    _, m1 = ev1.evaluate(model, params, "test", banned_items=banned)
    _, m8 = ev8.evaluate(model, params, "test", banned_items=banned)
    _assert_metrics_match(m1, m8, "banned")


# one config per scoring-state shape: rep matrix (LightGCN/IGCN/DOSE), two
# tables (MF), autoencoder over profiles (MultiVAE), per-pair MLP towers
# (NeuMF), similarity-profile (ItemKNN), degree prior (Popularity)
MODEL_CFGS = [
    {"name": "MF", "embedding_size": 16},
    {"name": "IGCN", "embedding_size": 16, "n_layers": 2, "dropout": 0.0,
     "feature_ratio": 1.0},
    {"name": "DOSE_aug", "embedding_size": 16, "n_layers": 2, "dropout": 0.0,
     "feature_ratio": 1.0, "aug_num": 30, "aug_rate": 0.5},
    {"name": "MultiVAE", "layer_sizes": [32, 16], "dropout": 0.5},
    {"name": "NeuMF", "embedding_size": 8, "layer_sizes": [16, 16, 8]},
    {"name": "ItemKNN", "k": 10},
    {"name": "Popularity"},
]


@pytest.mark.slow
@pytest.mark.parametrize("mcfg", MODEL_CFGS, ids=[c["name"] for c in MODEL_CFGS])
def test_evaluator_mesh_every_model_class(ds, mcfg):
    model = get_model(dict(mcfg), ds)
    params = (
        model.init_params(jax.random.key(1)) if model.trainable else {}
    )
    ev1 = Evaluator(ds, TOPKS, test_batch_size=16)
    ev8 = Evaluator(ds, TOPKS, test_batch_size=16, mesh=make_mesh(n_data=2, n_model=4))
    _, m1 = ev1.evaluate(model, params, "val")
    _, m8 = ev8.evaluate(model, params, "val")
    _assert_metrics_match(m1, m8, mcfg["name"])


@pytest.mark.slow
@pytest.mark.parametrize("mcfg", MODEL_CFGS, ids=[c["name"] for c in MODEL_CFGS])
def test_recommend_mesh_every_model_class(ds, mcfg):
    """Sharded serving is model-agnostic (reference trainer.py:146-172):
    mesh recommend == single-device recommend for EVERY model class — the
    rep-matrix models through item-sharded scoring + k-way merge, the rest
    through the user-batch-sharded masked-top-k path (no fallback that
    changes results)."""
    model = get_model(dict(mcfg), ds)
    params = model.init_params(jax.random.key(1)) if model.trainable else {}
    ev1 = Evaluator(ds, TOPKS, test_batch_size=16)
    ev8 = Evaluator(ds, TOPKS, test_batch_size=16, mesh=make_mesh(n_data=2, n_model=4))
    for stage in ("test", "train"):  # exclusion path + plain path
        r1 = ev1.recommend(model, params, stage)
        r8 = ev8.recommend(model, params, stage)
        np.testing.assert_array_equal(
            r1, r8, err_msg=f"{mcfg['name']}/{stage}"
        )


def test_evaluator_mesh_batch_divisibility_error(ds):
    with pytest.raises(ValueError, match="mesh"):
        Evaluator(ds, TOPKS, test_batch_size=15, mesh=make_mesh(n_data=2, n_model=4))
