"""End-to-end: train tiny models on a synthetic dataset, assert learning
happens, checkpoints round-trip, and the eval/inductive protocols run."""

import os

import numpy as np
import pytest

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def tiny_dataset():
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


TOPKS = [1, 5, 10, 15, 20, 25]


def _trainer_config(name="BPRTrainer", **kw):
    cfg = {
        "name": name,
        "optimizer": "Adam",
        "lr": 1.0e-2,
        "l2_reg": 1.0e-4,
        "n_epochs": 15,
        "batch_size": 256,
        "test_batch_size": 32,
        "topks": TOPKS,
        "val_interval": 3,
        "seed": 0,
    }
    cfg.update(kw)
    return cfg


def _run(model_cfg, trainer_cfg, dataset, tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(model_cfg, dataset)
        trainer = get_trainer(trainer_cfg, dataset, model)
        _, metrics0 = trainer.eval("val")
        ndcg0 = metrics0["NDCG"][TOPKS[4]]
        best = trainer.train(verbose=False)
        return trainer, ndcg0, best
    finally:
        os.chdir(cwd)


def test_lightgcn_bpr_end_to_end(tiny_dataset, tmp_path):
    model_cfg = {"name": "LightGCN", "embedding_size": 32, "n_layers": 2}
    trainer, ndcg0, best = _run(model_cfg, _trainer_config(), tiny_dataset, tmp_path)
    assert best > ndcg0, f"no learning: init {ndcg0} best {best}"
    # checkpoint round-trip: best params reloaded and eval reproduces best
    _, metrics = trainer.eval("val")
    assert abs(metrics["NDCG"][TOPKS[4]] - best) < 1e-6
    # test + inductive protocols run
    results, _ = trainer.eval("test")
    assert "Recall" in results
    out = trainer.inductive_eval(
        n_old_users=tiny_dataset.n_users // 2,
        n_old_items=tiny_dataset.n_items // 2,
    )
    assert len(out) == 6


def test_mf_bpr_end_to_end(tiny_dataset, tmp_path):
    model_cfg = {"name": "MF", "embedding_size": 32}
    trainer, ndcg0, best = _run(model_cfg, _trainer_config(), tiny_dataset, tmp_path)
    assert best > ndcg0


def test_loss_decreases(tiny_dataset, tmp_path):
    model_cfg = {"name": "LightGCN", "embedding_size": 32, "n_layers": 2}
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(model_cfg, tiny_dataset)
        trainer = get_trainer(_trainer_config(), tiny_dataset, model)
        first = trainer.train_one_epoch()
        for _ in range(8):
            last = trainer.train_one_epoch()
        assert last < first
    finally:
        os.chdir(cwd)
