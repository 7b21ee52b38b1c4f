"""Trainer-loop parity switches (reference trainer.py:58-113 behaviors)."""

import numpy as np

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer


def _setup(**tkw):
    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 30,
            "n_items": 25,
            "n_interactions": 400,
            "seed": 5,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 2,
        }
    )
    model = get_model({"name": "MF", "embedding_size": 8}, ds)
    cfg = {
        "name": "BPRTrainer",
        "optimizer": "Adam",
        "lr": 1e-2,
        "l2_reg": 1e-4,
        "n_epochs": 2,
        "batch_size": 32,
        "test_batch_size": 16,
        "topks": [1, 5, 10],
        "val_interval": 1,
        "seed": 0,
    }
    cfg.update(tkw)
    return ds, get_trainer(cfg, ds, model)


def _count_train_evals(trainer):
    stages = []
    orig = trainer.eval

    def spy(stage, banned_items=None):
        stages.append(stage)
        return orig(stage, banned_items=banned_items)

    trainer.eval = spy
    trainer.train(verbose=False)
    return stages


def test_default_skips_train_split_eval():
    """Without a writer and with the switch off (default), the logging-only
    train-split eval is skipped (documented divergence from trainer.py:73)."""
    _, trainer = _setup()
    stages = _count_train_evals(trainer)
    assert stages.count("train") == 0
    assert stages.count("val") == 2


def test_eval_train_every_epoch_matches_reference():
    """eval_train_every_epoch=True restores the reference's unconditional
    per-epoch eval('train') (trainer.py:73), writer or not."""
    _, trainer = _setup(eval_train_every_epoch=True)
    stages = _count_train_evals(trainer)
    assert stages.count("train") == 2  # one per epoch
    assert stages.count("val") == 2
