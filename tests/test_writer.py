"""TensorBoard-style writer integration: tag scheme parity with
trainer.py:51-56 and the train-loop logging path."""

import pytest
import os

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer


pytestmark = pytest.mark.slow

class FakeWriter:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), step))


def test_writer_tags(tmp_path):
    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 30,
            "n_items": 25,
            "n_interactions": 300,
            "seed": 1,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    model = get_model({"name": "MF", "embedding_size": 8}, ds)
    trainer = get_trainer(
        {
            "name": "BPRTrainer",
            "optimizer": "Adam",
            "lr": 1e-2,
            "l2_reg": 1e-4,
            "n_epochs": 2,
            "batch_size": 64,
            "test_batch_size": 16,
            "topks": [1, 5, 10, 15, 20, 25],
            "val_interval": 1,
        },
        ds,
        model,
    )
    writer = FakeWriter()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        trainer.train(verbose=False, writer=writer)
    finally:
        os.chdir(cwd)
    tags = {t for t, _, _ in writer.scalars}
    # reference tag scheme: '{model}_{trainer}/{stage}_{metric}@{k}'
    assert "MF_BPRTrainer/train_loss" in tags
    assert "MF_BPRTrainer/validation_NDCG@20" in tags
    assert "MF_BPRTrainer/train_Recall@5" in tags
    # one scalar per epoch for the loss
    loss_steps = [s for t, _, s in writer.scalars if t == "MF_BPRTrainer/train_loss"]
    assert loss_steps == [0, 1]
