"""Every entry of every config grid instantiates against a tiny dataset and
runs one training epoch (or eval for non-trainables) — catches config/model
constructor mismatches the name-resolution test cannot see."""

import os

import jax
import numpy as np
import pytest

from inductive_recommendation_tpu import configs, get_dataset, get_model, get_trainer
from inductive_recommendation_tpu.train.checkpoint import save_checkpoint


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def ds():
    return get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 40,
            "n_items": 30,
            "n_interactions": 500,
            "seed": 3,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )


def _entries():
    seen = set()
    for grid_name in ["gowalla", "yelp", "amazon", "alibaba", "ml"]:
        for i, (d, m, t) in enumerate(getattr(configs, f"get_{grid_name}_config")(None)):
            key = (m["name"], t["name"])
            if key in seen:
                continue
            seen.add(key)
            yield pytest.param(grid_name, i, id=f"{grid_name}-{m['name']}-{t['name']}")


@pytest.mark.parametrize("grid_name,index", list(_entries()))
def test_grid_entry_runs(ds, tmp_path, grid_name, index):
    dcfg, mcfg, tcfg = getattr(configs, f"get_{grid_name}_config")(None)[index]
    mcfg = dict(mcfg)
    tcfg = dict(tcfg, n_epochs=1, batch_size=64, test_batch_size=16, seed=0)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        if mcfg["name"] == "IDCF_LGCN":
            lgcn = get_model(
                {"name": "LightGCN", "embedding_size": mcfg["embedding_size"],
                 "n_layers": 3},
                ds,
            )
            save_checkpoint("lgcn.pth", lgcn.init_params(jax.random.key(0)))
        model = get_model(mcfg, ds)
        trainer = get_trainer(tcfg, ds, model)
        if not model.trainable:
            ndcg = trainer.train(verbose=False)
            assert np.isfinite(ndcg)
            return
        loss = trainer.train_one_epoch()
        assert np.isfinite(loss), (grid_name, index, mcfg["name"])
        _, metrics = trainer.eval("val")
        assert np.isfinite(metrics["NDCG"][20])
    finally:
        os.chdir(cwd)
