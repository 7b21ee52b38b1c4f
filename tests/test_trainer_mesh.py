"""Mesh-integrated trainers: a grid entry trains on an 8-virtual-device
('data', 'model') mesh FROM THE TRAINER/CLI SURFACE with the same epoch /
early-stop / checkpoint loop, and same-seed losses equal the single-device
run (collectives are exact; fp reduction order aside).

This is the product surface for SURVEY §2.7's data parallelism + row-sharded
tables: get_trainer(..., mesh=...) / `python main.py --mesh N_DATA,N_MODEL`.
"""

import jax
import numpy as np
import pytest

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer
from inductive_recommendation_tpu.parallel import make_mesh

pytestmark = pytest.mark.slow

TOPKS = [1, 5, 10, 15, 20, 25]


@pytest.fixture(scope="module")
def ds():
    return get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 50,
            "n_items": 40,
            "n_interactions": 700,
            "seed": 11,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 3,
        }
    )


def _tcfg(name, **kw):
    cfg = {
        "name": name,
        "optimizer": "Adam",
        "lr": 1.0e-2,
        "l2_reg": 1.0e-4,
        "n_epochs": 2,
        "batch_size": 64,
        "test_batch_size": 16,
        "topks": TOPKS,
        "val_interval": 1,
        "seed": 3,
    }
    cfg.update(kw)
    return cfg


def _mcfg(name, **kw):
    cfg = {
        "name": name,
        "embedding_size": 16,
        "n_layers": 2,
        # dropout stays ON: its draws are pure functions of the folded step
        # keys / edge-id hashes, identical under any sharding — proving the
        # mesh step is trajectory-identical, not just loss-identical
        "dropout": 0.3,
        "feature_ratio": 1.0,
        "aug_num": 30,
        "aug_rate": 0.5,
        "table_align": 8,  # identical init shapes on both sides
    }
    cfg.update(kw)
    return cfg


def _epoch_losses(trainer, n_epochs):
    losses = []
    for _ in range(n_epochs):
        losses.append(trainer.train_one_epoch())
    return losses


def _assert_tables_sharded(trainer):
    leaves = jax.tree_util.tree_leaves(trainer.params)
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in leaves
        if hasattr(leaf, "sharding") and np.ndim(leaf) == 2
    ), "no table actually sharded over 'model'"


CASES = [
    ("LightGCN", "BPRTrainer", {}),
    ("IGCN", "IGCNTrainer", {"aux_reg": 0.01}),
    ("DOSE_aug", "DOSEaugTrainer", {"aux_reg": 0.01, "contrastive_reg": 1e-3}),
]


@pytest.mark.parametrize("model_name,trainer_name,extra", CASES)
def test_mesh_trainer_loss_parity(ds, model_name, trainer_name, extra):
    mesh = make_mesh(n_data=2, n_model=4)

    t_single = get_trainer(
        _tcfg(trainer_name, **extra), ds, get_model(_mcfg(model_name), ds)
    )
    t_mesh = get_trainer(
        _tcfg(trainer_name, **extra),
        ds,
        get_model(_mcfg(model_name), ds),
        mesh=mesh,
    )
    _assert_tables_sharded(t_mesh)

    l_single = _epoch_losses(t_single, 2)
    l_mesh = _epoch_losses(t_mesh, 2)
    np.testing.assert_allclose(l_single, l_mesh, rtol=0, atol=2e-5)

    # the trained tables match too (trajectory parity, not just loss)
    p_s = jax.device_get(t_single.params)
    p_m = jax.device_get(t_mesh.params)
    for k in p_s:
        np.testing.assert_allclose(p_s[k], p_m[k], rtol=0, atol=2e-4)

    # evaluation through the mesh evaluator agrees with single-device
    _, m_single = t_single.eval("val")
    _, m_mesh = t_mesh.eval("val")
    for metric in ("Precision", "Recall", "NDCG"):
        for k in TOPKS:
            assert m_single[metric][k] == pytest.approx(
                m_mesh[metric][k], abs=1e-6
            ), (metric, k)


def test_mesh_trainer_full_train_loop(ds):
    """The full train() loop — early stopping, best-checkpoint save/reload —
    runs under a mesh and returns a finite best NDCG."""
    mesh = make_mesh(n_data=2, n_model=4)
    trainer = get_trainer(
        _tcfg("BPRTrainer", n_epochs=2),
        ds,
        get_model(_mcfg("LightGCN"), ds),
        mesh=mesh,
    )
    best = trainer.train(verbose=False)
    assert np.isfinite(best) and best >= 0
    # reloaded-best params stayed sharded
    _assert_tables_sharded(trainer)


def test_mesh_batch_divisibility_error(ds):
    mesh = make_mesh(n_data=2, n_model=4)
    with pytest.raises(ValueError, match="data"):
        get_trainer(
            _tcfg("BPRTrainer", batch_size=63),
            ds,
            get_model(_mcfg("LightGCN"), ds),
            mesh=mesh,
        )


def test_cli_mesh_smoke(ds, tmp_path, monkeypatch):
    """`main.py --mesh 2,4` runs a grid entry end to end on the mesh."""
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "data"
    out.mkdir()
    ds.output_dataset(str(out))

    import main as cli

    # patch the grid to a 1-epoch LightGCN over the tmp dataset
    def tiny_grid(device):
        dataset_config = {
            "name": "ProcessedDataset",
            "path": str(out),
            "device": device,
        }
        model_config = {
            "name": "LightGCN",
            "embedding_size": 16,
            "n_layers": 2,
        }
        trainer_config = _tcfg("BPRTrainer", n_epochs=1)
        return [(dataset_config, model_config, trainer_config)]

    from inductive_recommendation_tpu import configs

    monkeypatch.setattr(configs, "get_gowalla_config", tiny_grid)
    best = cli.main(["--grid", "gowalla", "--index", "0", "--mesh", "2,4"])
    assert np.isfinite(best)
