"""EdgeShardedTrainer: edge-block-sharded training from the product surface
(get_trainer(mesh_mode='edge') / main.py --mesh-mode edge) — same epoch /
early-stop / checkpoint loop, graph + table + adam moments sharded."""

import os

import jax
import numpy as np
import pytest

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer
from inductive_recommendation_tpu.parallel import make_mesh

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ds():
    return get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 48,
            "n_items": 40,
            "n_interactions": 650,
            "seed": 11,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )


def _tcfg(name, **kw):
    cfg = {
        "name": name,
        "optimizer": "Adam",
        "lr": 1e-2,
        "l2_reg": 1e-4,
        "n_epochs": 2,
        "batch_size": 64,
        "test_batch_size": 16,
        "topks": [5, 10],
        "val_interval": 1,
        "seed": 0,
        "max_patience": 50,
    }
    cfg.update(kw)
    return cfg


def test_edge_trainer_lightgcn_first_step_matches_single_device(ds):
    """Same (seed, counter) rng scheme -> the edge trainer's first-step loss
    equals the single-device BPRTrainer's (both sample the first split of
    fold_in(key(seed), 1))."""
    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = {"name": "LightGCN", "embedding_size": 16, "n_layers": 2, "table_align": 1}
    m1 = get_model(mcfg, ds)
    t1 = get_trainer(_tcfg("BPRTrainer"), ds, m1)
    m2 = get_model(mcfg, ds)
    t2 = get_trainer(_tcfg("BPRTrainer"), ds, m2, mesh=mesh, mesh_mode="edge")
    # identical initial tables (init_params uses the trainer seed both sides)
    p1, o1, l1 = t1._step(
        t1.params, t1.opt_state, m1.buffers, t1.sampler, t1._next_seed()
    )
    with mesh:
        p2, o2, l2 = t2._run_step(t2._next_seed())
    assert abs(float(l1) - float(l2)) < 1e-4, (float(l1), float(l2))


def test_edge_trainer_sgl_first_step_matches_single_device(ds):
    """SGL via get_trainer(mesh_mode='edge'): first-step loss equals the
    single-device SGLTrainer's (same seed/counter rng scheme, same
    construction-time drop views)."""
    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = {
        "name": "SGL",
        "embedding_size": 16,
        "n_layers": 2,
        "aug_rate": 0.5,
        "table_align": 1,
    }
    tkw = {"contrastive_reg": 0.05}
    m1 = get_model(mcfg, ds)
    t1 = get_trainer(_tcfg("SGLTrainer", **tkw), ds, m1)
    m2 = get_model(mcfg, ds)
    t2 = get_trainer(_tcfg("SGLTrainer", **tkw), ds, m2, mesh=mesh, mesh_mode="edge")
    p1, o1, l1 = t1._step(
        t1.params, t1.opt_state, m1.buffers, t1.sampler, t1._next_seed()
    )
    with mesh:
        p2, o2, l2 = t2._run_step(t2._next_seed())
    assert abs(float(l1) - float(l2)) < 2e-4, (float(l1), float(l2))


def test_edge_trainer_test_variant_first_step_matches_single_device(ds):
    """TEST's main adjacency is a static DROPPED graph — the edge layout must
    be built from the same dropped pair set, or the first-step losses
    diverge."""
    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = {
        "name": "TEST",
        "embedding_size": 16,
        "n_layers": 2,
        "dropout": 0.0,
        "feature_ratio": 1.0,
        "aug_num": 10,
        "aug_rate": 0.5,
        "table_align": 1,
    }
    tkw = {"aux_reg": 0.01, "contrastive_reg": 0.05}
    m1 = get_model(mcfg, ds)
    t1 = get_trainer(_tcfg("DOSEdropTrainer", **tkw), ds, m1)
    m2 = get_model(mcfg, ds)
    t2 = get_trainer(
        _tcfg("DOSEdropTrainer", **tkw), ds, m2, mesh=mesh, mesh_mode="edge"
    )
    p1, o1, l1 = t1._step(
        t1.params, t1.opt_state, m1.buffers, t1.sampler, t1.aux_sampler,
        t1._next_seed(),
    )
    with mesh:
        p2, o2, l2 = t2._run_step(t2._next_seed())
    assert abs(float(l1) - float(l2)) < 2e-4, (float(l1), float(l2))


def test_edge_trainer_att_igcn_first_step_matches_single_device(ds):
    """AttIGCN via get_trainer(mesh_mode='edge'): the sharded attention
    softmax + feat/adjacency layouts reproduce the single-device
    IGCNTrainer first-step loss."""
    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = {
        "name": "AttIGCN",
        "embedding_size": 16,
        "n_layers": 2,
        "dropout": 0.0,
        "n_heads": 2,
        "table_align": 1,
    }
    tkw = {"aux_reg": 0.01}
    m1 = get_model(mcfg, ds)
    t1 = get_trainer(_tcfg("IGCNTrainer", **tkw), ds, m1)
    m2 = get_model(mcfg, ds)
    t2 = get_trainer(
        _tcfg("IGCNTrainer", **tkw), ds, m2, mesh=mesh, mesh_mode="edge"
    )
    p1, o1, l1 = t1._step(
        t1.params, t1.opt_state, m1.buffers, t1.sampler, t1.aux_sampler,
        t1._next_seed(),
    )
    with mesh:
        p2, o2, l2 = t2._run_step(t2._next_seed())
    assert abs(float(l1) - float(l2)) < 2e-4, (float(l1), float(l2))


@pytest.mark.parametrize(
    "model_name,trainer_name,mkw,tkw",
    [
        ("LightGCN", "BPRTrainer", {}, {}),
        (
            "AttIGCN",
            "IGCNTrainer",
            {"dropout": 0.0, "n_heads": 2},
            {"aux_reg": 0.01},
        ),
        ("SGL", "SGLTrainer", {"aug_rate": 0.5}, {"contrastive_reg": 0.05}),
        ("HALF", "HALFTrainer", {"aug_rate": 0.5}, {"contrastive_reg": 0.05}),
        (
            "TEST",
            "DOSEdropTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "IGCN",
            "IGCNTrainer",
            {"dropout": 0.3, "feature_ratio": 0.8},
            {"aux_reg": 0.01},
        ),
        (
            "IMF",
            "IGCNTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0},
            {"aux_reg": 0.01},
        ),
        (
            "DOSE_aug",
            "DOSEaugTrainer",
            {"dropout": 0.3, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_drop2",
            "DOSEdropTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_aug_drop",
            "DOSEdropTrainer",
            {"dropout": 0.3, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "TEST2",
            "DOSEdropTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_test",
            "DOSEtestTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
    ],
)
def test_edge_trainer_full_loop(ds, tmp_path, model_name, trainer_name, mkw, tkw):
    """train() end-to-end under the edge mesh: epochs + per-epoch view
    regeneration + eval + best-checkpoint save/reload; checkpoints are in
    the MODEL layout (single-device interoperable)."""
    os.makedirs("checkpoints", exist_ok=True)
    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = dict(
        {"name": model_name, "embedding_size": 16, "n_layers": 2, "table_align": 1},
        **mkw,
    )
    model = get_model(mcfg, ds)
    trainer = get_trainer(
        _tcfg(trainer_name, **tkw), ds, model, mesh=mesh, mesh_mode="edge"
    )
    ndcg = trainer.train(verbose=False)
    assert np.isfinite(ndcg), ndcg
    # eval through the edge-sharded rep
    _, metrics = trainer.eval("val")
    assert np.isfinite(metrics["NDCG"][10])
    # the best checkpoint reloads into a SINGLE-DEVICE trainer (model layout)
    if trainer.save_path and os.path.exists(trainer.save_path):
        single = get_trainer(_tcfg(trainer_name, **tkw), ds, get_model(mcfg, ds))
        single._load_model(trainer.save_path)
        _, sm = single.eval("val")
        assert np.isfinite(sm["NDCG"][10])
        # same restored params -> same metrics as the edge-side reload
        trainer._load_model(trainer.save_path)
        _, em = trainer.eval("val")
        for k in (5, 10):
            assert em["NDCG"][k] == pytest.approx(sm["NDCG"][k], rel=1e-4), k


def test_edge_trainer_save_state_resume(ds, tmp_path):
    """Full-state resume keeps the edge layout and the DOSE view state."""
    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = {
        "name": "DOSE_aug",
        "embedding_size": 16,
        "n_layers": 2,
        "dropout": 0.0,
        "feature_ratio": 1.0,
        "aug_num": 8,
        "aug_rate": 0.5,
        "table_align": 1,
    }
    tkw = {"aux_reg": 0.01, "contrastive_reg": 0.05}

    t1 = get_trainer(
        _tcfg("DOSEaugTrainer", n_epochs=2, **tkw),
        ds,
        get_model(mcfg, ds),
        mesh=mesh,
        mesh_mode="edge",
    )
    t1.train_one_epoch()
    t1.epoch = 1
    path = str(tmp_path / "resume.ckpt")
    t1.save_state(path)
    l_ref = t1.train_one_epoch()

    t2 = get_trainer(
        _tcfg("DOSEaugTrainer", n_epochs=2, **tkw),
        ds,
        get_model(mcfg, ds),
        mesh=mesh,
        mesh_mode="edge",
    )
    t2.load_state(path)
    assert t2.epoch == 1
    l_resumed = t2.train_one_epoch()
    assert l_resumed == pytest.approx(l_ref, rel=1e-4), (l_resumed, l_ref)


def test_edge_trainer_rejects_unsupported(ds):
    mesh = make_mesh(n_data=1, n_model=8)
    model = get_model(
        {
            "name": "DOSE_aug2",  # aug-FEATURE-matrix path: single-device only
            "embedding_size": 8,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "aug_num": 8,
            "aug_rate": 0.5,
            "table_align": 1,
        },
        ds,
    )
    with pytest.raises(ValueError, match="not edge-shardable"):
        get_trainer(
            _tcfg("DOSEaugTrainer", aux_reg=0.01, contrastive_reg=0.05),
            ds,
            model,
            mesh=mesh,
            mesh_mode="edge",
        )
    mf = get_model({"name": "MF", "embedding_size": 8, "table_align": 1}, ds)
    with pytest.raises(ValueError, match="no edge-sharded step"):
        get_trainer(_tcfg("BPRTrainer"), ds, mf, mesh=mesh, mesh_mode="edge")
