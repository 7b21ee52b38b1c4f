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


def _idcf_mcfg(ds, **kw):
    rng = np.random.default_rng(7)
    frozen = rng.standard_normal(
        (ds.n_users + ds.n_items, 16), dtype=np.float32
    ) * 0.1
    cfg = {
        "name": "IDCF_LGCN",
        "embedding_size": 16,
        "n_layers": 2,
        "n_headers": 2,
        "n_samples": 10,
        "pretrained_embedding": frozen,
        "table_align": 1,
    }
    cfg.update(kw)
    return cfg


_NGCF_MCFG = {
    "name": "NGCF",
    "embedding_size": 16,
    "layer_sizes": [16, 16],
    "dropout": 0.0,
    "table_align": 1,
}
_IMCGAE_MCFG = {
    "name": "IMCGAE",
    "embedding_size": 16,
    "n_layers": 2,
    "dropout": 0.0,
    "table_align": 1,
}


def _single_first_step_loss(ds, mcfg, trainer_name, tkw):
    m1 = get_model(dict(mcfg), ds)
    t1 = get_trainer(_tcfg(trainer_name, **tkw), ds, m1)
    return float(
        t1._step(
            t1.params, t1.opt_state, m1.buffers, t1.sampler, t1._next_seed()
        )[2]
    )


@pytest.fixture(scope="module")
def new_family_single_losses(ds):
    """Single-device first-step losses for NGCF / IMCGAE / IDCF — computed
    once, shared across the shard-count parametrizations."""
    return {
        "NGCF": _single_first_step_loss(ds, _NGCF_MCFG, "BPRTrainer", {}),
        "IMCGAE": _single_first_step_loss(ds, _IMCGAE_MCFG, "BPRTrainer", {}),
        "IDCF_LGCN": _single_first_step_loss(
            ds, _idcf_mcfg(ds), "IDCFTrainer", {"contrastive_reg": 1e-3}
        ),
    }


@pytest.mark.parametrize("n_shards", [1, 4, 8])
@pytest.mark.parametrize("family", ["NGCF", "IMCGAE", "IDCF_LGCN"])
def test_edge_trainer_new_family_first_step_matches_single_device(
    ds, new_family_single_losses, family, n_shards
):
    """NGCF (local gc/bi linears + leaky-relu + normalization between
    sharded SpMMs), IMCGAE (personal rows sharded, 3 shared rows
    replicated) and IDCF_LGCN (sharded frozen table + local attention
    heads; the rng path mirrors the model, so the sampled keys — and the
    loss, contrastive term included — match) via
    get_trainer(mesh_mode='edge'): first-step loss equals the single-device
    trainer's at every shard count."""
    if family == "NGCF":
        mcfg, tname, tkw = _NGCF_MCFG, "BPRTrainer", {}
    elif family == "IMCGAE":
        mcfg, tname, tkw = _IMCGAE_MCFG, "BPRTrainer", {}
    else:
        mcfg, tname, tkw = _idcf_mcfg(ds), "IDCFTrainer", {"contrastive_reg": 1e-3}
    mesh = make_mesh(n_data=8 // n_shards, n_model=n_shards)
    m2 = get_model(dict(mcfg), ds)
    t2 = get_trainer(_tcfg(tname, **tkw), ds, m2, mesh=mesh, mesh_mode="edge")
    with mesh:
        l2 = float(t2._run_step(t2._next_seed())[2])
    l1 = new_family_single_losses[family]
    assert abs(l1 - l2) < 2e-4, (family, l1, l2)


#: variants whose eval scoring + checkpoint machinery is code-identical to a
#: checked representative (the dose family shares ONE eval rep path,
#: parallel/step.py eval_rep; views never feed eval) — the expensive
#: single-device reload parity runs once per DISTINCT path instead:
#: LightGCN(bpr), SGL+HALF(sgl), NGCF, IMCGAE, IDCF, IGCN+IMF(igcn),
#: AttIGCN, DOSE_aug/DOSE_aug2/TEST(static dropped main)/DOSE_test(dose)
_RELOAD_PARITY_SKIP = {
    "DOSE_aug3", "DOSE_aug4", "DOSE_drop", "DOSE_drop2", "DOSE_drop3",
    "DOSE_aug_drop", "DOSE_aug_drop2", "DOSE_aug_drop3", "TEST2",
}
#: a 1-epoch train() is a FULL loop (train -> epoch-end regen -> eval ->
#: checkpoint -> reload); training ON regenerated views is covered exactly
#: by the dedicated post-update parity tests (aug2 above;
#: test_edge_sharded_spmm's initial-AND-post-update DOSE/SGL cases) — the
#: epoch->regen->epoch integration proof runs 2-epoch for one
#: representative of each DISTINCT regeneration path: DOSE_aug (view
#: re-bake + chunked delta), DOSE_aug2 (plus the aug-feat re-bake/delta
#: refresh) and SGL (random drop views, no param read)
_TWO_EPOCH = {"DOSE_aug", "DOSE_aug2", "SGL"}


@pytest.mark.parametrize(
    "model_name,trainer_name,mkw,tkw",
    [
        ("LightGCN", "BPRTrainer", {}, {}),
        ("NGCF", "BPRTrainer", {"layer_sizes": [16, 16], "dropout": 0.3}, {}),
        ("IMCGAE", "BPRTrainer", {"dropout": 0.3}, {}),
        ("IDCF_LGCN", "IDCFTrainer", {}, {"contrastive_reg": 1e-3}),
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
        # aug2 exercises the aug-FEATURE-matrix path end-to-end, with
        # feature dropout (the sharded base + hashed delta dropout)
        (
            "DOSE_aug2",
            "DOSEaugTrainer",
            {"dropout": 0.3, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        # feature_ratio < 1: the aug core maps are selected from the FIRST
        # real aug graph — exercises the deferred aug-feat layout activation
        (
            "DOSE_aug2",
            "DOSEaugTrainer",
            {"dropout": 0.0, "feature_ratio": 0.8, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_aug3",
            "DOSEaugTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_aug4",
            "DOSEaugTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5,
             "pai": 0.0},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_drop",
            "DOSEdropTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_drop2",
            "DOSEdropTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_drop3",
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
        # the two drop_adj-keyed routings (a distinct view-key path)
        (
            "DOSE_aug_drop2",
            "DOSEdropTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 6, "aug_rate": 0.5,
             "aug_ratio": 0.5},
            {"aux_reg": 0.01, "contrastive_reg": 0.05},
        ),
        (
            "DOSE_aug_drop3",
            "DOSEdropTrainer",
            {"dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10, "aug_rate": 0.5},
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
def test_edge_trainer_full_loop(
    ds, tmp_path, monkeypatch, model_name, trainer_name, mkw, tkw
):
    """train() end-to-end under the edge mesh: epochs + per-epoch view
    regeneration + eval + best-checkpoint save/reload; checkpoints are in
    the MODEL layout (single-device interoperable)."""
    monkeypatch.chdir(tmp_path)  # isolate checkpoints/ (xdist-safe)
    os.makedirs("checkpoints", exist_ok=True)
    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = dict(
        {"name": model_name, "embedding_size": 16, "n_layers": 2, "table_align": 1},
        **mkw,
    )
    if model_name == "IDCF_LGCN":
        mcfg = dict(_idcf_mcfg(ds), **mkw)
    model = get_model(mcfg, ds)
    n_epochs = 2 if model_name in _TWO_EPOCH else 1
    trainer = get_trainer(
        _tcfg(trainer_name, n_epochs=n_epochs, **tkw),
        ds, model, mesh=mesh, mesh_mode="edge",
    )
    ndcg = trainer.train(verbose=False)
    assert np.isfinite(ndcg), ndcg
    # eval through the edge-sharded rep
    _, metrics = trainer.eval("val")
    assert np.isfinite(metrics["NDCG"][10])
    if model_name in _RELOAD_PARITY_SKIP:
        return
    # the best checkpoint reloads into a SINGLE-DEVICE trainer (model
    # layout) and scores identically — the per-family eval-parity gate
    assert trainer.save_path and os.path.exists(trainer.save_path)
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


def test_edge_trainer_aug2_feature_ratio_resume_activates(ds, tmp_path):
    """DOSE_aug2 at feature_ratio<1: the aug-feat layout activates after the
    FIRST update_aug_adj (aug core maps selected then). A save_state after
    activation must resume into a FRESH trainer — whose layout is inactive
    at construction — with the maps restored from aux and the layout
    activated on load, reproducing the saved run's next-epoch loss."""
    mcfg = dict(_AUG2_MCFG, feature_ratio=0.8, dropout=0.0)
    mesh = make_mesh(n_data=1, n_model=8)
    t1 = get_trainer(
        _tcfg("DOSEaugTrainer", n_epochs=3, **_AUG2_TKW),
        ds, get_model(mcfg, ds), mesh=mesh, mesh_mode="edge",
    )
    assert not t1._aug_feat_active  # maps unknown until the first update
    t1.train_one_epoch()
    assert t1._aug_feat_active  # activated by _refresh_views
    t1.epoch = 1
    path = str(tmp_path / "aug2_resume.ckpt")
    t1.save_state(path)
    l_ref = t1.train_one_epoch()

    t2 = get_trainer(
        _tcfg("DOSEaugTrainer", n_epochs=3, **_AUG2_TKW),
        ds, get_model(mcfg, ds), mesh=mesh, mesh_mode="edge",
    )
    assert not t2._aug_feat_active
    t2.load_state(path)
    assert t2._aug_feat_active  # maps restored from aux -> layout activated
    l_resumed = t2.train_one_epoch()
    assert l_resumed == pytest.approx(l_ref, rel=1e-4), (l_resumed, l_ref)


def _grow_dataset(ds, n_new_users=5, n_new_items=4, seed=0):
    """ds + new users/items with edges into the old catalog, plus test data
    spanning old and new item ranges (for the six-slice protocol)."""
    from inductive_recommendation_tpu.data.dataset import BasicDataset

    new_ds = BasicDataset({"name": "BasicDataset"})
    new_ds.n_users = ds.n_users + n_new_users
    new_ds.n_items = ds.n_items + n_new_items
    rng = np.random.default_rng(seed)
    extra = []
    for nu in range(ds.n_users, new_ds.n_users):
        for i in rng.choice(ds.n_items, size=3, replace=False):
            extra.append([nu, int(i)])
    new_ds.train_data = [list(t) for t in ds.train_data] + [
        [] for _ in range(n_new_users)
    ]
    for u, i in extra:
        new_ds.train_data[u].append(i)
    new_ds.train_array = np.concatenate(
        [np.asarray(ds.train_array), np.asarray(extra)], axis=0
    )
    new_ds.val_data = [[] for _ in range(new_ds.n_users)]
    new_ds.test_data = [
        sorted(int(x) for x in rng.choice(new_ds.n_items, size=2, replace=False))
        for _ in range(new_ds.n_users)
    ]
    return new_ds


def test_edge_trainer_inductive_attach_matches_single_device(ds):
    """attach_dataset under edge mode: a direct model.attach_dataset (the
    single-device UX) is detected and the sharded layouts/evaluator rebuilt
    around the grown graph; the six-slice inductive protocol then matches
    the single-device attach path, and training continues on the grown
    graph with the SAME params/opt state."""
    from inductive_recommendation_tpu.eval.evaluator import Evaluator

    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = {
        "name": "IGCN",
        "embedding_size": 16,
        "n_layers": 2,
        "dropout": 0.0,
        "feature_ratio": 1.0,
        "table_align": 1,
    }
    tkw = {"aux_reg": 0.01}
    m1 = get_model(mcfg, ds)
    t1 = get_trainer(_tcfg("IGCNTrainer", **tkw), ds, m1)
    m2 = get_model(mcfg, ds)
    t2 = get_trainer(_tcfg("IGCNTrainer", **tkw), ds, m2, mesh=mesh, mesh_mode="edge")

    grown = _grow_dataset(ds)
    m1.attach_dataset(grown)
    ev1 = Evaluator(grown, t1.topks, 16)
    out1 = ev1.inductive_eval(m1, t1.params, ds.n_users, ds.n_items, verbose=False)

    m2.attach_dataset(grown)  # direct attach; the trainer auto-rebuilds
    out2 = t2.inductive_eval(ds.n_users, ds.n_items)
    for tag, mx in out1.items():
        for k in (5, 10):
            assert out2[tag]["NDCG"][k] == pytest.approx(
                mx["NDCG"][k], rel=1e-4, abs=1e-6
            ), (tag, k)

    # training continues on the grown graph (rebuilt sampler + layouts)
    loss = t2.train_one_epoch()
    assert np.isfinite(loss)


def test_edge_trainer_explicit_attach_dose_aug2(ds):
    """The explicit trainer API: attach_dataset on the aug-FEATURE-matrix
    variant rebuilds the aug-feat layout for the grown catalog (extended
    aug core maps) and keeps training."""
    mesh = make_mesh(n_data=1, n_model=8)
    t = get_trainer(
        _tcfg("DOSEaugTrainer", **_AUG2_TKW),
        ds,
        get_model(_AUG2_MCFG, ds),
        mesh=mesh,
        mesh_mode="edge",
    )
    t.train_one_epoch()
    t.attach_dataset(_grow_dataset(ds))
    loss = t.train_one_epoch()
    assert np.isfinite(loss)
    _, metrics = t.eval("test")
    assert np.isfinite(metrics["NDCG"][10])


def test_edge_trainer_rejects_unsupported(ds):
    mesh = make_mesh(n_data=1, n_model=8)
    mf = get_model({"name": "MF", "embedding_size": 8, "table_align": 1}, ds)
    with pytest.raises(ValueError, match="no edge-sharded step"):
        get_trainer(_tcfg("BPRTrainer"), ds, mf, mesh=mesh, mesh_mode="edge")


_AUG2_MCFG = {
    "name": "DOSE_aug2",
    "embedding_size": 16,
    "n_layers": 2,
    "dropout": 0.0,
    "feature_ratio": 1.0,
    "aug_num": 8,
    "aug_rate": 0.5,
    "table_align": 1,
}
_AUG2_TKW = {"aux_reg": 0.01, "contrastive_reg": 0.05}


@pytest.fixture(scope="module")
def aug2_single_losses(ds):
    """(first-step loss, post-update-step loss) from the single-device
    DOSEaugTrainer — computed ONCE and shared across the shard-count
    parametrizations (the single-device side is identical for every S)."""
    m1 = get_model(_AUG2_MCFG, ds)
    t1 = get_trainer(_tcfg("DOSEaugTrainer", **_AUG2_TKW), ds, m1)
    l_first = float(
        t1._step(
            t1.params, t1.opt_state, m1.buffers, t1.sampler, t1.aux_sampler,
            t1._next_seed(),
        )[2]
    )
    # fresh trainer for the post-update path (the step donates params)
    m1b = get_model(_AUG2_MCFG, ds)
    t1b = get_trainer(_tcfg("DOSEaugTrainer", **_AUG2_TKW), ds, m1b)
    m1b.feat_mat_anneal()
    m1b.update_aug_adj(t1b.params)
    l_post = float(
        t1b._step(
            t1b.params, t1b.opt_state, m1b.buffers, t1b.sampler,
            t1b.aux_sampler, t1b._next_seed(),
        )[2]
    )
    return l_first, l_post


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_edge_trainer_dose_aug2_matches_single_device(
    ds, aug2_single_losses, n_shards
):
    """DOSE_aug2 (the aug-FEATURE-matrix variant, reference model.py:831-1117)
    on the edge path: the first-step loss (initial aug feat = train-only
    matrix + all-zero delta) AND the post-feat_mat_anneal+update_aug_adj
    step loss (selection from the IDENTICAL initial params -> same aug
    pairs; injected entries flow through the fixed-budget sharded aug-feat
    delta) match the single-device DOSEaugTrainer."""
    l_first, l_post = aug2_single_losses
    mesh = make_mesh(n_data=8 // n_shards, n_model=n_shards)
    m2 = get_model(_AUG2_MCFG, ds)
    t2 = get_trainer(
        _tcfg("DOSEaugTrainer", **_AUG2_TKW), ds, m2, mesh=mesh, mesh_mode="edge"
    )
    with mesh:
        l2 = float(t2._run_step(t2._next_seed())[2])
    assert abs(l_first - l2) < 2e-4, (l_first, l2)

    # fresh edge trainer for the post-update comparison (donated params)
    m2b = get_model(_AUG2_MCFG, ds)
    t2b = get_trainer(
        _tcfg("DOSEaugTrainer", **_AUG2_TKW), ds, m2b, mesh=mesh, mesh_mode="edge"
    )
    m2b.feat_mat_anneal()
    m2b.update_aug_adj(t2b.params)
    t2b._refresh_views()
    with mesh:
        l2p = float(t2b._run_step(t2b._next_seed())[2])
    assert abs(l_post - l2p) < 2e-4, (l_post, l2p)


def test_edge_trainer_recommend_matches_single_layout(ds):
    """Round-4 serving gate: `EdgeShardedTrainer.recommend` routes through
    the item-sharded per-device-top-k + k-way merge (the trainer's
    evaluator now carries the edge mesh), and its output equals the
    single-layout retrieval over the SAME edge rep — and the trainer-level
    `recommend` surface exists on the single-device side too."""
    from inductive_recommendation_tpu.eval.evaluator import Evaluator

    mesh = make_mesh(n_data=1, n_model=8)
    mcfg = {"name": "IGCN", "embedding_size": 16, "n_layers": 2,
            "dropout": 0.0, "feature_ratio": 1, "table_align": 1}
    tkw = {"aux_reg": 0.01}
    t2 = get_trainer(
        _tcfg("IGCNTrainer", **tkw), ds, get_model(mcfg, ds),
        mesh=mesh, mesh_mode="edge",
    )
    assert t2.evaluator.mesh is mesh  # the mesh=None construction is gone
    r_mesh = t2.recommend("val")
    # same edge rep, single-layout retrieval (mesh=None evaluator)
    ev1 = Evaluator(ds, t2.topks, 16, mesh=None)
    r_single = ev1.recommend(t2._scoring, t2.params, "val")
    assert np.array_equal(r_mesh, r_single)
    # eval metrics are unchanged by the mesh-aware evaluator
    with t2.edge_mesh:
        _, em = t2.evaluator.evaluate(t2._scoring, t2.params, "val")
    _, sm = ev1.evaluate(t2._scoring, t2.params, "val")
    for k in (5, 10):
        assert em["NDCG"][k] == pytest.approx(sm["NDCG"][k], rel=1e-5), k

    # the single-device trainer surface: same params -> same recommendations
    t1 = get_trainer(_tcfg("IGCNTrainer", **tkw), ds, get_model(mcfg, ds))
    r1 = t1.recommend("val")
    assert r1.shape == r_mesh.shape


def test_reload_parity_skip_list_is_self_checking(ds):
    """_RELOAD_PARITY_SKIP exempts variants from the reload eval-parity gate
    on the grounds that they share the representative's eval path. Make the
    rationale MACHINE-CHECKED: every skipped variant's trainer must (a)
    score through _EdgeRepScoring over the SAME eval_rep code object as the
    checked representative (DOSE_aug — one def inside
    make_edge_sharded_dose_step), and (b) inherit EdgeShardedTrainer's
    checkpoint methods unchanged. A future variant-specific eval path or
    _save_model override changes the code object / method resolution and
    fails here — un-skipping itself."""
    from inductive_recommendation_tpu.train.edge_trainer import (
        EdgeShardedTrainer,
        _EdgeRepScoring,
    )

    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    tkw = {"aux_reg": 0.01, "contrastive_reg": 0.05}

    def build(name, **mkw):
        mcfg = dict(
            {
                "name": name,
                "embedding_size": 8,
                "n_layers": 1,
                "dropout": 0.0,
                "feature_ratio": 1.0,
                "aug_num": 6,
                "aug_rate": 0.5,
                "table_align": 1,
            },
            **mkw,
        )
        return get_trainer(
            _tcfg("DOSEdropTrainer", **tkw), ds, get_model(mcfg, ds),
            mesh=mesh, mesh_mode="edge",
        )

    rep_trainer = build("DOSE_aug")
    rep_code = rep_trainer._scoring._rep.__code__
    per_variant_mkw = {"DOSE_aug_drop2": {"aug_ratio": 0.5}}
    for name in sorted(_RELOAD_PARITY_SKIP):
        t = build(name, **per_variant_mkw.get(name, {}))
        assert isinstance(t._scoring, _EdgeRepScoring), name
        assert t._scoring._rep.__code__ is rep_code, (
            f"{name}'s eval path diverged from the representative's — "
            f"remove it from _RELOAD_PARITY_SKIP"
        )
        for meth in ("_save_model", "_load_model", "_to_model_params"):
            assert getattr(type(t), meth) is getattr(EdgeShardedTrainer, meth), (
                name, meth,
            )
