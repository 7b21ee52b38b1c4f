"""Trainer full-state resume; SoL accounting; NaN audit utility."""

import pytest
import os

import numpy as np

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer
from inductive_recommendation_tpu.ops.sol import spmm_cost
from inductive_recommendation_tpu.utils.profiling import StepTimer, nan_check

pytestmark = pytest.mark.slow

TOPKS = [1, 5, 10, 15, 20, 25]


def test_trainer_save_load_state(tmp_path):
    ds = get_dataset(
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
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        def make():
            model = get_model(
                {
                    "name": "IGCN",
                    "embedding_size": 16,
                    "n_layers": 2,
                    "dropout": 0.1,
                    "feature_ratio": 1,
                },
                ds,
            )
            return get_trainer(
                {
                    "name": "IGCNTrainer",
                    "optimizer": "Adam",
                    "lr": 1e-2,
                    "l2_reg": 0.0,
                    "aux_reg": 0.01,
                    "n_epochs": 10,
                    "batch_size": 128,
                    "test_batch_size": 32,
                    "topks": TOPKS,
                    "val_interval": 1,
                    "seed": 0,
                },
                ds,
                model,
            )

        t1 = make()
        for _ in range(3):
            t1.train_one_epoch()
        t1.epoch = 3
        t1.best_ndcg = 0.42
        t1.patience = 7  # mid-losing-streak budget
        t1.save_state("state.ckpt")
        loss_next_a = t1.train_one_epoch()

        t2 = make()
        t2.load_state("state.ckpt")
        assert t2.epoch == 3 and abs(t2.best_ndcg - 0.42) < 1e-9
        assert t2._step_counter == t1._step_counter - t1.steps_per_epoch
        assert abs(t2.model.alpha - 0.99**3) < 1e-9
        # the early-stop budget resumes exactly: a reset-to-max patience
        # would early-stop later than the uninterrupted run
        assert t2.patience == t1.patience == 7
        loss_next_b = t2.train_one_epoch()
        # identical rng counters + identical state => identical next epoch
        assert abs(loss_next_a - loss_next_b) < 1e-5
    finally:
        os.chdir(cwd)


def test_spmm_cost_report(tiny_graph):
    from inductive_recommendation_tpu.graph import sym_normalized_adjacency
    from inductive_recommendation_tpu.ops import build_bucketed_spmm

    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=True)
    cost = spmm_cost(mat, 64)
    assert cost.nnz == len(row)
    assert cost.padded_nnz >= cost.nnz
    rep = cost.report(1e-3)
    assert 0 < rep["pct_sol_sequential"] < 100000
    assert rep["measured_ms"] == 1.0


def test_topk_gather_alltoall_cost_models():
    from inductive_recommendation_tpu.ops.sol import (
        AllToAllCost,
        GatherCost,
        TopkCost,
    )

    # top-k floor: one HBM read of the score matrix
    tc = TopkCost(rows=512, n=40960, k=100)
    read_s = 512 * 40960 * 4 / 819e9
    assert tc.sol_seconds() >= read_s
    assert 0 < tc.report(8e-3)["pct_sol"] < 100

    # gather: small-row gathers are transaction-bound, huge rows stream-bound
    small = GatherCost(n_rows=1_850_000, d=64)
    assert small.sol_seconds() == 1_850_000 / 366e6  # transaction floor
    big = GatherCost(n_rows=1000, d=1 << 20)
    assert big.sol_seconds() == 1000 * (1 << 20) * 4 / 819e9  # stream floor

    # all-to-all: zero cost on one device, (n-1)/n scaling beyond
    assert AllToAllCost(bytes_per_device=1 << 20, n_devices=1).sol_seconds() == 0.0
    c4 = AllToAllCost(bytes_per_device=1 << 20, n_devices=4)
    c8 = AllToAllCost(bytes_per_device=1 << 20, n_devices=8)
    assert 0 < c4.sol_seconds() < c8.sol_seconds()
    assert c8.report(1e-3)["pct_sol"] > 0


def test_nan_check_and_timer():
    tree = {"a": np.ones(3), "b": {"c": np.array([1.0, np.nan])}}
    bad = nan_check(tree)
    assert len(bad) == 1 and "c" in bad[0]
    timer = StepTimer()
    timer.start()
    timer.stop(np.ones(2))
    assert timer.mean_ms >= 0


def test_restore_like_long_lists_not_permuted(tmp_path):
    """Regression: msgpack turns lists into dicts keyed '0'..'11'; a
    flatten-order restore permutes entries lexicographically ('0','1','10',
    '11','2',...). restore_like must restore BY PATH."""
    import numpy as np
    from inductive_recommendation_tpu.train.checkpoint import (
        load_checkpoint,
        restore_like,
        save_checkpoint,
    )

    params = {"layers": [np.full((2, 2), float(i)) for i in range(12)]}
    path = str(tmp_path / "long.ckpt")
    save_checkpoint(path, params)
    template = {"layers": [np.zeros((2, 2)) for _ in range(12)]}
    out = restore_like(template, load_checkpoint(path)["params"])
    for i, layer in enumerate(out["layers"]):
        np.testing.assert_array_equal(layer, np.full((2, 2), float(i)))


def test_dose_resume_replays_views_exactly(tmp_path):
    """DOSE-family resume: restore_aux's buffer rebuild must re-establish the
    view buffers (a restored run used to crash with KeyError 'view_base'),
    and rebuild_views must regenerate the EXACT views the saved run was
    training on, so the resumed trajectory reproduces the uninterrupted one."""
    ds = get_dataset(
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
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        def make():
            model = get_model(
                {
                    "name": "DOSE_drop2",
                    "embedding_size": 16,
                    "n_layers": 2,
                    "dropout": 0.1,
                    "feature_ratio": 1,
                    "aug_rate": 0.6,
                },
                ds,
            )
            return get_trainer(
                {
                    "name": "DOSEdropTrainer",
                    "optimizer": "Adam",
                    "lr": 1e-2,
                    "l2_reg": 0.0,
                    "aux_reg": 0.01,
                    "contrastive_reg": 0.1,
                    "n_epochs": 10,
                    "batch_size": 128,
                    "test_batch_size": 32,
                    "topks": TOPKS,
                    "val_interval": 1,
                    "seed": 0,
                },
                ds,
                model,
            )

        t1 = make()
        for _ in range(2):
            t1.train_one_epoch()
        t1.epoch = 2
        t1.save_state("state.ckpt")
        view_a = np.asarray(t1.model.buffers["aug_adj"].base.fwd.buckets[0].val)
        loss_next_a = t1.train_one_epoch()

        t2 = make()
        t2.load_state("state.ckpt")
        view_b = np.asarray(t2.model.buffers["aug_adj"].base.fwd.buckets[0].val)
        np.testing.assert_array_equal(view_a, view_b)
        loss_next_b = t2.train_one_epoch()  # used to raise KeyError 'view_base'
        assert abs(loss_next_a - loss_next_b) < 1e-5
    finally:
        os.chdir(cwd)


def test_sgl_resume_replays_views_exactly(tmp_path):
    """SGL's random drop views replay their counter sequence on restore."""
    ds = get_dataset(
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
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        def make():
            model = get_model(
                {
                    "name": "SGL",
                    "embedding_size": 16,
                    "n_layers": 2,
                    "aug_rate": 0.7,
                },
                ds,
            )
            return get_trainer(
                {
                    "name": "SGLTrainer",
                    "optimizer": "Adam",
                    "lr": 1e-2,
                    "l2_reg": 1e-4,
                    "contrastive_reg": 0.1,
                    "n_epochs": 10,
                    "batch_size": 128,
                    "test_batch_size": 32,
                    "topks": TOPKS,
                    "val_interval": 1,
                    "seed": 0,
                },
                ds,
                model,
            )

        t1 = make()
        for _ in range(2):
            t1.train_one_epoch()
        t1.epoch = 2
        t1.save_state("state.ckpt")
        view_a = np.asarray(t1.model.buffers["aug_adj2"].base.fwd.buckets[0].val)
        loss_next_a = t1.train_one_epoch()

        t2 = make()
        t2.load_state("state.ckpt")
        view_b = np.asarray(t2.model.buffers["aug_adj2"].base.fwd.buckets[0].val)
        np.testing.assert_array_equal(view_a, view_b)
        loss_next_b = t2.train_one_epoch()
        assert abs(loss_next_a - loss_next_b) < 1e-5
    finally:
        os.chdir(cwd)


def _tiny_ds():
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


def test_short_topks_and_epoch_invariant(tmp_path):
    """topks=[20] (the reference's own yelp NeuMF quirk, which IndexErrors
    there) must train end-to-end; and after train() the epoch counter equals
    COMPLETED epochs so save_state/load_state does not replay an epoch."""
    ds = _tiny_ds()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        def make(n_epochs):
            model = get_model({"name": "MF", "embedding_size": 8}, ds)
            return get_trainer(
                {
                    "name": "BPRTrainer",
                    "optimizer": "Adam",
                    "lr": 1e-2,
                    "l2_reg": 1e-4,
                    "n_epochs": n_epochs,
                    "batch_size": 64,
                    "test_batch_size": 16,
                    "topks": [20],
                    "val_interval": 1,
                    "seed": 0,
                },
                ds,
                model,
            )

        t1 = make(2)
        t1.train(verbose=False)
        assert t1.epoch == 2  # completed count, not last index
        t1.save_state("s.ckpt")
        t2 = make(2)
        t2.load_state("s.ckpt")
        sc = t2._step_counter
        t2.train(verbose=False)  # nothing left to do; must not replay
        assert t2._step_counter == sc
    finally:
        os.chdir(cwd)


def test_neumf_resume_lands_in_saved_phase(tmp_path):
    """A full-state resume past a BCETrainer phase boundary must continue in
    the saved arch (it restarted as 'gmf' before arch was checkpointed)."""
    ds = _tiny_ds()
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        def make():
            model = get_model(
                {
                    "name": "NeuMF",
                    "embedding_size": 8,
                    "layer_sizes": [16, 8],
                },
                ds,
            )
            return get_trainer(
                {
                    "name": "BCETrainer",
                    "optimizer": "Adam",
                    "lr": 1e-2,
                    "l2_reg": 1e-4,
                    "n_epochs": 6,
                    "batch_size": 64,
                    "test_batch_size": 16,
                    "topks": [1, 5, 10, 15, 20, 25],
                    "val_interval": 1,
                    "mf_pretrain_epochs": 1,
                    "mlp_pretrain_epochs": 2,
                    "seed": 0,
                },
                ds,
                model,
            )

        t1 = make()
        for e in range(2):  # epochs 0 (gmf) and 1 (switch -> mlp)
            t1.epoch = e
            t1.train_one_epoch()
        t1.epoch = 2
        assert t1.model.arch == "mlp"
        t1.save_state("s.ckpt")

        t2 = make()
        assert t2.model.arch == "gmf"
        t2.load_state("s.ckpt")
        assert t2.model.arch == "mlp"  # restored, not restarted
        t2.train_one_epoch()  # epoch 2, still mlp
        assert t2.model.arch == "mlp"
        t2.epoch = 3
        t2.train_one_epoch()  # epoch 3 == mf+mlp -> neumf switch
        assert t2.model.arch == "neumf"
    finally:
        os.chdir(cwd)


def test_mltrainer_epoch_is_seeded():
    """MLTrainer's user permutation must be a pure function of (seed, epoch),
    not the global numpy stream."""
    ds = _tiny_ds()

    def run():
        model = get_model(
            {"name": "MultiVAE", "layer_sizes": [16, 8], "dropout": 0.0}, ds
        )
        t = get_trainer(
            {
                "name": "MLTrainer",
                "optimizer": "Adam",
                "lr": 1e-2,
                "l2_reg": 1e-4,
                "kl_reg": 0.2,
                "n_epochs": 4,
                "batch_size": 16,
                "test_batch_size": 16,
                "topks": [1, 5, 10, 15, 20, 25],
                "seed": 0,
            },
            ds,
            model,
        )
        np.random.seed(123 if run.flip else 321)  # perturb the global stream
        run.flip = not run.flip
        return [t.train_one_epoch() for _ in range(2)]

    run.flip = False
    a = run()
    b = run()
    assert a == b
