"""SGL/HALF + DOSE family: every variant trains a few epochs through its
trainer, views regenerate without shape changes (no retrace), and the
selection/graph recipes behave as specified."""

import os

import jax
import numpy as np
import pytest

from inductive_recommendation_tpu import get_dataset, get_model, get_trainer
from inductive_recommendation_tpu.models.dose import _DOSEBase

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
        "l2_reg": 0.0,
        "n_epochs": 3,
        "batch_size": 128,
        "test_batch_size": 32,
        "topks": TOPKS,
        "val_interval": 1,
        "seed": 0,
    }
    cfg.update(kw)
    return cfg


def _mcfg(name, **kw):
    cfg = {
        "name": name,
        "embedding_size": 16,
        "n_layers": 2,
        "dropout": 0.3,
        "feature_ratio": 1.0,
        "aug_num": 40,
        "aug_rate": 0.5,
    }
    cfg.update(kw)
    return cfg


DOSE_CASES = [
    ("DOSE_aug", "DOSEaugTrainer", {}),
    ("DOSE_aug2", "DOSEaugTrainer", {}),
    ("DOSE_aug3", "DOSEaugTrainer", {}),
    ("DOSE_aug4", "DOSEaugTrainer", {"pai": 0.0}),
    ("DOSE_drop", "DOSEdropTrainer", {}),
    ("DOSE_drop2", "DOSEdropTrainer", {}),
    ("DOSE_drop3", "DOSEdropTrainer", {}),
    ("DOSE_aug_drop", "DOSEdropTrainer", {}),
    ("DOSE_aug_drop2", "DOSEdropTrainer", {}),
    ("DOSE_aug_drop3", "DOSEdropTrainer", {}),
    ("DOSE_test", "DOSEtestTrainer", {}),
    ("TEST", "DOSEdropTrainer", {}),
    ("TEST2", "DOSEdropTrainer", {}),
    ("DOSE_drop2", "IGCNTrainer", {}),  # yelp config pairing (tolerant unpack)
]


@pytest.mark.parametrize("model_name,trainer_name,extra", DOSE_CASES)
def test_dose_variant_trains(ds, tmp_path, model_name, trainer_name, extra):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(_mcfg(model_name, **extra), ds)
        tcfg = _tcfg(trainer_name, contrastive_reg=0.1, aux_reg=0.01)
        if trainer_name == "IGCNTrainer":
            tcfg.pop("contrastive_reg", None)
        trainer = get_trainer(tcfg, ds, model)
        first = trainer.train_one_epoch()
        shapes_before = jax.tree_util.tree_map(
            lambda x: getattr(x, "shape", None), model.buffers
        )
        last = trainer.train_one_epoch()
        shapes_after = jax.tree_util.tree_map(
            lambda x: getattr(x, "shape", None), model.buffers
        )
        # view regeneration must keep buffer shapes static (no jit retrace) —
        # including DOSE_aug2's aug feature matrix (static base + fixed-budget
        # injected-entry delta)
        assert shapes_before == shapes_after, model_name
        assert np.isfinite(first) and np.isfinite(last)
        _, m = trainer.eval("val")
        assert np.isfinite(m["NDCG"][TOPKS[4]])
        if isinstance(model, _DOSEBase):
            assert model.alpha < 1.0  # annealed each epoch
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("model_name", ["SGL", "HALF"])
def test_sgl_half_train(ds, tmp_path, model_name):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(
            {"name": model_name, "embedding_size": 16, "n_layers": 2, "aug_rate": 0.7},
            ds,
        )
        trainer = get_trainer(
            _tcfg(model_name + "Trainer", contrastive_reg=0.1, l2_reg=1e-4),
            ds,
            model,
        )
        first = trainer.train_one_epoch()
        # views are baked: the keep-mask shows up in the layout values
        a1_before = np.asarray(
            model.buffers["aug_adj1"].base.fwd.buckets[0].val
        ).copy()
        last = trainer.train_one_epoch()
        a1_after = np.asarray(model.buffers["aug_adj1"].base.fwd.buckets[0].val)
        assert a1_before.shape == a1_after.shape
        assert not np.array_equal(a1_before, a1_after)  # regenerated
        assert np.isfinite(first) and np.isfinite(last)
    finally:
        os.chdir(cwd)


def test_dose_selection_semantics(ds):
    """aug (negate) selects low-sim pairs; drop (no negate) selects high-sim
    pairs; difference removes exactly the selected train pairs."""
    model = get_model(_mcfg("DOSE_drop", aug_num=20), ds)
    params = model.init_params(jax.random.key(0))
    pairs_high = model._cos_pairs(params, 20, negate_items=False)
    pairs_low = model._cos_pairs(params, 20, negate_items=True)
    rep = np.asarray(model.get_rep(params, training=False))
    u = rep[: ds.n_users]
    i = rep[ds.n_users :]
    un = u / np.linalg.norm(u, axis=1, keepdims=True)
    inn = i / np.linalg.norm(i, axis=1, keepdims=True)
    sims = un @ inn.T
    high_vals = sims[pairs_high[:, 0], pairs_high[:, 1]]
    low_vals = sims[pairs_low[:, 0], pairs_low[:, 1]]
    assert high_vals.min() >= np.sort(sims.reshape(-1))[-20]
    assert low_vals.max() <= np.sort(sims.reshape(-1))[19]

    from inductive_recommendation_tpu.graph.build import drop_difference_edges

    train = model._dedup_train
    dropped = drop_difference_edges(train, pairs_high)
    dropped_set = {tuple(e) for e in dropped}
    for e in pairs_high:
        assert tuple(e) not in dropped_set


def test_dose_aug2_feature_ratio_selects_aug_core(ds, tmp_path):
    """feature_ratio < 1: DOSE_aug2's aug feature matrix re-selects its core
    from a ranking over the aug graph (graph_aug_rank_nodes, model.py:941)
    on the first build, keeping the same core sizes as the main maps, and
    keeps those maps across later epoch updates (is_updating=True)."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(
            _mcfg("DOSE_aug2", feature_ratio=0.6, ranking_metric="degree"), ds
        )
        trainer = get_trainer(
            _tcfg("DOSEaugTrainer", contrastive_reg=0.1, aux_reg=0.01), ds, model
        )
        trainer.train_one_epoch()
        assert hasattr(model, "aug_user_map")
        # same core sizes as the main maps; valid compact index ranges
        assert (model.aug_user_map >= 0).sum() == (model.user_map >= 0).sum()
        assert (model.aug_item_map >= 0).sum() == (model.item_map >= 0).sum()
        um1 = model.aug_user_map.copy()
        trainer.train_one_epoch()
        assert np.array_equal(um1, model.aug_user_map)  # kept across updates
        _, m = trainer.eval("val")
        assert np.isfinite(m["NDCG"][TOPKS[4]])
    finally:
        os.chdir(cwd)


def test_dose_aug2_static_aug_feat_matches_union_oracle(ds, tmp_path):
    """DOSE_aug2's static aug feature matrix (annealed bucketed base over
    train edges + fixed-budget injected-entry delta) must represent EXACTLY
    the matrix the reference builds over train ∪ aug (model.py:935-978):
    values = multiplicity x row_sum^((alpha-1)/2 - 0.5) over the union —
    checked for the product AND its gradient, across two epoch updates
    (annealed alphas), against a dense host oracle."""
    import jax.numpy as jnp
    from inductive_recommendation_tpu.graph import build_feat_matrix
    from inductive_recommendation_tpu.graph.build import aug_union_edges

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = get_model(_mcfg("DOSE_aug2", dropout=0.0), ds)
        trainer = get_trainer(
            _tcfg("DOSEaugTrainer", contrastive_reg=0.1, aux_reg=0.01), ds, model
        )
        trainer.train_one_epoch()  # fires update_aug_adj at epoch end
        for _ in range(2):
            assert "aug_feat" in model.buffers and "aug_feat_delta" in model.buffers
            emb = np.asarray(
                jax.random.normal(jax.random.key(3), (model.feat_n_cols, 8))
            )

            def ours(e):
                return model.view_users(
                    {"embedding": jnp.asarray(e), "w": model_w},
                    model.buffers,
                    "aug_adj",
                    jnp.arange(ds.n_users),
                    None,
                    False,
                )

            model_w = jnp.ones((8,), jnp.float32)

            # oracle x0 via the dense union feat matrix at the current alpha
            union = aug_union_edges(
                model._dedup_train, np.asarray(model._last_aug_pairs_dev)
            )
            row, col, counts, row_sum = build_feat_matrix(
                union, ds.n_users, ds.n_items, model.user_map, model.item_map
            )
            dense = np.zeros((ds.n_users + ds.n_items, model.feat_n_cols))
            w = row_sum[row] ** ((model.alpha - 1.0) / 2.0 - 0.5)
            dense[row, col] = counts * w

            # compare the x0 SpMM directly (base + delta vs dense oracle)
            from inductive_recommendation_tpu.graph.views import delta_spmm_rect
            from inductive_recommendation_tpu.ops import spmm_bucketed

            def x0_ours(e):
                return spmm_bucketed(
                    model.buffers["aug_feat"], jnp.asarray(e)
                ) + delta_spmm_rect(
                    ds.n_users + ds.n_items,
                    model.buffers["aug_feat_delta"],
                    jnp.asarray(e),
                )

            got = np.asarray(x0_ours(emb))
            np.testing.assert_allclose(got, dense @ emb, rtol=2e-4, atol=2e-5)

            # gradient parity (exercises the transpose delta copy)
            g = np.asarray(
                jax.grad(lambda e: jnp.sum(jnp.sin(x0_ours(e))))(jnp.asarray(emb))
            )
            g_ref = dense.T @ np.cos(dense @ emb)
            np.testing.assert_allclose(g, g_ref, rtol=2e-4, atol=2e-5)

            trainer.train_one_epoch()  # new selection + anneal; shapes static
    finally:
        os.chdir(cwd)


def test_delta_spmm_rect_dropout_consistency():
    """The injected-entry dropout hash must draw identically in the forward
    and transpose orderings (gradient correctness) and reduce to the plain
    op at p=0."""
    import jax.numpy as jnp
    from inductive_recommendation_tpu.graph.views import (
        _uniform_from_entry,
        delta_spmm_rect,
        delta_spmm_rect_dropout,
    )

    rng = np.random.default_rng(0)
    n_out, n_in, D = 12, 9, 20
    rr = np.sort(rng.integers(0, n_out, D)).astype(np.int32)
    cc = rng.integers(0, n_in, D).astype(np.int32)
    vv = rng.standard_normal(D).astype(np.float32)
    t = np.argsort(cc, kind="stable")
    delta = tuple(
        jnp.asarray(a) for a in (rr, cc, vv, rr[t], cc[t], vv[t])
    )
    x = jnp.asarray(rng.standard_normal((n_in, 4)).astype(np.float32))
    key_data = jax.random.key_data(jax.random.key(7))

    out0 = delta_spmm_rect_dropout(n_out, n_in, delta, key_data, jnp.float32(0.0), x)
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(delta_spmm_rect(n_out, delta, x)), rtol=1e-6
    )

    # p > 0: value and grad must match a dense oracle built from the SAME
    # entry-hash mask
    p = 0.4
    keep = np.asarray(
        _uniform_from_entry(key_data, jnp.asarray(rr * np.int32(n_in) + cc)) >= p
    )
    dense = np.zeros((n_out, n_in), np.float32)
    np.add.at(dense, (rr[keep], cc[keep]), vv[keep] / (1.0 - p))

    def f(x):
        return jnp.sum(
            jnp.sin(
                delta_spmm_rect_dropout(
                    n_out, n_in, delta, key_data, jnp.float32(p), x
                )
            )
        )

    out = delta_spmm_rect_dropout(n_out, n_in, delta, key_data, jnp.float32(p), x)
    np.testing.assert_allclose(np.asarray(out), dense @ np.asarray(x), rtol=1e-5, atol=1e-6)
    g = np.asarray(jax.grad(f)(x))
    g_ref = dense.T @ np.cos(dense @ np.asarray(x))
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-5)


def test_TEST_main_drop_graph_survives_reload(ds, tmp_path):
    """TEST's defining static random-drop MAIN adjacency must survive the
    best-checkpoint reload (restore_aux rebuilds buffers with the FULL graph
    unless the persisted keep mask is reapplied) and must be a bucketed
    (gather-only) layout, not a segment-sum COO."""
    from inductive_recommendation_tpu.ops.bucketed_spmm import BucketedSpMM

    model = get_model(_mcfg("TEST"), ds)
    trainer = get_trainer(
        _tcfg("DOSEdropTrainer", aux_reg=0.01, contrastive_reg=0.1), ds, model
    )
    assert isinstance(model.buffers["norm_adj"], BucketedSpMM)
    nnz_dropped = model.buffers["norm_adj"].nnz
    # dropped graph: strictly fewer edges than the full sym adjacency
    full_nnz = 2 * len(model._dedup_train) + 0  # sym: both directions
    assert nnz_dropped < full_nnz
    vals_before = np.asarray(model.buffers["norm_adj"].fwd.buckets[0].val)

    trainer.train_one_epoch()
    path = os.path.join(tmp_path, "best.ckpt")
    trainer._save_model(path)
    trainer._load_model(path)
    adj = model.buffers["norm_adj"]
    assert isinstance(adj, BucketedSpMM) and adj.nnz == nnz_dropped
    np.testing.assert_array_equal(
        np.asarray(adj.fwd.buckets[0].val), vals_before
    )
    # training continues after the reload (views re-established too)
    trainer.train_one_epoch()


def _grow_dataset(ds, n_new_users=5, n_new_items=4, seed=0):
    """ds + new users/items with a few edges (the inductive protocol's
    attach payload), as in test_igcn.py::test_inductive_attach_new_dataset."""
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
    new_ds.test_data = [[] for _ in range(new_ds.n_users)]
    return new_ds


def test_dose_attach_dataset_reestablishes_views(ds):
    """attach_dataset rebuilds the graph buffers — the view engine and view
    buffers must follow (the old buffers crashed on 'view_base'), and the
    epoch update must keep working on the grown graph."""
    model = get_model(_mcfg("DOSE_drop2"), ds)
    params = model.init_params(jax.random.key(0))
    model.update_aug_adj(params)
    new_ds = _grow_dataset(ds)
    model.attach_dataset(new_ds)
    assert "view_base" in model.buffers and "aug_adj" in model.buffers
    assert len(model._dedup_train) > 0
    model.update_aug_adj(params=None)  # random recipe: params-free
    rep = np.asarray(model.get_rep(params, training=False))
    assert rep.shape[0] == new_ds.n_users + new_ds.n_items
    assert np.isfinite(rep).all()


def test_dose_aug2_attach_extends_aug_core_maps(ds):
    """DOSE_aug2's cached aug core maps (feature_ratio < 1) must extend with
    -1 for new nodes on attach — stale short maps IndexError'd in the next
    epoch's aug-feat rebuild."""
    model = get_model(_mcfg("DOSE_aug2", feature_ratio=0.6), ds)
    trainer = get_trainer(
        _tcfg("DOSEaugTrainer", aux_reg=0.01, contrastive_reg=0.1), ds, model
    )
    trainer.train_one_epoch()  # populates aug_user_map/aug_item_map
    assert hasattr(model, "aug_user_map")
    new_ds = _grow_dataset(ds)
    model.attach_dataset(new_ds)
    assert len(model.aug_user_map) == new_ds.n_users
    assert (model.aug_user_map[ds.n_users :] == -1).all()
    model.update_aug_adj(trainer.params)  # used to IndexError
    assert "aug_feat" in model.buffers


def test_dose_aug4_threshold_cap_tracks_attached_catalog(ds):
    """DOSE_aug4's selection cap k = min(aug_num, n_users * n_items) is a
    trace constant; after attach_dataset grows the catalog the selection must
    re-jit at the NEW cap (a stale closure silently kept selecting at the old
    catalog's size)."""
    small = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 10,
            "n_items": 8,
            "n_interactions": 120,
            "seed": 5,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 1,
        }
    )
    model = get_model(_mcfg("DOSE_aug4", aug_num=500, pai=-1.0), small)
    params = model.init_params(jax.random.key(0))
    model.update_aug_adj(params)
    k_small = small.n_users * small.n_items  # aug_num clamps to the catalog
    assert {ck[0] for ck in model._thr_jits} == {k_small}

    grown = _grow_dataset(small)
    model.attach_dataset(grown)
    model.update_aug_adj(params)
    k_grown = grown.n_users * grown.n_items
    assert k_grown != k_small
    assert any(ck[0] == k_grown for ck in model._thr_jits), (
        "selection still capped at the pre-attach catalog size"
    )


def test_dose_aug_drop2_attach_reranks_tails(ds):
    """The degree-tail restriction must re-rank over the grown graph so
    newly-appeared cold nodes are selectable for injection."""
    model = get_model(_mcfg("DOSE_aug_drop2", aug_ratio=0.2), ds)
    params = model.init_params(jax.random.key(0))
    new_ds = _grow_dataset(ds)
    model.attach_dataset(new_ds)
    assert model._tail_users.max() >= ds.n_users  # new cold users in the tail
    assert len(model._tail_users) == new_ds.n_users - int(
        new_ds.n_users * model.aug_ratio
    )
    model.update_aug_adj(params)
    assert np.isfinite(
        np.asarray(model.buffers["aug_adj"].base.fwd.buckets[0].val)
    ).all()


def test_dose_aug2_core_maps_capped_after_attach(ds):
    """feature_ratio < 1 with the FIRST selection happening after an
    attach_dataset grew the catalog: the aug core must size to
    user_dim/item_dim (the shared embedding table's layout), not to
    int(new_n * ratio) — oversized maps indexed past feat_n_cols."""
    model = get_model(_mcfg("DOSE_aug2", feature_ratio=0.6), ds)
    params = model.init_params(jax.random.key(0))
    new_ds = _grow_dataset(ds)
    model.attach_dataset(new_ds)
    model.update_aug_adj(params)  # first selection AFTER the attach
    assert int((model.aug_user_map >= 0).sum()) == model.user_dim
    assert int((model.aug_item_map >= 0).sum()) == model.item_dim
    users = np.arange(8, dtype=np.int32)
    v = model.view_users(
        params, model.buffers, "aug_adj", users, jax.random.key(1), False
    )
    assert np.isfinite(np.asarray(v)).all()


def test_dose_aug2_buffers_structure_static_from_step1(ds):
    """With feature_ratio >= 1 the aug-feat buffers are SEEDED at
    construction (train-only matrix + all-zero delta), so the first real
    update_aug_adj changes values only — same pytree structure and shapes,
    no train-step retrace at epoch 2."""
    model = get_model(_mcfg("DOSE_aug2"), ds)
    params = model.init_params(jax.random.key(0))
    assert "aug_feat" in model.buffers and "aug_feat_delta" in model.buffers
    s0 = jax.tree_util.tree_structure(model.buffers)
    shapes0 = [
        getattr(x, "shape", None) for x in jax.tree_util.tree_leaves(model.buffers)
    ]
    model.update_aug_adj(params)
    assert jax.tree_util.tree_structure(model.buffers) == s0
    shapes1 = [
        getattr(x, "shape", None) for x in jax.tree_util.tree_leaves(model.buffers)
    ]
    assert shapes0 == shapes1


def test_dose_aug2_seeded_aug_feat_matches_train_feat(ds):
    """The seeded aug-feat x0 (train-only base + zero delta) must equal the
    plain train feature-matrix rep layer the initial view used before."""
    model = get_model(_mcfg("DOSE_aug2", dropout=0.0), ds)
    params = model.init_params(jax.random.key(0))
    x0_aug = model._view_x0(params, model.buffers, jax.random.key(1), False)
    x0_train = _DOSEBase._view_x0(
        model, params, model.buffers, jax.random.key(1), False
    )
    np.testing.assert_allclose(
        np.asarray(x0_aug), np.asarray(x0_train), rtol=1e-5, atol=1e-6
    )


def test_dose_views_replay_after_attach(ds):
    """A save that happens AFTER an attach_dataset (no intervening update)
    must restore the attach-time initial views: the replay window is the
    attach-time counter, not the stale pre-attach update snapshot."""
    model = get_model(_mcfg("TEST2"), ds)
    params = model.init_params(jax.random.key(0))
    model.update_aug_adj(params)
    new_ds = _grow_dataset(ds)
    model.attach_dataset(new_ds)
    aux = model.checkpoint_aux()
    want = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(
            (model.buffers["aug_adj"], model.buffers["aug_adj2"])
        )
    ]

    model2 = get_model(_mcfg("TEST2"), new_ds)
    model2.restore_aux(aux)
    model2.rebuild_views(params)  # trainer post-load hook (no-op here)
    got = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(
            (model2.buffers["aug_adj"], model2.buffers["aug_adj2"])
        )
    ]
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)


def test_drop_only_views_have_no_delta(ds):
    """Drop-only variants run with delta_budget 0: the hot view SpMM must
    not carry a dead all-zero injected-entry delta sized by the drop count."""
    for name in ("DOSE_drop2", "TEST2"):
        model = get_model(_mcfg(name), ds)
        assert model.view_engine.delta_budget == 0
        assert model.buffers["aug_adj"].d_row.shape[0] == 0
    model = get_model(_mcfg("DOSE_drop3"), ds)
    params = model.init_params(jax.random.key(0))
    model.update_aug_adj(params)  # cos-topk drop selection
    assert model.view_engine.delta_budget == 0
    assert model.buffers["aug_adj"].d_row.shape[0] == 0
    users = np.arange(8, dtype=np.int32)
    v = model.view_users(
        params, model.buffers, "aug_adj", users, jax.random.key(1), False
    )
    assert np.isfinite(np.asarray(v)).all()
