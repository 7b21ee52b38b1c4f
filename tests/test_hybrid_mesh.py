"""Hybrid data x edge parallelism (round-4): on a (D, S) mesh every edge
step shards the sampled batch over 'data' while the graph/table/collectives
stay inside each S-sized 'model' subgroup.

Checked two ways:

- LOSS PARITY: the hybrid step computes the same loss as the pure-edge
  (1, 8) step — which test_edge_sharded_spmm.py anchors to the
  single-device oracle — for every factorization of 8 devices, across
  multiple optimizer steps (catches table-gradient divergence, not just a
  first-forward match).
- COMPILED STRUCTURE: the (2, 4) program's optimized HLO contains
  all-reduces over the DATA-axis replica groups ({0,4},{1,5},... on a 2x4
  device array) — the cross-group gradient psum that makes the axis real —
  while the (1, 8) program has none (no data axis to reduce over).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from inductive_recommendation_tpu import get_dataset, get_model
from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
from inductive_recommendation_tpu.data.sampling import (
    build_sampler_state,
    sample_bpr_batch,
)
from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
from inductive_recommendation_tpu.parallel import (
    build_edge_sharded_spmm,
    make_edge_sharded_bpr_step,
    make_edge_sharded_dose_step,
    make_edge_sharded_igcn_step,
    make_mesh,
)
from inductive_recommendation_tpu.parallel.spmm import shard_operand
from inductive_recommendation_tpu.train import losses as L


def _ds():
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


MESHES = [(1, 8), (2, 4), (4, 2)]


def _bpr_losses(ds, model, sampler, params0, nd, nm, n_steps=2):
    n = ds.n_users + ds.n_items
    mesh = make_mesh(n_data=nd, n_model=nm)
    r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
    emat = build_edge_sharded_spmm(r, c, v, (n, n), nm)
    optimizer = optax.adam(1e-2)
    emb = jnp.zeros((emat.n_cols_pad, 16), jnp.float32)
    emb = emb.at[:n].set(params0["embedding"][:n])
    params = {"embedding": shard_operand(emb, emat, mesh)}
    opt_state = optimizer.init(params)
    step = make_edge_sharded_bpr_step(
        emat, mesh, optimizer, sampler, 64, 1e-4, ds.n_users, 3
    )
    losses = []
    with mesh:
        for i in range(n_steps):
            params, opt_state, loss = step(params, opt_state, jax.random.key(9 + i))
            losses.append(float(loss))
    return losses


def test_hybrid_bpr_matches_single_device():
    """Loss parity vs the single-device oracle for EVERY (D, S)
    factorization of 8 devices, over two optimizer steps."""
    ds = _ds()
    model = get_model(
        {"name": "LightGCN", "embedding_size": 16, "n_layers": 3, "table_align": 1},
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    params0 = model.init_params(jax.random.key(3))

    def single_loss(p, rng):
        users, pos, neg = sample_bpr_batch(sampler, jax.random.split(rng)[0], 64)
        u, pr, nr, l2 = model.bpr_forward(p, users, pos, neg[:, 0], training=False)
        return L.bpr_loss(u, pr, nr) + 1e-4 * l2.mean()

    loss_ref = float(jax.jit(single_loss)(params0, jax.random.key(9)))
    per_mesh = {
        (nd, nm): _bpr_losses(ds, model, sampler, params0, nd, nm)
        for nd, nm in MESHES
    }
    for key, losses in per_mesh.items():
        assert abs(losses[0] - loss_ref) < 1e-4, (key, losses[0], loss_ref)
        # second-step losses must agree ACROSS factorizations (the optimizer
        # update of step 1 fed them — a wrong data-axis grad psum shows here)
        assert abs(losses[1] - per_mesh[(1, 8)][1]) < 1e-4, (key, losses)


@pytest.mark.slow
def test_hybrid_igcn_matches_pure_edge():
    """IGCN (feat + adjacency + aux loss) hybrid loss == pure-edge loss on
    every factorization; the (1,8) loss is anchored to the single-device
    oracle in test_edge_sharded_spmm.py."""
    ds = _ds()
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1,
            "table_align": 1,
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    params0 = model.init_params(jax.random.key(3))
    from inductive_recommendation_tpu.graph import build_feat_matrix

    frow, fcol, fval, row_sum = build_feat_matrix(
        ds.train_array, ds.n_users, ds.n_items, model.user_map, model.item_map
    )
    n = ds.n_users + ds.n_items
    r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
    optimizer = optax.adam(1e-2)

    per_mesh = {}
    for nd, nm in MESHES:
        mesh = make_mesh(n_data=nd, n_model=nm)
        feat_emat = build_edge_sharded_spmm(
            frow, fcol, fval, (n, model.feat_n_cols), nm
        )
        adj_emat = build_edge_sharded_spmm(r, c, v, (n, n), nm)
        emb = jnp.zeros((feat_emat.n_cols_pad, 16), jnp.float32)
        emb = emb.at[: model.feat_n_cols].set(
            params0["embedding"][: model.feat_n_cols]
        )
        params = {
            "embedding": shard_operand(emb, feat_emat, mesh),
            "w": jnp.array(params0["w"]),
        }
        opt_state = optimizer.init(params)
        step = make_edge_sharded_igcn_step(
            feat_emat, adj_emat, frow, row_sum, mesh, optimizer, sampler,
            aux_sampler, 64, 1e-4, 0.01, ds.n_users, model.user_dim, 2, 0.0,
        )
        losses = []
        with mesh:
            for i in range(2):
                params, opt_state, loss = step(
                    params, opt_state, jax.random.key(21 + i), alpha=0.97
                )
                losses.append(float(loss))
        per_mesh[(nd, nm)] = losses
    for key, losses in per_mesh.items():
        assert np.allclose(losses, per_mesh[(1, 8)], atol=1e-4), (key, per_mesh)


@pytest.mark.slow
def test_hybrid_dose_matches_pure_edge():
    """DOSE_aug (contrastive flagship: feat + adjacency + view graph + aux)
    hybrid loss == pure-edge loss, including a step AFTER a per-epoch view
    regeneration (prepare_view re-indexing under the hybrid mesh)."""
    ds = _ds()
    per_mesh = {}
    for nd, nm in MESHES:
        model = get_model(
            {
                "name": "DOSE_aug",
                "embedding_size": 16,
                "n_layers": 2,
                "dropout": 0.0,
                "feature_ratio": 1.0,
                "aug_num": 8,
                "aug_rate": 0.5,
                "table_align": 1,
            },
            ds,
        )
        sampler = build_sampler_state(ds.train_data, ds.n_items)
        aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
        aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
        optimizer = optax.adam(1e-2)
        mesh = make_mesh(n_data=nd, n_model=nm)
        step, prep, shard = make_edge_sharded_dose_step(
            model, mesh, optimizer, sampler, aux_sampler, 64, 1e-4, 0.01, 0.05
        )
        params = shard(model.init_params(jax.random.key(5)))
        opt_state = optimizer.init(params)
        losses = []
        with mesh:
            params, opt_state, l0 = step(
                params, opt_state, jax.random.key(31),
                prep(model.edge_views["aug_adj"]),
            )
            losses.append(float(l0))
            # per-epoch regeneration: same params on every mesh -> same
            # selected pairs -> same view; the step after it must agree too
            model.feat_mat_anneal()
            model.update_aug_adj(model.init_params(jax.random.key(5)))
            params, opt_state, l1 = step(
                params, opt_state, jax.random.key(32),
                prep(model.edge_views["aug_adj"]), alpha=model.alpha,
            )
            losses.append(float(l1))
        per_mesh[(nd, nm)] = losses
    for key, losses in per_mesh.items():
        assert np.allclose(losses, per_mesh[(1, 8)], atol=1e-4), (key, per_mesh)


def test_hybrid_data_axis_carries_gradient_psum():
    """The (2,4) compiled program all-reduces over the DATA-axis replica
    groups ({0,4},{1,5},{2,6},{3,7}); the (1,8) program does not. This is
    the machine-checkable form of 'the data axis is real': batch-side
    gradients are reduced ACROSS edge groups by the SPMD partitioner."""
    ds = _ds()
    model = get_model(
        {"name": "LightGCN", "embedding_size": 16, "n_layers": 3, "table_align": 1},
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    params0 = model.init_params(jax.random.key(3))
    n = ds.n_users + ds.n_items
    r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
    optimizer = optax.adam(1e-2)

    def compiled_text(nd, nm):
        mesh = make_mesh(n_data=nd, n_model=nm)
        emat = build_edge_sharded_spmm(r, c, v, (n, n), nm)
        emb = jnp.zeros((emat.n_cols_pad, 16), jnp.float32)
        emb = emb.at[:n].set(params0["embedding"][:n])
        params = {"embedding": shard_operand(emb, emat, mesh)}
        opt_state = optimizer.init(params)
        step = make_edge_sharded_bpr_step(
            emat, mesh, optimizer, sampler, 64, 1e-4, ds.n_users, 3
        )
        with mesh:
            return (
                jax.jit(lambda p, o: step(p, o, 7))
                .lower(params, opt_state)
                .compile()
                .as_text()
            )

    def data_axis_allreduces(txt, pattern):
        return [
            m
            for m in re.findall(r"all-reduce[^\n]*replica_groups=(\S+)", txt)
            if pattern in m
        ]

    hybrid = compiled_text(2, 4)
    assert data_axis_allreduces(hybrid, "{0,4}"), "no data-axis psum in (2,4)"
    pure = compiled_text(1, 8)
    assert not data_axis_allreduces(pure, "{0,4}")
    # model-subgroup collectives exist in both (per-layer reduce-scatter)
    assert "reduce-scatter" in hybrid and "reduce-scatter" in pure


@pytest.mark.slow
def test_hybrid_edge_trainer_product_surface():
    """get_trainer(mesh_mode='edge') on a (2, 4) HYBRID mesh: the first-step
    loss equals the single-device BPRTrainer's (same seed/counter rng), the
    full epoch + mesh eval + recommend run, and the trainer's evaluator
    carries the hybrid mesh."""
    from inductive_recommendation_tpu import get_trainer

    ds = _ds()
    mcfg = {"name": "LightGCN", "embedding_size": 16, "n_layers": 2,
            "table_align": 1}
    tcfg = {
        "name": "BPRTrainer", "optimizer": "Adam", "lr": 1e-2,
        "l2_reg": 1e-4, "n_epochs": 1, "batch_size": 64,
        "test_batch_size": 16, "topks": [5, 10], "seed": 0,
    }
    m1 = get_model(mcfg, ds)
    t1 = get_trainer(dict(tcfg), ds, m1)
    l1 = float(
        t1._step(t1.params, t1.opt_state, m1.buffers, t1.sampler,
                 t1._next_seed())[2]
    )
    mesh = make_mesh(n_data=2, n_model=4)
    t2 = get_trainer(dict(tcfg), ds, get_model(mcfg, ds),
                     mesh=mesh, mesh_mode="edge")
    assert t2.evaluator.mesh is mesh
    with mesh:
        # the step donates (params, opt_state) — keep the returned ones
        t2.params, t2.opt_state, l2 = t2._run_step(t2._next_seed())
        l2 = float(l2)
    assert abs(l1 - l2) < 1e-4, (l1, l2)
    loss = t2.train_one_epoch()
    assert np.isfinite(loss)
    _, metrics = t2.eval("val")
    assert np.isfinite(metrics["NDCG"][10])
    rec = t2.recommend("val")
    assert rec.shape[0] == ds.n_users and (rec < ds.n_items).all()


# -- hybrid two-step parity for every remaining edge family -------------------
#
# test_edge_trainer.py anchors each family's FIRST-step loss to the
# single-device oracle (NGCF/IMCGAE/IDCF/DOSE_aug2 include a (2,4)
# factorization); the tests above run BPR/IGCN/DOSE_aug two steps on every
# factorization. What that leaves unchecked is the SECOND hybrid step of the
# other families — the first step whose params went through the data-axis
# gradient psum. A wrong cross-group reduction (summed instead of averaged,
# or a missed psum on a family-specific param like NGCF's gc/bi linears,
# IMCGAE's special rows, IDCF's attention heads, AttIGCN's q/k weights)
# leaves step 1 exact and shows up precisely at step 2.


def _hybrid_tcfg(name, **kw):
    cfg = {
        "name": name, "optimizer": "Adam", "lr": 1e-2, "l2_reg": 1e-4,
        "n_epochs": 1, "batch_size": 64, "test_batch_size": 16,
        "topks": [5, 10], "seed": 0, "max_patience": 50,
    }
    cfg.update(kw)
    return cfg


def _family_cfg(ds, family):
    """(model_cfg, trainer_name, trainer_kwargs) per edge family."""
    if family == "SGL":
        return (
            {"name": "SGL", "embedding_size": 16, "n_layers": 2,
             "aug_rate": 0.5, "table_align": 1},
            "SGLTrainer", {"contrastive_reg": 0.05},
        )
    if family == "AttIGCN":
        return (
            {"name": "AttIGCN", "embedding_size": 16, "n_layers": 2,
             "dropout": 0.0, "n_heads": 2, "table_align": 1},
            "IGCNTrainer", {"aux_reg": 0.01},
        )
    if family == "TEST":
        return (
            {"name": "TEST", "embedding_size": 16, "n_layers": 2,
             "dropout": 0.0, "feature_ratio": 1.0, "aug_num": 10,
             "aug_rate": 0.5, "table_align": 1},
            "DOSEdropTrainer", {"aux_reg": 0.01, "contrastive_reg": 0.05},
        )
    if family == "NGCF":
        return (
            {"name": "NGCF", "embedding_size": 16, "layer_sizes": [16, 16],
             "dropout": 0.0, "table_align": 1},
            "BPRTrainer", {},
        )
    if family == "IMCGAE":
        return (
            {"name": "IMCGAE", "embedding_size": 16, "n_layers": 2,
             "dropout": 0.0, "table_align": 1},
            "BPRTrainer", {},
        )
    if family == "IDCF_LGCN":
        frozen = (
            np.random.default_rng(7).standard_normal(
                (ds.n_users + ds.n_items, 16), dtype=np.float32
            )
            * 0.1
        )
        return (
            {"name": "IDCF_LGCN", "embedding_size": 16, "n_layers": 2,
             "n_headers": 2, "n_samples": 10,
             "pretrained_embedding": frozen, "table_align": 1},
            "IDCFTrainer", {"contrastive_reg": 1e-3},
        )
    if family == "DOSE_aug2":
        return (
            {"name": "DOSE_aug2", "embedding_size": 16, "n_layers": 2,
             "dropout": 0.0, "feature_ratio": 1.0, "aug_num": 8,
             "aug_rate": 0.5, "table_align": 1},
            "DOSEaugTrainer", {"aux_reg": 0.01, "contrastive_reg": 0.05},
        )
    raise AssertionError(family)


def _single_two_step_losses(ds, mcfg, tname, tkw):
    from inductive_recommendation_tpu import get_trainer

    m = get_model(dict(mcfg), ds)
    t = get_trainer(_hybrid_tcfg(tname, **tkw), ds, m)
    losses = []
    for _ in range(2):
        args = [t.params, t.opt_state, m.buffers, t.sampler]
        if hasattr(t, "aux_sampler"):
            args.append(t.aux_sampler)
        t.params, t.opt_state, loss = t._step(*args, t._next_seed())
        losses.append(float(loss))
    return losses


@pytest.mark.slow
@pytest.mark.parametrize(
    "family",
    ["SGL", "AttIGCN", "TEST", "NGCF", "IMCGAE", "IDCF_LGCN", "DOSE_aug2"],
)
def test_hybrid_two_step_parity_remaining_families(family):
    """Two optimizer steps on the (2, 4) HYBRID mesh == two single-device
    steps, for every edge family not already two-step-checked above."""
    from inductive_recommendation_tpu import get_trainer

    ds = _ds()
    mcfg, tname, tkw = _family_cfg(ds, family)
    ref = _single_two_step_losses(ds, mcfg, tname, tkw)

    mesh = make_mesh(n_data=2, n_model=4)
    t = get_trainer(
        _hybrid_tcfg(tname, **tkw), ds, get_model(dict(mcfg), ds),
        mesh=mesh, mesh_mode="edge",
    )
    got = []
    with mesh:
        for _ in range(2):
            t.params, t.opt_state, loss = t._run_step(t._next_seed())
            got.append(float(loss))
    assert np.allclose(got, ref, atol=3e-4), (family, got, ref)
