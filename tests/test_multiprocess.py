"""Multi-HOST semantics without a cluster (SURVEY §4): two spawned processes
with 4 virtual CPU devices each form one 8-device global mesh via
jax.distributed; the sharded IGCN train step and sharded retrieval must
produce the same numbers as the single-process 8-device run."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
sys.path.insert(0, os.environ["REPO_ROOT"])

import numpy as np
import optax
import jax.numpy as jnp
from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
from inductive_recommendation_tpu.data.sampling import build_sampler_state
from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
from inductive_recommendation_tpu.models import get_model
from inductive_recommendation_tpu.parallel import (
    make_mesh, make_sharded_igcn_step, shard_params, sharded_recommend_all_users)

assert jax.device_count() == 8 and jax.local_device_count() == 4
ds = quick_synthetic_dataset(64, 64, 1500, seed=0)
model = get_model({"name": "IGCN", "embedding_size": 16, "n_layers": 2,
                   "dropout": 0.0, "feature_ratio": 1, "table_align": 8}, ds)
sampler = build_sampler_state(ds.train_data, ds.n_items)
aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
optimizer = optax.adam(1e-2)
mesh = make_mesh(n_data=2, n_model=4)
params = shard_params(model.init_params(jax.random.key(0)), mesh)
opt_state = optimizer.init(params)
step = make_sharded_igcn_step(model, optimizer, sampler, aux_sampler, 64, 1e-4, 0.01, mesh)
with mesh:
    params, opt_state, loss = step(params, opt_state, jax.random.key(1))
    loss_val = float(loss)
    rep = jax.device_get(model.get_rep(params, training=False))
rec = sharded_recommend_all_users(mesh, jnp.asarray(rep), ds.n_users, ds.n_items,
                                  k=10, batch_size=32)

# EDGE-sharded step across the 2-process mesh: graph + table sharded over
# the global 'model' axis (each process builds the identical layout from
# deterministic host code; shard_map splits it across hosts)
from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
from inductive_recommendation_tpu.parallel import (
    build_edge_sharded_spmm, make_edge_sharded_bpr_step, shard_operand)
n = ds.n_users + ds.n_items
r_, c_, v_ = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
emat = build_edge_sharded_spmm(r_, c_, v_, (n, n), 4)
emb0 = np.zeros((emat.n_cols_pad, 16), np.float32)
emb0[:n] = np.asarray(model.init_params(jax.random.key(2))["embedding"])[:n]
eparams = {"embedding": shard_operand(emb0, emat, mesh)}
estep = make_edge_sharded_bpr_step(emat, mesh, optimizer, sampler, 64, 1e-4,
                                   ds.n_users, 2)
with mesh:
    eparams, _, eloss = estep(eparams, optimizer.init(eparams), jax.random.key(3))
    eloss_val = float(eloss)

# FLAGSHIP edge-sharded IGCN across the 2-process mesh: feat matrix +
# adjacency + core table sharded over the global 'model' axis, annealed
# feature weights entering as a pre-sharded per-edge scale — the
# multi-controller array-construction path (jax.make_array_from_* under
# device_put/shard_map) for the feat layouts
from inductive_recommendation_tpu.graph import build_feat_matrix
from inductive_recommendation_tpu.parallel import make_edge_sharded_igcn_step
frow, fcol, fval, row_sum = build_feat_matrix(
    ds.train_array, ds.n_users, ds.n_items, model.user_map, model.item_map)
feat_emat = build_edge_sharded_spmm(
    frow, fcol, fval, (n, model.feat_n_cols), 4)
gemb = np.zeros((feat_emat.n_cols_pad, 16), np.float32)
gemb[:model.feat_n_cols] = np.asarray(
    model.init_params(jax.random.key(4))["embedding"])[:model.feat_n_cols]
gparams = {"embedding": shard_operand(gemb, feat_emat, mesh),
           "w": jnp.ones((16,), jnp.float32)}
gstep = make_edge_sharded_igcn_step(
    feat_emat, emat, frow, row_sum, mesh, optimizer, sampler, aux_sampler,
    64, 1e-4, 0.01, ds.n_users, model.user_dim, 2, 0.0)
with mesh:
    gparams, _, gloss = gstep(
        gparams, optimizer.init(gparams), jax.random.key(5), alpha=0.97)
    gloss_val = float(gloss)

# CONTRASTIVE flagship (DOSE_aug) across processes, INCLUDING one per-epoch
# prepare_view refresh (the O(nnz/S) re-indexing runs per process on the
# global sharded eid_map)
from inductive_recommendation_tpu.parallel import make_edge_sharded_dose_step
dmodel = get_model({"name": "DOSE_aug", "embedding_size": 16, "n_layers": 2,
                    "dropout": 0.0, "feature_ratio": 1.0, "aug_num": 6,
                    "aug_rate": 0.5, "table_align": 1}, ds)
dstep, dprep, dshard = make_edge_sharded_dose_step(
    dmodel, mesh, optimizer, sampler, aux_sampler, 64, 1e-4, 0.01, 0.05)
dparams0 = dmodel.init_params(jax.random.key(6))
dparams = dshard(dparams0)
dopt = optimizer.init(dparams)
with mesh:
    dparams, dopt, dloss = dstep(
        dparams, dopt, jax.random.key(7), dprep(dmodel.edge_views["aug_adj"]))
    dloss_val = float(dloss)
    # epoch end: regenerate the view from the DENSE params (deterministic on
    # every process) and step again through the refreshed sharded view state
    dmodel.feat_mat_anneal()
    dmodel.update_aug_adj(dparams0)
    dparams, dopt, dloss2 = dstep(
        dparams, dopt, jax.random.key(8), dprep(dmodel.edge_views["aug_adj"]),
        alpha=dmodel.alpha)
    dloss2_val = float(dloss2)

print("RESULT " + json.dumps({"pid": pid, "loss": loss_val,
                              "eloss": eloss_val,
                              "gloss": gloss_val,
                              "dloss": dloss_val, "dloss2": dloss2_val,
                              "rec0": np.asarray(rec)[0].tolist()}), flush=True)
"""


pytestmark = pytest.mark.slow

def test_two_process_mesh_matches_single_process(tmp_path):
    port = "29911"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        REPO_ROOT=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    env.pop("XLA_FLAGS", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    results = {}
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        text = out.decode()
        logs.append(text)
        assert p.returncode == 0, text[-2000:]
        for line in text.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, logs
    # both processes observe the same global computation
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6
    assert abs(results[0]["eloss"] - results[1]["eloss"]) < 1e-6
    assert np.isfinite(results[0]["eloss"])
    for k in ("gloss", "dloss", "dloss2"):  # flagship edge steps
        assert abs(results[0][k] - results[1][k]) < 1e-6, k
        assert np.isfinite(results[0][k]), k
    assert results[0]["rec0"] == results[1]["rec0"]

    # single-process 8-device run must agree (same seeds, same mesh shape)
    import jax
    import optax
    import jax.numpy as jnp
    from inductive_recommendation_tpu.data.dataset import (
        AuxiliaryDataset,
        quick_synthetic_dataset,
    )
    from inductive_recommendation_tpu.data.sampling import build_sampler_state
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.parallel import (
        make_mesh,
        make_sharded_igcn_step,
        shard_params,
    )

    ds = quick_synthetic_dataset(64, 64, 1500, seed=0)
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1,
            "table_align": 8,
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    optimizer = optax.adam(1e-2)
    mesh = make_mesh(n_data=2, n_model=4)
    params = shard_params(model.init_params(jax.random.key(0)), mesh)
    opt_state = optimizer.init(params)
    step = make_sharded_igcn_step(
        model, optimizer, sampler, aux_sampler, 64, 1e-4, 0.01, mesh
    )
    with mesh:
        _, _, loss = step(params, opt_state, jax.random.key(1))
    assert abs(float(loss) - results[0]["loss"]) < 1e-5

    # single-process EDGE-sharded IGCN and DOSE (same seeds, same 2x4 mesh —
    # now a HYBRID mesh whose data groups SPAN the process boundary in the
    # 2-process run): losses must match the multi-controller run
    import jax.numpy as jnp
    from inductive_recommendation_tpu.graph import build_feat_matrix
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.parallel import (
        build_edge_sharded_spmm,
        make_edge_sharded_dose_step,
        make_edge_sharded_igcn_step,
    )
    from inductive_recommendation_tpu.parallel.spmm import shard_operand

    n = ds.n_users + ds.n_items
    r_, c_, v_ = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
    emat = build_edge_sharded_spmm(r_, c_, v_, (n, n), 4)
    frow, fcol, fval, row_sum = build_feat_matrix(
        ds.train_array, ds.n_users, ds.n_items, model.user_map, model.item_map
    )
    feat_emat = build_edge_sharded_spmm(frow, fcol, fval, (n, model.feat_n_cols), 4)
    gemb = np.zeros((feat_emat.n_cols_pad, 16), np.float32)
    gemb[: model.feat_n_cols] = np.asarray(
        model.init_params(jax.random.key(4))["embedding"]
    )[: model.feat_n_cols]
    gparams = {
        "embedding": shard_operand(gemb, feat_emat, mesh),
        "w": jnp.ones((16,), jnp.float32),
    }
    gstep = make_edge_sharded_igcn_step(
        feat_emat, emat, frow, row_sum, mesh, optimizer, sampler, aux_sampler,
        64, 1e-4, 0.01, ds.n_users, model.user_dim, 2, 0.0,
    )
    with mesh:
        _, _, gloss = gstep(
            gparams, optimizer.init(gparams), jax.random.key(5), alpha=0.97
        )
    assert abs(float(gloss) - results[0]["gloss"]) < 1e-5

    from inductive_recommendation_tpu.models import get_model as _gm

    dmodel = _gm(
        {
            "name": "DOSE_aug", "embedding_size": 16, "n_layers": 2,
            "dropout": 0.0, "feature_ratio": 1.0, "aug_num": 6,
            "aug_rate": 0.5, "table_align": 1,
        },
        ds,
    )
    dstep, dprep, dshard = make_edge_sharded_dose_step(
        dmodel, mesh, optimizer, sampler, aux_sampler, 64, 1e-4, 0.01, 0.05
    )
    dparams0 = dmodel.init_params(jax.random.key(6))
    dparams = dshard(dparams0)
    dopt = optimizer.init(dparams)
    with mesh:
        dparams, dopt, dloss = dstep(
            dparams, dopt, jax.random.key(7), dprep(dmodel.edge_views["aug_adj"])
        )
        dmodel.feat_mat_anneal()
        dmodel.update_aug_adj(dparams0)
        dparams, dopt, dloss2 = dstep(
            dparams, dopt, jax.random.key(8),
            dprep(dmodel.edge_views["aug_adj"]), alpha=dmodel.alpha,
        )
    assert abs(float(dloss) - results[0]["dloss"]) < 1e-5
    assert abs(float(dloss2) - results[0]["dloss2"]) < 1e-5
