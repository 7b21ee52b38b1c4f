"""Benchmark: BPR training throughput (examples/s/chip) on a Gowalla-scale
synthetic graph, LightGCN 3-layer d=64, full-graph SpMM per step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (the driver
contract). Diagnostics go to stderr.

``--detail`` additionally measures the north-star metrics — IGCN / AttIGCN /
DOSE_aug / SGL step throughput, the edge-mode S=1 step (the single-chip
sharding tax), full-catalog eval users/s, single-SpMM %SoL (true ceiling:
the measured 366M rows/s random-gather transaction rate, ops/sol.py) — and
writes them to ``BENCH_DETAIL_r{N}.json`` so round-over-round deltas are
machine-checkable (run manually on the real chip; the default driver run
stays single-metric and bounded).

``--scale`` / ``--scale-yelp`` / ``--scale-alibaba`` / ``--scale-ml`` run
the graph-size tiers (see SCALE_TIERS) and write BENCH_SCALE*_r{N}.json.

The reference publishes no numbers (BASELINE.md: "published: {}"), so
``vs_baseline`` is reported against this framework's own first recorded
round figure (the earliest BENCH_r*.json in the repo); until one exists, 1.0.
"""

import glob
import json
import os
import re
import sys
import time


def _baseline_value():
    here = os.path.dirname(os.path.abspath(__file__))
    runs = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                payload = json.load(f)
            if not isinstance(payload, dict):
                continue
            # the driver wraps the printed JSON line under "parsed"
            parsed = payload.get("parsed")
            value = payload.get(
                "value", parsed.get("value") if isinstance(parsed, dict) else None
            )
            if isinstance(value, (int, float)):
                runs.append((int(m.group(1)), float(value)))
        except (OSError, ValueError):
            continue
    if not runs:
        return None
    return min(runs)[1]


def _next_round():
    # the CURRENT round number: the driver writes BENCH_r{N}.json at round
    # END, so now = last driver round + 1. Only driver files count — the
    # manual DETAIL/SCALE artifacts carry the round number themselves, and
    # counting them made a second same-round invocation jump a round
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [0]
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _make_dataset():
    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset

    # Gowalla scale (≈29.9k users, 41.0k items, ≈1.03M interactions)
    return quick_synthetic_dataset(29858, 40981, 1_200_000, seed=0)


def _time_steps(one_step, n_steps):
    # scalar fetch forces execution — on tunneled remote backends
    # block_until_ready alone does not synchronize
    for _ in range(3):
        loss = one_step()
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss = one_step()
    float(loss)
    return time.perf_counter() - t0, float(loss)


def measure_bpr(ds, batch_size=2048, n_steps=50):
    """LightGCN BPR step throughput (the headline driver metric)."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import BPRTrainer

    model = get_model({"name": "LightGCN", "embedding_size": 64, "n_layers": 3}, ds)
    trainer = BPRTrainer(
        {
            "name": "BPRTrainer",
            "optimizer": "Adam",
            "lr": 1e-3,
            "l2_reg": 1e-4,
            "n_epochs": 1,
            "batch_size": batch_size,
            "test_batch_size": 512,
            "topks": [20],
        },
        ds,
        model,
    )

    def one_step():
        trainer.params, trainer.opt_state, loss = trainer._step(
            trainer.params,
            trainer.opt_state,
            trainer.model.buffers,
            trainer.sampler,
            trainer._next_seed(),
        )
        return loss

    dt, loss = _time_steps(one_step, n_steps)
    ex_s = n_steps * batch_size / dt
    _log(
        f"# bpr: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | "
        f"loss={loss:.4f}"
    )
    return ex_s, model, trainer


def measure_igcn(ds, batch_size=2048, n_steps=30):
    """IGCN flagship step throughput (BPR + aux BPR + annealed feat SpMM +
    in-layout feature dropout)."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import IGCNTrainer

    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
        },
        ds,
    )
    trainer = IGCNTrainer(
        {
            "name": "IGCNTrainer",
            "optimizer": "Adam",
            "lr": 1e-3,
            "l2_reg": 1e-4,
            "aux_reg": 0.01,
            "n_epochs": 1,
            "batch_size": batch_size,
            "test_batch_size": 512,
            "topks": [20],
        },
        ds,
        model,
    )

    def one_step():
        trainer.params, trainer.opt_state, loss = trainer._step(
            trainer.params,
            trainer.opt_state,
            trainer.model.buffers,
            trainer.sampler,
            trainer.aux_sampler,
            trainer._next_seed(),
        )
        return loss

    dt, loss = _time_steps(one_step, n_steps)
    ex_s = n_steps * batch_size / dt
    _log(
        f"# igcn: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | "
        f"loss={loss:.4f}"
    )
    return ex_s, model, trainer


def _one_step_fn(trainer, with_aux):
    def one_step():
        args = [
            trainer.params,
            trainer.opt_state,
            trainer.model.buffers,
            trainer.sampler,
        ]
        if with_aux:
            args.append(trainer.aux_sampler)
        args.append(trainer._next_seed())
        trainer.params, trainer.opt_state, loss = trainer._step(*args)
        return loss

    return one_step


def _base_tcfg(name, batch_size, **kw):
    cfg = {
        "name": name,
        "optimizer": "Adam",
        "lr": 1e-3,
        "l2_reg": 1e-4,
        "n_epochs": 1,
        "batch_size": batch_size,
        "test_batch_size": 512,
        "topks": [20],
    }
    cfg.update(kw)
    return cfg


def measure_att_igcn(ds, batch_size=2048, n_steps=30):
    """AttIGCN step throughput (attention-weighted inductive layer: q/k
    projections, per-edge softmax, weighted SpMM — the round-2 flagship)."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import IGCNTrainer

    model = get_model(
        {
            "name": "AttIGCN",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.0,
            "feature_ratio": 1.0,
        },
        ds,
    )
    trainer = IGCNTrainer(
        _base_tcfg("IGCNTrainer", batch_size, aux_reg=0.01), ds, model
    )
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=True), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# att_igcn: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_dose_aug(ds, batch_size=2048, n_steps=30, aug_num=500000):
    """DOSE_aug step throughput at the Gowalla grid's aug_num=500000 (BPR +
    aux + InfoNCE over the injected-view propagation — the contrastive
    flagship); ``--scale`` passes the Amazon grid's 800000."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import DOSEaugTrainer

    model = get_model(
        {
            "name": "DOSE_aug",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
            "aug_num": aug_num,
            "aug_rate": 0.1,
        },
        ds,
    )
    trainer = DOSEaugTrainer(
        _base_tcfg(
            "DOSEaugTrainer", batch_size, aux_reg=0.01, contrastive_reg=0.01
        ),
        ds,
        model,
    )
    # STEADY-STATE step: regenerate the view once (as every epoch end does)
    # so the injected-pair delta is real — the construction-time view has an
    # all-zero delta (degenerate gathers/scatter of row 0), which measures
    # ~25% faster than what epochs actually pay
    model.feat_mat_anneal()
    model.update_aug_adj(trainer.params)
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=True), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# dose_aug: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_dose_aug2(ds, batch_size=2048, n_steps=30, aug_num=500000):
    """DOSE_aug2 step throughput (the aug-FEATURE-matrix variant: the view
    branch reads a per-epoch rebuilt aug feat base + the chunked
    injected-entry delta), steady state."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import DOSEaugTrainer

    model = get_model(
        {
            "name": "DOSE_aug2",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
            "aug_num": aug_num,
            "aug_rate": 0.1,
        },
        ds,
    )
    trainer = DOSEaugTrainer(
        _base_tcfg(
            "DOSEaugTrainer", batch_size, aux_reg=0.01, contrastive_reg=0.01
        ),
        ds,
        model,
    )
    model.feat_mat_anneal()
    model.update_aug_adj(trainer.params)
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=True), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# dose_aug2: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_sgl(ds, batch_size=2048, n_steps=30):
    """SGL step throughput (two drop-view propagations + InfoNCE)."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import SGLTrainer

    model = get_model(
        {
            "name": "SGL",
            "embedding_size": 64,
            "n_layers": 3,
            "aug_rate": 0.8,
        },
        ds,
    )
    trainer = SGLTrainer(
        _base_tcfg("SGLTrainer", batch_size, contrastive_reg=0.05), ds, model
    )
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=False), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# sgl: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_edge_s1(ds, batch_size=2048, n_steps=30):
    """Edge-mode BPR step at S=1 — the measurable sharding tax on one chip
    (stacked layout + shard_map dispatch; the collectives degenerate)."""
    from inductive_recommendation_tpu import get_model, get_trainer
    from inductive_recommendation_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=1)
    model = get_model({"name": "LightGCN", "embedding_size": 64, "n_layers": 3}, ds)
    trainer = get_trainer(
        _base_tcfg("BPRTrainer", batch_size), ds, model, mesh=mesh, mesh_mode="edge"
    )

    def one_step():
        with mesh:
            trainer.params, trainer.opt_state, loss = trainer._run_step(
                trainer._next_seed()
            )
        return loss

    dt, loss = _time_steps(one_step, n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# edge_s1: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_ngcf(ds, batch_size=2048, n_steps=30):
    """NGCF step throughput (per-layer SpMM + gc/bi linears + leaky-relu +
    L2 normalization; reference model.py:3986-4055, Gowalla grid params)."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import BPRTrainer

    model = get_model(
        {
            "name": "NGCF",
            "embedding_size": 64,
            "layer_sizes": [64, 64, 64],
            "dropout": 0.1,
        },
        ds,
    )
    trainer = BPRTrainer(_base_tcfg("BPRTrainer", batch_size), ds, model)
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=False), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# ngcf: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_imcgae(ds, batch_size=2048, n_steps=30):
    """IMCGAE step throughput (3d-wide personal+general+identical concat,
    decayed node dropout, sum-combine; Gowalla grid params)."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import BPRTrainer

    model = get_model(
        {"name": "IMCGAE", "embedding_size": 64, "n_layers": 3, "dropout": 0.3},
        ds,
    )
    trainer = BPRTrainer(_base_tcfg("BPRTrainer", batch_size), ds, model)
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=False), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# imcgae: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_idcf(ds, batch_size=2048, n_steps=30):
    """IDCF_LGCN step throughput (4-head attention over sampled key users /
    items on the frozen table + 3-layer propagation + logsumexp contrastive;
    Gowalla grid params, random frozen table standing in for lgcn.pth)."""
    import numpy as np

    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import IDCFTrainer

    rng = np.random.default_rng(7)
    frozen = rng.standard_normal((ds.n_users + ds.n_items, 64)).astype(np.float32)
    model = get_model(
        {
            "name": "IDCF_LGCN",
            "embedding_size": 64,
            "n_layers": 3,
            "n_headers": 4,
            "pretrained_embedding": frozen,
        },
        ds,
    )
    trainer = IDCFTrainer(
        _base_tcfg("IDCFTrainer", batch_size, contrastive_reg=1e-3), ds, model
    )
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=False), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# idcf: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_mf(ds, batch_size=2048, n_steps=50):
    """MF step throughput (pure embedding-gather BPR, no propagation —
    reference model.py:64-96; Gowalla grid params)."""
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import BPRTrainer

    model = get_model({"name": "MF", "embedding_size": 64}, ds)
    trainer = BPRTrainer(_base_tcfg("BPRTrainer", batch_size, lr=1e-4), ds, model)
    dt, loss = _time_steps(_one_step_fn(trainer, with_aux=False), n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# mf: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_multivae(ds, batch_size=512, n_steps=30):
    """MultiVAE step throughput in users/s (dense [B, n_items] profile
    in + scores out through the encoder/decoder MLP; Gowalla grid params:
    layers [64, 32], dropout 0.7, kl_reg 0.2, batch 512)."""
    import jax.numpy as jnp
    import numpy as np

    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import MLTrainer

    model = get_model(
        {"name": "MultiVAE", "layer_sizes": [64, 32], "dropout": 0.7}, ds
    )
    trainer = MLTrainer(
        _base_tcfg("MLTrainer", batch_size, kl_reg=0.2), ds, model
    )
    rng = np.random.default_rng(3)
    users = jnp.asarray(rng.integers(0, ds.n_users, batch_size))
    valid = jnp.ones(batch_size, jnp.float32)
    kl_reg_t = np.float32(0.2)

    def one_step():
        trainer.params, trainer.opt_state, loss = trainer._step(
            trainer.params,
            trainer.opt_state,
            trainer.model.buffers,
            users,
            valid,
            kl_reg_t,
            trainer._next_seed(),
        )
        return loss

    dt, loss = _time_steps(one_step, n_steps)
    users_s = n_steps * batch_size / dt
    _log(
        f"# multivae: {n_steps} steps in {dt:.3f}s | {users_s:,.0f} users/s | "
        f"loss={loss:.4f}"
    )
    return users_s


def measure_neumf(ds, batch_size=2048, n_steps=50):
    """NeuMF fused-arch step throughput (GMF ++ MLP tower, softplus BCE on
    1 positive + 4 negatives per example; reference model.py:4411-4471,
    trainer.py:564-607; Gowalla grid params with neg_ratio=4)."""
    import jax

    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import BCETrainer

    model = get_model(
        {"name": "NeuMF", "embedding_size": 64, "layer_sizes": [64, 64, 64]}, ds
    )
    saved_ratio = ds.negative_sample_ratio
    ds.negative_sample_ratio = 4
    try:
        trainer = BCETrainer(
            _base_tcfg(
                "BCETrainer",
                batch_size,
                l2_reg=1e-3,
                mf_pretrain_epochs=0,
                mlp_pretrain_epochs=0,
            ),
            ds,
            model,
        )
    finally:
        ds.negative_sample_ratio = saved_ratio
    # jump straight to the final fused phase — the most expensive arch
    # (the gmf/mlp pretrain phases are strict subsets of its compute)
    model.arch = "neumf"
    trainer.params = model.init_mlp_layers(
        trainer.params, jax.random.key(trainer.seed + 7)
    )
    trainer.opt_state = trainer.optimizer.init(trainer.params)
    step = trainer._make_step("neumf")

    def one_step():
        trainer.params, trainer.opt_state, loss = step(
            trainer.params, trainer.opt_state, trainer.sampler, trainer._next_seed()
        )
        return loss

    dt, loss = _time_steps(one_step, n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# neumf: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_itemknn(ds):
    """ItemKNN: similarity BUILD seconds (blockwise Jaccard top-k on device
    — the reference's CPU loop over scipy rows, model.py:4072-4080, replaced)
    + full-catalog eval users/s through the bucketed similarity SpMM.
    Gowalla grid k=1000."""
    from inductive_recommendation_tpu.eval.evaluator import Evaluator
    from inductive_recommendation_tpu.models import get_model

    t0 = time.perf_counter()
    model = get_model({"name": "ItemKNN", "k": 1000}, ds)
    build_s = time.perf_counter() - t0
    ev = Evaluator(ds, [20, 50, 100], test_batch_size=512)
    ev.evaluate(model, {}, "val")  # warm (compile)
    t0 = time.perf_counter()
    ev.evaluate(model, {}, "val")
    users_s = ds.n_users / (time.perf_counter() - t0)
    _log(f"# itemknn: build {build_s:.2f}s | eval {users_s:,.0f} users/s")
    return build_s, users_s


def measure_popularity(ds):
    """Popularity: full-catalog eval users/s (degree broadcast + exclusion +
    top-k — measures the eval machinery floor; reference model.py:4091-4104)."""
    from inductive_recommendation_tpu.eval.evaluator import Evaluator
    from inductive_recommendation_tpu.models import get_model

    model = get_model({"name": "Popularity"}, ds)
    ev = Evaluator(ds, [20, 50, 100], test_batch_size=512)
    ev.evaluate(model, {}, "val")  # warm (compile)
    t0 = time.perf_counter()
    ev.evaluate(model, {}, "val")
    users_s = ds.n_users / (time.perf_counter() - t0)
    _log(f"# popularity: eval {users_s:,.0f} users/s")
    return users_s


def measure_edge_s1_igcn(ds, batch_size=2048, n_steps=30):
    """Edge-mode IGCN step at S=1: the sharding tax for the family with the
    per-epoch annealed feat scale + aux sampler restructuring (the round-3
    -1.4% headline came from BPR, the family with the LEAST restructuring)."""
    from inductive_recommendation_tpu import get_model, get_trainer
    from inductive_recommendation_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=1)
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
        },
        ds,
    )
    trainer = get_trainer(
        _base_tcfg("IGCNTrainer", batch_size, aux_reg=0.01),
        ds, model, mesh=mesh, mesh_mode="edge",
    )

    def one_step():
        with mesh:
            trainer.params, trainer.opt_state, loss = trainer._run_step(
                trainer._next_seed()
            )
        return loss

    dt, loss = _time_steps(one_step, n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# edge_s1_igcn: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_edge_s1_dose(ds, batch_size=2048, n_steps=30, aug_num=500000):
    """Edge-mode DOSE_aug step at S=1, STEADY STATE (view regenerated once so
    the injected-pair delta is real): the sharding tax for the family with
    the MOST edge-mode restructuring (stacked scales, per-epoch prepare_view
    re-indexing, delta COO outside the shard_map)."""
    from inductive_recommendation_tpu import get_model, get_trainer
    from inductive_recommendation_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=1)
    model = get_model(
        {
            "name": "DOSE_aug",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
            "aug_num": aug_num,
            "aug_rate": 0.1,
        },
        ds,
    )
    trainer = get_trainer(
        _base_tcfg("DOSEaugTrainer", batch_size, aux_reg=0.01, contrastive_reg=0.01),
        ds, model, mesh=mesh, mesh_mode="edge",
    )
    with mesh:
        model.feat_mat_anneal()
        model.update_aug_adj(trainer.params)
        trainer._refresh_views()

    def one_step():
        with mesh:
            trainer.params, trainer.opt_state, loss = trainer._run_step(
                trainer._next_seed()
            )
        return loss

    dt, loss = _time_steps(one_step, n_steps)
    ex_s = n_steps * batch_size / dt
    _log(f"# edge_s1_dose: {n_steps} steps in {dt:.3f}s | {ex_s:,.0f} ex/s | loss={loss:.4f}")
    return ex_s


def measure_eval(ds, model, params):
    """Full-catalog evaluation throughput (users/s, warm)."""
    from inductive_recommendation_tpu.eval.evaluator import Evaluator

    ev = Evaluator(ds, [20, 50, 100], test_batch_size=512)
    ev.evaluate(model, params, "val")  # warm (compile)
    t0 = time.perf_counter()
    _, metrics = ev.evaluate(model, params, "val")
    dt = time.perf_counter() - t0
    users_s = ds.n_users / dt
    _log(f"# eval: {dt:.3f}s warm | {users_s:,.0f} users/s | metrics ok")
    return users_s


def measure_spmm(model, d=64, n_iters=30):
    """Single full-graph SpMM (the hot kernel) + %SoL accounting."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inductive_recommendation_tpu.ops import spmm_bucketed
    from inductive_recommendation_tpu.ops.sol import spmm_cost

    mat = model.buffers["norm_adj"]
    n = model.n_users + model.n_items
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, d)), jnp.float32)
    fn = jax.jit(spmm_bucketed)
    float(jnp.sum(fn(mat, x)))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(mat, x)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_iters
    rep = spmm_cost(mat, d).report(dt)
    _log(
        f"# spmm: {rep['measured_ms']:.2f} ms | "
        f"{rep['pct_sol_random_gather']:.1f}% of random-gather SoL | "
        f"{rep['pct_sol_sequential']:.1f}% of sequential SoL"
    )
    return rep


def _make_amazon_dataset():
    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset

    # Amazon-Books scale, DENSITY-MATCHED since r5: raw count tuned so the
    # directed train nnz lands on the reference's ~5.98M (the r1-r4 runs
    # used 4.8M raw -> 7.14M directed, ~19% denser than the real dataset;
    # BENCH_SCALE_r04 and earlier describe that denser graph)
    return quick_synthetic_dataset(52643, 91599, 4_000_000, seed=0)


def _make_yelp_dataset():
    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset

    # Yelp2018 scale (31.7k users, 38.0k items, ~2.95M directed train nnz —
    # raw count tuned by the Amazon tier's directed/raw ratio ~1.49)
    return quick_synthetic_dataset(31668, 38048, 1_980_000, seed=0)


def _make_alibaba_dataset():
    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset

    # Alibaba-iFashion public-subset scale (300k users, 81.6k items, ~1.61M
    # interactions — the reference repo records no stats for its
    # data/alibaba/time path; this is the subset the public literature
    # uses). A node-heavy/edge-light regime: 381.6k nodes but only ~2.4M
    # directed train nnz (avg degree ~6)
    return quick_synthetic_dataset(300_000, 81_614, 1_630_000, seed=0)


def _make_ml_dataset():
    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset

    # MovieLens-1M scale (6040 users, 3706 items, ~1.0M ratings; raw tuned
    # to ~1.02M unique pairs). The smallest grid tier: 4.5% dense
    return quick_synthetic_dataset(6040, 3706, 1_400_000, seed=0)


def _release_device_memory():
    """Drop everything the previous measure pinned on the chip: python refs
    (trainers/models/layouts) via gc, then every compiled executable + its
    cached constants via jax.clear_caches(). The tunneled pool chip has a
    bounded per-user allocation — without this, the Amazon-scale DOSE
    construction OOMs on leftovers from the BPR/IGCN measures."""
    import gc

    import jax

    gc.collect()
    jax.clear_caches()
    gc.collect()


# tier -> (dataset factory, DOSE aug_num, artifact stem). aug_num follows
# each tier's grid flagship: 800k (Yelp grid; kept for Amazon too for
# cross-tier comparability), 500k (the Gowalla-style grid Alibaba uses),
# 100k for the small ML-1M catalog
SCALE_TIERS = {
    "amazon": (_make_amazon_dataset, 800_000, "BENCH_SCALE"),
    "yelp": (_make_yelp_dataset, 800_000, "BENCH_SCALE_YELP"),
    "alibaba": (_make_alibaba_dataset, 500_000, "BENCH_SCALE_ALIBABA"),
    "ml": (_make_ml_dataset, 100_000, "BENCH_SCALE_ML"),
}


def run_scale(round_no, tier="amazon"):
    """Graph-size tiers beyond Gowalla: ``--scale`` = Amazon
    (density-matched to the reference's ~5.98M directed nnz since r5),
    ``--scale-yelp`` = Yelp2018, ``--scale-alibaba`` = Alibaba-iFashion
    (node-heavy regime), ``--scale-ml`` = MovieLens-1M.
    Measures the flagship steps, full-catalog eval and the edge-mode S=1
    memory-path tax; writes {stem}_r{N}.json. Each row runs with a clean
    device (see _release_device_memory); a row that still exhausts the pool
    records null + the reason instead of killing the artifact."""
    import numpy as np

    make_ds, dose_aug, stem = SCALE_TIERS[tier]
    ds = make_ds()
    nnz = 2 * sum(len(t) for t in ds.train_data)
    _log(f"# scale: {ds.n_users} x {ds.n_items}, {nnz/1e6:.2f}M directed train nnz")

    def guarded(name, fn):
        _release_device_memory()
        try:
            return fn()
        except Exception as e:  # pragma: no cover - depends on pool state
            _log(f"# {name}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            return None

    bpr_res = guarded("bpr", lambda: measure_bpr(ds))
    bpr_ex_s = bpr_res[0] if bpr_res else None
    # full-catalog serving throughput at THIS tier's catalog size (the
    # -inf exclusion buckets + top-k merge at the scale they exist for)
    eval_users_s = (
        guarded(
            "eval", lambda: measure_eval(ds, bpr_res[1], bpr_res[2].params)
        )
        if bpr_res
        else None
    )
    bpr_res = None  # drop the model/trainer before the next tier's build
    igcn_ex_s = guarded("igcn", lambda: measure_igcn(ds)[0])
    dose_ex_s = guarded("dose", lambda: measure_dose_aug(ds, aug_num=dose_aug))
    edge_s1_ex_s = guarded("edge_s1", lambda: measure_edge_s1(ds))

    def rnd(v):
        return round(v, 1) if v is not None else None

    payload = {
        "scale": f"{ds.n_users}x{ds.n_items}",
        "directed_train_nnz": int(nnz),
        "bpr_train_examples_per_s_per_chip": rnd(bpr_ex_s),
        "eval_users_per_s": rnd(eval_users_s),
        "igcn_train_examples_per_s_per_chip": rnd(igcn_ex_s),
        f"dose_aug{dose_aug // 1000}k_train_examples_per_s_per_chip": rnd(
            dose_ex_s
        ),
        "edge_mode_s1_bpr_examples_per_s_per_chip": rnd(edge_s1_ex_s),
        "edge_mode_s1_overhead_pct": (
            round(100.0 * (bpr_ex_s / edge_s1_ex_s - 1.0), 1)
            if bpr_ex_s and edge_s1_ex_s
            else None
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"{stem}_r{round_no:02d}.json",
    )
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    _log(f"# scale -> {out}: {json.dumps(payload)}")


def main():
    detail = "--detail" in sys.argv
    round_no = _next_round()

    for flag, tier in (
        ("--scale-yelp", "yelp"),
        ("--scale-alibaba", "alibaba"),
        ("--scale-ml", "ml"),
        ("--scale", "amazon"),
    ):
        if flag in sys.argv:
            run_scale(round_no, tier=tier)
            return

    ds = _make_dataset()
    bpr_ex_s, lgcn_model, lgcn_trainer = measure_bpr(ds)

    if detail:
        spmm_rep = measure_spmm(lgcn_model)
        eval_users_s = measure_eval(ds, lgcn_model, lgcn_trainer.params)
        igcn_ex_s, _, _ = measure_igcn(ds)
        att_ex_s = measure_att_igcn(ds)
        dose_ex_s = measure_dose_aug(ds)
        dose2_ex_s = measure_dose_aug2(ds)
        sgl_ex_s = measure_sgl(ds)
        ngcf_ex_s = measure_ngcf(ds)
        imcgae_ex_s = measure_imcgae(ds)
        idcf_ex_s = measure_idcf(ds)
        mf_ex_s = measure_mf(ds)
        multivae_users_s = measure_multivae(ds)
        neumf_ex_s = measure_neumf(ds)
        itemknn_build_s, itemknn_eval_users_s = measure_itemknn(ds)
        popularity_eval_users_s = measure_popularity(ds)
        edge_s1_ex_s = measure_edge_s1(ds)
        edge_s1_igcn_ex_s = measure_edge_s1_igcn(ds)
        edge_s1_dose_ex_s = measure_edge_s1_dose(ds)
        payload = {
            "bpr_train_examples_per_s_per_chip": round(bpr_ex_s, 1),
            "igcn_train_examples_per_s_per_chip": round(igcn_ex_s, 1),
            "att_igcn_train_examples_per_s_per_chip": round(att_ex_s, 1),
            "dose_aug_train_examples_per_s_per_chip": round(dose_ex_s, 1),
            "dose_aug2_train_examples_per_s_per_chip": round(dose2_ex_s, 1),
            "sgl_train_examples_per_s_per_chip": round(sgl_ex_s, 1),
            "ngcf_train_examples_per_s_per_chip": round(ngcf_ex_s, 1),
            "imcgae_train_examples_per_s_per_chip": round(imcgae_ex_s, 1),
            "idcf_train_examples_per_s_per_chip": round(idcf_ex_s, 1),
            "mf_train_examples_per_s_per_chip": round(mf_ex_s, 1),
            "multivae_train_users_per_s_per_chip": round(multivae_users_s, 1),
            "neumf_train_examples_per_s_per_chip": round(neumf_ex_s, 1),
            "itemknn_similarity_build_s": round(itemknn_build_s, 2),
            "itemknn_eval_users_per_s": round(itemknn_eval_users_s, 1),
            "popularity_eval_users_per_s": round(popularity_eval_users_s, 1),
            "edge_mode_s1_bpr_examples_per_s_per_chip": round(edge_s1_ex_s, 1),
            # the single-chip sharding tax: edge-mode S=1 vs the plain step
            "edge_mode_s1_overhead_pct": round(
                100.0 * (bpr_ex_s / max(edge_s1_ex_s, 1e-9) - 1.0), 1
            ),
            "edge_mode_s1_igcn_examples_per_s_per_chip": round(
                edge_s1_igcn_ex_s, 1
            ),
            "edge_mode_s1_igcn_overhead_pct": round(
                100.0 * (igcn_ex_s / max(edge_s1_igcn_ex_s, 1e-9) - 1.0), 1
            ),
            "edge_mode_s1_dose_examples_per_s_per_chip": round(
                edge_s1_dose_ex_s, 1
            ),
            "edge_mode_s1_dose_overhead_pct": round(
                100.0 * (dose_ex_s / max(edge_s1_dose_ex_s, 1e-9) - 1.0), 1
            ),
            "eval_users_per_s": round(eval_users_s, 1),
            "spmm_ms": round(spmm_rep["measured_ms"], 3),
            "spmm_pct_sol_random_gather": round(
                spmm_rep["pct_sol_random_gather"], 1
            ),
            "spmm_pct_sol_sequential": round(spmm_rep["pct_sol_sequential"], 1),
        }
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"BENCH_DETAIL_r{round_no:02d}.json",
        )
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)
        _log(f"# detail -> {out}: {json.dumps(payload)}")

    base = _baseline_value()
    result = {
        "metric": "bpr_train_examples_per_s_per_chip",
        "value": round(bpr_ex_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(bpr_ex_s / base, 3) if base else 1.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
