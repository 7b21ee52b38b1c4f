"""Benchmark: BPR training throughput (examples/s/chip) on a Gowalla-scale
synthetic graph, LightGCN 3-layer d=64, full-graph SpMM per step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (the driver
contract). Diagnostics go to stderr.

``--detail`` additionally measures the north-star metrics — IGCN flagship
step throughput, full-catalog eval users/s, single-SpMM %SoL — and writes
them to ``BENCH_DETAIL_r{N}.json`` so round-over-round deltas are
machine-checkable (run manually on the real chip; the default driver run
stays single-metric and bounded).

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
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [0]
    for pat in ("BENCH_r*.json", "BENCH_DETAIL_r*.json"):
        for path in glob.glob(os.path.join(here, pat)):
            m = re.search(r"_r(\d+)\.json$", path)
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


def main():
    detail = "--detail" in sys.argv

    ds = _make_dataset()
    bpr_ex_s, lgcn_model, lgcn_trainer = measure_bpr(ds)

    if detail:
        spmm_rep = measure_spmm(lgcn_model)
        eval_users_s = measure_eval(ds, lgcn_model, lgcn_trainer.params)
        igcn_ex_s, _, _ = measure_igcn(ds)
        payload = {
            "bpr_train_examples_per_s_per_chip": round(bpr_ex_s, 1),
            "igcn_train_examples_per_s_per_chip": round(igcn_ex_s, 1),
            "eval_users_per_s": round(eval_users_s, 1),
            "spmm_ms": round(spmm_rep["measured_ms"], 3),
            "spmm_pct_sol_random_gather": round(
                spmm_rep["pct_sol_random_gather"], 1
            ),
            "spmm_pct_sol_sequential": round(spmm_rep["pct_sol_sequential"], 1),
        }
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            f"BENCH_DETAIL_r{_next_round():02d}.json",
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
