"""Benchmark: BPR training throughput (examples/s/chip) on a Gowalla-scale
synthetic graph, LightGCN 3-layer d=64, full-graph SpMM per step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
            value = payload.get("value")
            if isinstance(payload, dict) and isinstance(value, (int, float)):
                runs.append((int(m.group(1)), float(value)))
        except (OSError, ValueError):
            continue
    if not runs:
        return None
    return min(runs)[1]


def main():
    import jax

    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train.trainer import BPRTrainer

    # Gowalla scale (≈29.9k users, 41.0k items, ≈1.03M interactions)
    ds = quick_synthetic_dataset(29858, 40981, 1_200_000, seed=0)
    n_edges = len(ds.train_array)
    model = get_model({"name": "LightGCN", "embedding_size": 64, "n_layers": 3}, ds)

    batch_size = 2048
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

    # warmup (compile); scalar fetch forces execution — on tunneled remote
    # backends block_until_ready alone does not synchronize
    for _ in range(3):
        loss = one_step()
    float(loss)

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss = one_step()
    float(loss)
    dt = time.perf_counter() - t0

    examples_per_s = n_steps * batch_size / dt
    print(
        f"# {n_steps} steps in {dt:.3f}s | {examples_per_s:,.0f} ex/s | "
        f"edges={n_edges} devices={jax.devices()} loss={float(loss):.4f}",
        file=sys.stderr,
    )
    base = _baseline_value()
    result = {
        "metric": "bpr_train_examples_per_s_per_chip",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / base, 3) if base else 1.0,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
