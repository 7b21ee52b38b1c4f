"""SpMM kernel benchmark + speed-of-light report on the current backend.

Usage: python benchmarks/spmm_bench.py [n_users n_items n_inter d]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
from inductive_recommendation_tpu.graph import sym_normalized_adjacency
from inductive_recommendation_tpu.ops import build_bucketed_spmm, spmm_bucketed
from inductive_recommendation_tpu.ops.sol import spmm_cost


def main(argv):
    n_users, n_items, n_inter, d = 29858, 40981, 1_200_000, 64
    if len(argv) >= 4:
        n_users, n_items, n_inter = map(int, argv[:3])
        d = int(argv[3]) if len(argv) > 3 else 64
    ds = quick_synthetic_dataset(n_users, n_items, n_inter, seed=0)
    row, col, val = sym_normalized_adjacency(ds.train_array, n_users, n_items)
    n = n_users + n_items
    mat = build_bucketed_spmm(row, col, val, (n, n), symmetric=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, d)).astype(np.float32))

    fwd = jax.jit(lambda x: spmm_bucketed(mat, x))
    out = fwd(x)
    float(jnp.sum(out))
    n_it = 30
    t0 = time.perf_counter()
    for _ in range(n_it):
        out = fwd(x)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_it

    cost = spmm_cost(mat, d)
    report = cost.report(dt)
    print(f"devices: {jax.devices()}")
    for k, v in report.items():
        print(f"{k:26s} {v:,.2f}" if isinstance(v, float) else f"{k:26s} {v:,}")


if __name__ == "__main__":
    main(sys.argv[1:])
