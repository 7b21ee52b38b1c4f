"""Breakdown profile of the bench.py LightGCN BPR step on the real chip.

Times each component of the step separately (sampler, forward rep, full
loss fwd, full step) to locate non-SpMM overhead. Diagnostics only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
from inductive_recommendation_tpu.data.sampling import build_sampler_state, sample_bpr_batch
from inductive_recommendation_tpu.models import get_model
from inductive_recommendation_tpu.ops import propagate_mean, spmm_bucketed
from inductive_recommendation_tpu.train.trainer import BPRTrainer
from inductive_recommendation_tpu.train import losses as L


def timeit(fn, n=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x)) if hasattr(x, "dtype") else x, out
    )
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x)) if hasattr(x, "dtype") else x, out
    )
    return (time.perf_counter() - t0) / n


def main():
    ds = quick_synthetic_dataset(29858, 40981, 1_200_000, seed=0)
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
    params = trainer.params
    buffers = model.buffers
    sampler = trainer.sampler

    # 1. sampler alone
    samp = jax.jit(
        lambda seed: sample_bpr_batch(
            sampler, jax.random.fold_in(jax.random.key(0), seed), batch_size
        )
    )
    t = timeit(lambda: samp(jnp.int32(7)))
    print(f"sampler alone:            {t*1e3:8.2f} ms", file=sys.stderr)

    # 2. single SpMM fwd
    x = jnp.zeros((ds.n_users + ds.n_items, 64), jnp.float32) + 0.01
    one = jax.jit(lambda a, x: spmm_bucketed(a, x))
    t = timeit(lambda: one(buffers["norm_adj"], x))
    print(f"single SpMM fwd:          {t*1e3:8.2f} ms", file=sys.stderr)

    # 3. 3-layer propagate_mean fwd
    prop = jax.jit(lambda a, e: propagate_mean(a, e, 3))
    t = timeit(lambda: prop(buffers["norm_adj"], x))
    print(f"propagate_mean(3) fwd:    {t*1e3:8.2f} ms", file=sys.stderr)

    # 4. loss fwd only (sampling + rep + bpr)
    def loss_fwd(params, buffers, seed):
        rng = jax.random.fold_in(jax.random.key(0), seed)
        users, pos, neg = sample_bpr_batch(sampler, rng, batch_size)
        u, p, n_, l2 = model.bpr_forward(
            params, users, pos, neg[:, 0], buffers=buffers
        )
        return L.bpr_loss(u, p, n_) + 1e-4 * l2.mean()

    lf = jax.jit(loss_fwd)
    t = timeit(lambda: lf(params, buffers, jnp.int32(3)))
    print(f"loss fwd only:            {t*1e3:8.2f} ms", file=sys.stderr)

    # 5. loss fwd+bwd (no optimizer)
    gf = jax.jit(jax.grad(loss_fwd))
    t = timeit(lambda: gf(params, buffers, jnp.int32(3)))
    print(f"loss fwd+bwd:             {t*1e3:8.2f} ms", file=sys.stderr)

    # 6. full step (fwd+bwd+adam, donated)
    def full():
        trainer.params, trainer.opt_state, loss = trainer._step(
            trainer.params,
            trainer.opt_state,
            buffers,
            sampler,
            trainer._next_seed(),
        )
        return loss

    t = timeit(full)
    print(f"full step:                {t*1e3:8.2f} ms", file=sys.stderr)
    print(f"devices: {jax.devices()}", file=sys.stderr)


if __name__ == "__main__":
    main()
