"""Scaling-efficiency harness: sharded IGCN step time across mesh shapes.

On real multi-chip hardware this measures the 1-chip -> N-chip efficiency
the north star targets (>= 0.8); on a single host it can still be exercised
against virtual CPU devices for machinery validation:

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import optax

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


def measure(mesh, model, sampler, aux_sampler, batch_size, n_steps=20):
    optimizer = optax.adam(1e-3)
    params = shard_params(model.init_params(jax.random.key(0)), mesh)
    opt_state = optimizer.init(params)
    step = make_sharded_igcn_step(
        model, optimizer, sampler, aux_sampler, batch_size, 1e-4, 0.01, mesh
    )
    with mesh:
        for i in range(3):
            params, opt_state, loss = step(params, opt_state, jax.random.key(i))
        float(loss)
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, opt_state, loss = step(params, opt_state, jax.random.key(100 + i))
        float(loss)
    return (time.perf_counter() - t0) / n_steps


def main():
    n_dev = len(jax.devices())
    if jax.default_backend() == "cpu":
        print(
            "NOTE: virtual CPU devices share one physical CPU — expect "
            "NEGATIVE scaling here; this mode validates machinery only."
        )
    ds = quick_synthetic_dataset(8192, 8192, 300_000, seed=0)
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.0,
            "feature_ratio": 1,
            "table_align": max(8, n_dev),
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)

    batch = 2048
    base = None
    shapes = []
    d = 1
    while d <= n_dev:
        n_model = 1
        while n_model * 2 <= d and n_model * n_model < d:
            n_model *= 2
        shapes.append((d // n_model, n_model))
        d *= 2
    for n_data, n_model in shapes:
        n = n_data * n_model
        mesh = make_mesh(
            n_data=n_data, n_model=n_model, devices=jax.devices()[:n]
        )
        dt = measure(mesh, model, sampler, aux_sampler, batch)
        ex_s = batch / dt
        if base is None:
            base = ex_s
        eff = ex_s / (base * n)
        print(
            f"mesh {n_data}x{n_model} ({n} dev): {dt*1e3:8.2f} ms/step "
            f"{ex_s:10,.0f} ex/s  scaling-eff {eff:5.2f}"
        )


if __name__ == "__main__":
    main()
