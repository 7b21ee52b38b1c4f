"""Breakdown profile of the IGCN flagship training step on the real chip.

Locates where the ~115 ms step (vs ~52 ms LightGCN) goes: feature-matrix
SpMM, annealed edge-scale construction, dropout, aux loss. Also measures a
variant with the annealed weights precomputed per EPOCH (they only change at
feat_mat_anneal) instead of per step. Diagnostics only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.data.dataset import (
    AuxiliaryDataset,
    quick_synthetic_dataset,
)
from inductive_recommendation_tpu.data.sampling import (
    build_sampler_state,
    sample_bpr_batch,
)
from inductive_recommendation_tpu.models import get_model
from inductive_recommendation_tpu.ops import propagate_mean, spmm_bucketed
from inductive_recommendation_tpu.ops.dropout import sparse_dropout
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
    batch_size = 2048
    buffers = model.buffers
    params = model.init_params(jax.random.key(0))
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    feat_nnz = buffers["feat"].nnz
    print(
        f"feat nnz={feat_nnz} adj nnz={buffers['norm_adj'].nnz}", file=sys.stderr
    )

    x = jnp.zeros((ds.n_users + ds.n_items, 64), jnp.float32) + 0.01

    # 1. the RETIRED [nnz]-vector edge-scale construction (power + gather),
    # kept inline for comparison against the baked path
    def legacy_scale(b, seed):
        expo = (b["alpha"] - 1.0) / 2.0 - 0.5
        scale = jnp.power(b["feat_row_sum"][b["feat_row"]], expo)
        return sparse_dropout(
            scale, jax.random.fold_in(jax.random.key(1), seed), 0.3, True
        )

    es = jax.jit(legacy_scale)
    t = timeit(lambda: es(buffers, jnp.int32(3)))
    print(f"feat edge scale (power+drop): {t*1e3:8.2f} ms", file=sys.stderr)

    # 2. feat SpMM fwd with edge scale
    def feat_fwd(p, b, seed):
        return model.inductive_rep_layer(
            p, b, rng=jax.random.fold_in(jax.random.key(1), seed), training=True
        )

    ff = jax.jit(feat_fwd)
    t = timeit(lambda: ff(params, buffers, jnp.int32(3)))
    print(f"inductive_rep_layer fwd:      {t*1e3:8.2f} ms", file=sys.stderr)

    # 3. feat SpMM fwd WITHOUT edge scale
    nf = jax.jit(
        lambda p, b: spmm_bucketed(b["feat"], p["embedding"][: model.feat_n_cols])
    )
    t = timeit(lambda: nf(params, buffers))
    print(f"feat SpMM fwd (no scale):     {t*1e3:8.2f} ms", file=sys.stderr)

    # 4. full get_rep fwd (training)
    gr = jax.jit(
        lambda p, b, seed: model.get_rep(
            p, rng=jax.random.fold_in(jax.random.key(1), seed), training=True, buffers=b
        )
    )
    t = timeit(lambda: gr(params, buffers, jnp.int32(3)))
    print(f"get_rep fwd (training):       {t*1e3:8.2f} ms", file=sys.stderr)

    # 5. main loss fwd+bwd
    def loss_fn(p, b, seed):
        rng = jax.random.fold_in(jax.random.key(0), seed)
        rng_s, rng_m = jax.random.split(rng)
        users, pos, neg = sample_bpr_batch(sampler, rng_s, batch_size)
        u, pr, nr, l2 = model.bpr_forward(
            p, users, pos, neg[:, 0], rng=rng_m, training=True, buffers=b
        )
        return L.bpr_loss(u, pr, nr) + 1e-4 * l2.mean()

    g = jax.jit(jax.grad(loss_fn))
    t = timeit(lambda: g(params, buffers, jnp.int32(3)))
    print(f"main loss fwd+bwd:            {t*1e3:8.2f} ms", file=sys.stderr)

    # 6. main + aux loss fwd+bwd (the IGCNTrainer loss)
    def full_loss(p, b, seed):
        rng = jax.random.fold_in(jax.random.key(0), seed)
        rng_s, rng_a, rng_m = jax.random.split(rng, 3)
        users, pos, neg = sample_bpr_batch(sampler, rng_s, batch_size)
        au, ap, an = sample_bpr_batch(aux_sampler, rng_a, batch_size)
        u, pr, nr, l2 = model.bpr_forward(
            p, users, pos, neg[:, 0], rng=rng_m, training=True, buffers=b
        )
        emb, w = p["embedding"], p["w"]
        pos_s = jnp.sum(emb[au] * emb[model.user_dim + ap] * w[None], axis=1)
        neg_s = jnp.sum(emb[au] * emb[model.user_dim + an[:, 0]] * w[None], axis=1)
        aux_l = jnp.mean(jax.nn.softplus(neg_s - pos_s))
        return L.bpr_loss(u, pr, nr) + 1e-4 * l2.mean() + 0.01 * aux_l

    g2 = jax.jit(jax.grad(full_loss))
    t = timeit(lambda: g2(params, buffers, jnp.int32(3)))
    print(f"main+aux loss fwd+bwd:        {t*1e3:8.2f} ms", file=sys.stderr)

    # 7. variant: annealed weights precomputed per epoch; per-step only drops
    annealed = jax.jit(
        lambda b: jnp.power(
            b["feat_row_sum"][b["feat_row"]], (b["alpha"] - 1.0) / 2.0 - 0.5
        )
    )(buffers)

    def loss_pre(p, b, ann, seed):
        rng = jax.random.fold_in(jax.random.key(0), seed)
        rng_s, rng_m = jax.random.split(rng)
        users, pos, neg = sample_bpr_batch(sampler, rng_s, batch_size)
        scale = sparse_dropout(ann, rng_m, 0.3, training=True)
        x0 = spmm_bucketed(
            b["feat"], p["embedding"][: model.feat_n_cols], edge_scale=scale
        )
        rep = propagate_mean(b["norm_adj"], x0, 3)
        u = rep[users]
        pr = rep[ds.n_users + pos]
        nr = rep[ds.n_users + neg[:, 0]]
        l2 = (u * u).sum(1) + (pr * pr).sum(1) + (nr * nr).sum(1)
        return L.bpr_loss(u, pr, nr) + 1e-4 * l2.mean()

    g3 = jax.jit(jax.grad(loss_pre))
    t = timeit(lambda: g3(params, buffers, annealed, jnp.int32(3)))
    print(f"loss fwd+bwd (pre-annealed):  {t*1e3:8.2f} ms", file=sys.stderr)

    print(f"devices: {jax.devices()}", file=sys.stderr)


if __name__ == "__main__":
    main()
