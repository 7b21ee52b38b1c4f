"""Probe: fuse c SpMM chains that share one bucket layout into ONE gather
pass at width c*d.

Motivation: the hot gathers are transaction-bound and lane-padded — a d=128
row gather of E rows measures the SAME absolute time as d=64 (CLAUDE.md
anchor, re-verified here). DOSE's main + view-base chains (and SGL's three
chains) propagate the IDENTICAL train-edge layout with different per-edge
values, so stacking chains on the feature axis gets chain 2 (and 3) nearly
free. This probe measures the primitive before any integration:

  separate : c x [gather d=64 + einsum]   (today's per-chain cost)
  fused    : 1 x [gather d=c*64, reshape [rows,k,c,d], einsum rkc,rkcd->rcd]

at Gowalla scale (1.8M-nnz sym adjacency), c = 2 and 3, fwd and fwd+bwd.

MEASURED KILL (v5e, 2026-08-21): fused fwd 12.35 ms vs separate 12.76 at
c=2 (1.03x) and 21.43 vs 23.96 at c=3 (1.12x). In the bucketed-SpMM
context the gather is HBM-BANDWIDTH-bound on gathered bytes, not
transaction-bound: 1.86M x 256 B rows / 6.4 ms/chain = ~74 GB/s, already
at the calibrated ~80 GB/s gather bandwidth — so a c*64-wide fused row
costs c times a 64-wide row and the extra chains are NOT free. (The
"d=128 costs the same as d=64" anchor holds for the isolated-gather
microbench where lane padding dominates, not here.) The fwd+bwd fused
columns additionally show autodiff-scatter blowup (56/85 ms) because this
probe has no custom VJP — irrelevant to the verdict; the fwd alone
already kills the idea. A <=12% fwd-side win does not pay for a
multi-chain layout + custom VJP + per-chain dropout plumbing across
DOSE/SGL. Do not integrate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
from inductive_recommendation_tpu.ops.bucketed_spmm import (
    build_bucketed_spmm,
    spmm_bucketed,
)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def apply_multi(side, xs, scales):
    """xs: [n, c, d]; scales: per-chain per-bucket val multiplier lists.
    Fused: one gather of width c*d per bucket."""
    c = xs.shape[1]
    d = xs.shape[2]
    xflat = xs.reshape(xs.shape[0], c * d)
    parts = []
    for bi, b in enumerate(side.buckets):
        v = jnp.stack([b.val * s[bi] for s in scales], axis=-1)  # [rows,k,c]
        g = jnp.take(xflat, b.idx, axis=0).reshape(
            b.idx.shape[0], b.idx.shape[1], c, d
        )
        parts.append(jnp.einsum("rkc,rkcd->rcd", v, g))
    n_have = sum(p.shape[0] for p in parts)
    n_zero = side.n_rows - n_have
    if n_zero > 0:
        parts.append(jnp.zeros((n_zero, c, d), xs.dtype))
    stacked = jnp.concatenate(parts, axis=0)
    return jnp.take(stacked, side.inv_perm, axis=0)  # [n, c, d]


def main():
    ds = quick_synthetic_dataset(29858, 40981, 1_200_000, seed=0)
    r, c_, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
    n = ds.n_users + ds.n_items
    mat = build_bucketed_spmm(r, c_, v, (n, n), symmetric=False)
    print(f"nnz={mat.nnz}", file=sys.stderr)
    rng = np.random.default_rng(0)
    d = 64

    for c in (2, 3):
        xs = jnp.asarray(
            rng.standard_normal((n, c, d)).astype(np.float32)
        )
        # per-chain global multipliers stand in for distinct baked values
        # (same value ARRAYS, different scalars — memory layout identical
        # to per-chain baked copies)
        scales = [
            [np.float32(1.0 + 0.1 * ci)] * len(mat.fwd.buckets)
            for ci in range(c)
        ]

        def sep_fwd(xs):
            return jnp.stack(
                [spmm_bucketed(mat, xs[:, ci, :]) for ci in range(c)], axis=1
            )

        def fus_fwd(xs):
            return apply_multi(mat.fwd, xs, scales)

        sep_j = jax.jit(sep_fwd)
        fus_j = jax.jit(fus_fwd)
        # parity first
        a = np.asarray(sep_j(xs))
        b = np.asarray(fus_j(xs))
        scl = np.array([1.0 + 0.1 * ci for ci in range(c)], np.float32)
        assert np.allclose(a * scl[None, :, None], b, atol=1e-4), (
            np.abs(a * scl[None, :, None] - b).max()
        )

        t_sep = timeit(sep_j, xs)
        t_fus = timeit(fus_j, xs)

        def sep_fb(xs):
            return jax.grad(lambda z: jnp.sum(sep_fwd(z) ** 2))(xs)

        def fus_fb(xs):
            return jax.grad(lambda z: jnp.sum(fus_fwd(z) ** 2))(xs)

        t_sep_fb = timeit(jax.jit(sep_fb), xs)
        t_fus_fb = timeit(jax.jit(fus_fb), xs)
        print(
            f"c={c}: fwd separate {t_sep:7.3f} ms  fused {t_fus:7.3f} ms "
            f"({t_sep / t_fus:.2f}x) | fwd+bwd separate {t_sep_fb:7.3f} ms "
            f"fused {t_fus_fb:7.3f} ms ({t_sep_fb / t_fus_fb:.2f}x)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
