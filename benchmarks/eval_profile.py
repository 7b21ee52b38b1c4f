"""Breakdown profile of full-catalog evaluation on the real chip.

Times scoring matmul, exclusion masking, lax.top_k, and the fused
rec_masked path separately. Diagnostics only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))) if hasattr(x, "dtype") else x,
        out,
    )
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))) if hasattr(x, "dtype") else x,
        out,
    )
    return (time.perf_counter() - t0) / n


def main():
    B, n_items, n_users, d, k = 512, 40981, 29858, 64, 100
    m_excl = 600  # padded exclusion row length (train items per user)
    rng = np.random.default_rng(0)
    users_rep = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    items_rep = jnp.asarray(rng.standard_normal((n_items, d)), jnp.float32)
    excl = jnp.asarray(
        rng.integers(0, n_items + 1, size=(B, m_excl)), jnp.int32
    )
    scores_const = jnp.asarray(rng.standard_normal((B, n_items)), jnp.float32)

    mm = jax.jit(lambda u, i: u @ i.T)
    t = timeit(lambda: mm(users_rep, items_rep))
    print(f"scoring matmul [512x41k]:  {t*1e3:8.2f} ms", file=sys.stderr)

    def mask_only(scores, excl):
        padded = jnp.concatenate([scores, jnp.zeros((B, 1), scores.dtype)], axis=1)
        rows = jnp.arange(B)[:, None]
        padded = padded.at[rows, excl].set(-jnp.inf)
        return padded[:, :n_items]

    mk = jax.jit(mask_only)
    t = timeit(lambda: mk(scores_const, excl))
    print(f"exclusion scatter:         {t*1e3:8.2f} ms", file=sys.stderr)

    from inductive_recommendation_tpu.ops.sol import TopkCost

    tk = jax.jit(lambda s: jax.lax.top_k(s, k))
    t = timeit(lambda: tk(scores_const))
    pct = TopkCost(rows=B, n=n_items, k=k).report(t)["pct_sol"]
    print(f"lax.top_k k=100:           {t*1e3:8.2f} ms ({pct:.0f}% SoL)", file=sys.stderr)

    tk32 = jax.jit(lambda s: jax.lax.top_k(s, 32))
    t = timeit(lambda: tk32(scores_const))
    print(f"lax.top_k k=32:            {t*1e3:8.2f} ms", file=sys.stderr)

    ap = jax.jit(lambda s: jax.lax.approx_max_k(s, k))
    t = timeit(lambda: ap(scores_const))
    print(f"approx_max_k k=100:        {t*1e3:8.2f} ms", file=sys.stderr)

    # two-stage exact: chunk top-k then merge (exact when k <= chunk top kept)
    def two_stage(s):
        C = 64  # chunks
        L = -(-n_items // C)
        pad = C * L - n_items
        sp = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        sc = sp.reshape(B, C, L)
        v, i = jax.lax.top_k(sc, k)  # [B, C, k]
        base = (jnp.arange(C) * L)[None, :, None]
        gi = (i + base).reshape(B, C * k)
        gv = v.reshape(B, C * k)
        mv, mp = jax.lax.top_k(gv, k)
        return mv, jnp.take_along_axis(gi, mp, axis=-1)

    ts = jax.jit(two_stage)
    t = timeit(lambda: ts(scores_const))
    print(f"two-stage exact top-k:     {t*1e3:8.2f} ms", file=sys.stderr)

    # sanity: two_stage == top_k
    v1, i1 = jax.jit(lambda s: jax.lax.top_k(s, k))(scores_const)
    v2, i2 = ts(scores_const)
    print(
        f"two-stage exact match: vals {bool(jnp.allclose(v1, v2))}",
        file=sys.stderr,
    )

    # full fused rec_masked equivalent
    def fused(u, it, excl):
        s = u @ it.T
        s = mask_only(s, excl)
        return jax.lax.top_k(s, k)[1]

    fz = jax.jit(fused)
    t = timeit(lambda: fz(users_rep, items_rep, excl))
    print(f"fused score+mask+topk:     {t*1e3:8.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
