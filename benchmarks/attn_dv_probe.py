"""AttIGCN backward d(v_table) path probe (r5): the attention aggregation
``out[r] = sum_s attn[r,s] * v[idx[r,s]]`` is bilinear, so its v-cotangent
is a TRANSPOSE-layout application with the attention as edge values —
expressible scatter-free. This probe measures the three candidate forms on
the real Gowalla-scale feat layout (the numbers recorded in
ATT_BREAKDOWN_r05.json under ``dv_path_probe_ms``):

A. XLA autodiff of the aggregation (the production path): scatter-add of
   [E, d] attention-scaled cotangents into the table.
B. eid-scatter of the per-slot attention scalars into a flat [nnz] vector
   (E scalar scatter) + transpose-layout gather apply.
C. slot-permutation form: a HOST-precomputed fwd-slot index per bwd slot
   (layout-static, built once) turns B's scatter into a flat gather; the
   transpose apply then reads attention per bwd slot directly.

Measured v5e (1.79M-nnz feat, d=64): A 31.4 ms, B 35.1 ms, C 23.8 ms —
the slot-perm transpose-gather beats the scatter by ~1.3x on this kernel
(~7.5 ms, ~+7% of the 101 ms AttIGCN step if integrated via a custom-VJP
bilinear core; d(attn) would re-gather the value rows the score chain
already gathers). Kept as a probe: the r2 full-custom-VJP attempt LOST
(100-105 vs 80 ms, ops/attention_spmm.py docstring) because it replaced
the whole backward; this narrower bilinear-core form is the measured
candidate if the attention premium ever needs shaving.

Run (TPU): python benchmarks/attn_dv_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
from inductive_recommendation_tpu.models import get_model


def _timeit(fn, *a, iters=12):
    out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ds = quick_synthetic_dataset(29858, 40981, 1_200_000, seed=0)
    model = get_model(
        {"name": "AttIGCN", "embedding_size": 64, "n_layers": 3,
         "dropout": 0.0, "feature_ratio": 1.0},
        ds,
    )
    feat = model.buffers["feat"]
    fwd, bwd = feat.fwd, feat.bwd
    d = 64
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((fwd.n_cols, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((fwd.n_rows, d)).astype(np.float32))
    attns = [
        jnp.asarray(rng.random(b.idx.shape).astype(np.float32)) * (b.val != 0)
        for b in fwd.buckets
    ]
    nnz_pad = feat.nnz + 1

    def assemble(parts, side):
        n_have = sum(p.shape[0] for p in parts)
        if side.n_rows - n_have > 0:
            parts = list(parts) + [
                jnp.zeros((side.n_rows - n_have, d), jnp.float32)
            ]
        return jnp.take(jnp.concatenate(parts, axis=0), side.inv_perm, axis=0)

    # A: autodiff scatter
    def agg(v, attns):
        parts = [
            jnp.einsum("mk,mkd->md", a, jnp.take(v, b.idx, axis=0))
            for b, a in zip(fwd.buckets, attns)
        ]
        return assemble(parts, fwd)

    dv_auto = jax.jit(
        lambda v, attns, g: jax.vjp(lambda vv: agg(vv, attns), v)[1](g)[0]
    )
    t_a = _timeit(dv_auto, v, attns, g)

    # C: host-precomputed fwd-slot per bwd slot (layout-static) + gathers
    fwd_slot_of_eid = np.zeros(nnz_pad, np.int64)
    off = 0
    for b in fwd.buckets:
        e = np.asarray(b.eid).reshape(-1)
        m = np.asarray(b.val).reshape(-1) != 0
        fwd_slot_of_eid[e[m]] = off + np.nonzero(m)[0]
        off += e.size
    slots = [
        jnp.asarray(fwd_slot_of_eid[np.asarray(b.eid)].astype(np.int32))
        for b in bwd.buckets
    ]

    def dv_perm(attns, g):
        flat = jnp.concatenate([a.reshape(-1) for a in attns])
        parts = [
            jnp.einsum(
                "mk,mkd->md",
                jnp.take(flat, s, axis=0) * (b.val != 0),
                jnp.take(g, b.idx, axis=0),
            )
            for b, s in zip(bwd.buckets, slots)
        ]
        return assemble(parts, bwd)

    dv_perm_j = jax.jit(dv_perm)
    t_c = _timeit(dv_perm_j, attns, g)
    ref = dv_auto(v, attns, g)
    got = dv_perm_j(attns, g)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(
        f"A autodiff-scatter d(v): {t_a:.2f} ms | "
        f"C slot-perm transpose-gather: {t_c:.2f} ms | rel err {err:.2e}"
    )
    assert err < 1e-4, "transpose-gather d(v) disagrees with autodiff"


if __name__ == "__main__":
    main()
