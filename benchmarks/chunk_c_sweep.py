"""Chunk-size sweep for the chunked delta SpMM (graph/views.py).

Per-step cost model: chunk gathers B, tail gathers (n_out+1)*C, cumsum
[B/C, d] — C trades tail transactions against cumsum traffic. Run on the
real chip to find the knee at the DOSE shape (B=1M, n_out=70839, d=64).
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.graph.views import (
    chunked_segment_structs,
    _chunked_apply,
)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, n_out, d = 1_000_000, 70_839, 64
    rng = np.random.default_rng(0)
    # zipf-concentrated rows like cos-sim selections
    rows = np.sort(
        (np.minimum(rng.zipf(1.3, B), n_out) - 1).astype(np.int32)
    )
    cols = rng.integers(0, n_out, B).astype(np.int32)
    vals = rng.standard_normal(B).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n_out, d)).astype(np.float32))
    d_row = jnp.asarray(rows)
    d_col = jnp.asarray(cols)
    d_val = jnp.asarray(vals)

    apply_j = jax.jit(_chunked_apply)

    def fwdbwd(struct, x):
        return jax.grad(
            lambda xx: jnp.sum(_chunked_apply(struct, xx) ** 2)
        )(x)

    fwdbwd_j = jax.jit(fwdbwd)

    build = jax.jit(chunked_segment_structs, static_argnums=(3, 4))
    for C in (4, 6, 8, 16, 32):
        struct = build(d_row, d_col, d_val, n_out, C)
        jax.block_until_ready(struct)
        t_f = timeit(apply_j, struct, x)
        t_fb = timeit(fwdbwd_j, struct, x)
        print(f"C={C:3d}  fwd {t_f:7.3f} ms   fwd+bwd(of fwd-struct) {t_fb:7.3f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
