"""Pallas kernels in interpreter mode (CPU test env); the attention tile
kernel is additionally verified compiled on the real TPU (see commit logs /
verification drives — the remote Mosaic toolchain is not reachable from the
CPU-pinned test process)."""

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.graph import sym_normalized_adjacency, ell_from_coo
from inductive_recommendation_tpu.ops import spmm
from inductive_recommendation_tpu.ops.pallas_spmm import spmm_ell_pallas


def test_pallas_ell_spmm_interpret(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    ell = ell_from_coo(row, col, val, (n, n))
    x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    out = np.asarray(spmm_ell_pallas(ell, x, tile_rows=8, interpret=True))
    oracle = np.asarray(spmm(ell, x))
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)
