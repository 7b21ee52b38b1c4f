"""Dropout over sparse structures, static-shape style.

The reference drops edges by *removing* index columns from the sparse tensor
(NGCF.dropout_sp_mat, model.py:4016-4028) — a dynamic-shape operation. On TPU
we zero the edge *values* instead and rescale survivors by 1/(1-p): an edge
with value 0 is algebraically absent from every SpMM, so the two forms are
exactly equivalent while keeping shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sparse_dropout(
    val: jnp.ndarray, rng: jax.Array, p: float, training: bool
) -> jnp.ndarray:
    """Bernoulli edge dropout with 1/(1-p) rescale (model.py:4016-4028).

    The reference keeps an edge when floor((1-p) + U) == 1, i.e. with
    probability 1-p; identical here via U >= p.
    """
    if not training or p <= 0.0:
        return val
    keep = jax.random.uniform(rng, val.shape) >= p
    return jnp.where(keep, val / (1.0 - p), 0.0)


def node_dropout_mask(
    rng: jax.Array, n_nodes: int, p: float, training: bool
) -> jnp.ndarray:
    """Per-node dropout mask with rescale (IMCGAE, model.py:4331-4334)."""
    if not training or p <= 0.0:
        return jnp.ones((n_nodes,), dtype=jnp.float32)
    keep = jax.random.uniform(rng, (n_nodes,)) >= p
    return jnp.where(keep, 1.0 / (1.0 - p), 0.0)
