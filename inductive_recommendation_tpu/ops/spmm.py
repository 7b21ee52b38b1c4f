"""Sparse matrix x dense matrix products (the framework's hot loop).

The reference's propagation bottoms out in DGL's fused CUDA gspmm
(model.py:100-110: ``H <- A_hat @ H`` per layer). On TPU the same
contraction is expressed as gather + segment-sum over a row-sorted COO,
which XLA fuses into a single bandwidth-bound pass — power-law graph
sparsity is far too low for MXU block tiles, so the VPU/gather path *is*
the speed-of-light path. A Pallas ELL kernel (``ops/pallas_spmm.py``)
covers the degree-bucketed layout.

All functions are pure and jit-friendly; padded edges (val == 0) contribute
nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.graph.sparse import SparseCOO, SparseELL
from inductive_recommendation_tpu.ops.bucketed_spmm import BucketedSpMM, spmm_bucketed


def spmm_coo(adj: SparseCOO, x: jnp.ndarray) -> jnp.ndarray:
    """out[r] = sum_{(r,c,v) in adj} v * x[c]   — gather + segment-sum."""
    gathered = jnp.take(x, adj.col, axis=0) * adj.val[:, None]
    return jax.ops.segment_sum(
        gathered, adj.row, num_segments=adj.n_rows, indices_are_sorted=True
    )


def spmm_ell(adj: SparseELL, x: jnp.ndarray) -> jnp.ndarray:
    """ELL layout: out[r] = sum_k val[r,k] * x[idx[r,k]]."""
    gathered = jnp.take(x, adj.idx, axis=0)  # [n_rows, k, d]
    return jnp.einsum("rk,rkd->rd", adj.val, gathered)


def spmm(adj, x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """Dispatch on container type; ``impl`` forces 'coo'/'ell'/'pallas'
    (raising if the container does not match — a silently ignored force
    flag would benchmark the wrong kernel)."""
    if impl == "pallas":
        from inductive_recommendation_tpu.ops.pallas_spmm import spmm_ell_pallas

        if not isinstance(adj, SparseELL):
            raise TypeError("pallas impl requires SparseELL")
        return spmm_ell_pallas(adj, x)
    if impl == "coo":
        if not isinstance(adj, SparseCOO):
            raise TypeError("coo impl requires SparseCOO")
        return spmm_coo(adj, x)
    if impl == "ell":
        if not isinstance(adj, SparseELL):
            raise TypeError("ell impl requires SparseELL")
        return spmm_ell(adj, x)
    if impl != "auto":
        raise ValueError(f"unknown impl {impl!r}")
    if isinstance(adj, BucketedSpMM):
        return spmm_bucketed(adj, x)
    if isinstance(adj, SparseCOO):
        return spmm_coo(adj, x)
    if isinstance(adj, SparseELL):
        return spmm_ell(adj, x)
    raise TypeError(f"unsupported sparse container {type(adj)}")


def propagate_mean(
    adj, x0: jnp.ndarray, n_layers: int, impl: str = "auto"
) -> jnp.ndarray:
    """LightGCN-style propagation: mean over layer outputs [x0, Ax0, ...].

    Mirrors the per-model loop at model.py:100-110 (stack + mean), shared by
    nearly every model in the reference. Layers run under ``lax.scan`` so
    the SpMM body is compiled ONCE — an unrolled 3-layer fwd+bwd program
    compiled ~8x slower for identical runtime.
    """
    if n_layers <= 0:
        return x0

    def body(carry, _):
        x, acc = carry
        x = spmm(adj, x, impl=impl)
        return (x, acc + x), None

    (_, acc), _ = jax.lax.scan(body, (x0, x0), None, length=n_layers)
    return acc / float(n_layers + 1)


def segment_softmax(
    scores: jnp.ndarray, row: jnp.ndarray, n_rows: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Numerically-stable per-row softmax over edge scores.

    The attention-SpMM building block (AttIGCN spec, model.py:4270-4274:
    gspmm copy_rhs/max then copy_rhs/sum). ``scores`` may be [nnz] or
    [nnz, h] for multi-head. ``mask`` (1/0 per edge) excludes padding.

    PRECONDITION: ``row`` must be sorted ascending (a ``SparseCOO``'s row
    array is; a transpose direction's is NOT). The segment reductions are
    lowered with indices_are_sorted=True — on CPU the hint is ignored, but
    on TPU unsorted indices under it are undefined behavior and produce
    silently wrong softmax weights.
    """
    if mask is not None:
        neg = jnp.asarray(-1e30, scores.dtype)
        m = mask if scores.ndim == mask.ndim else mask[:, None]
        scores = jnp.where(m > 0, scores, neg)
    row_max = jax.ops.segment_max(
        scores, row, num_segments=n_rows, indices_are_sorted=True
    )
    # rows with no edges produce -inf max; guard for the gather back
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    exp = jnp.exp(scores - row_max[row])
    if mask is not None:
        m = mask if exp.ndim == mask.ndim else mask[:, None]
        exp = exp * m
    denom = jax.ops.segment_sum(
        exp, row, num_segments=n_rows, indices_are_sorted=True
    )
    denom = jnp.where(denom > 0, denom, 1.0)
    return exp / denom[row]
