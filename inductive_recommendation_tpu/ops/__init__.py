"""Kernels: SpMM, attention-SpMM, top-k, blockwise cosine top-k, dropout.

Every hot op has a jnp reference implementation (exact, used for parity
tests and as the XLA-fused fallback) and, where profitable, a Pallas TPU
kernel behind the same interface. The SpMM here replaces every
``dgl.ops.gspmm`` call in the reference (model.py:106 et al.).
"""

from inductive_recommendation_tpu.ops.spmm import (
    spmm,
    spmm_coo,
    spmm_ell,
    propagate_mean,
    segment_softmax,
)
from inductive_recommendation_tpu.ops.bucketed_spmm import (
    BucketedSpMM,
    build_bucketed_spmm,
    spmm_bucketed,
)
from inductive_recommendation_tpu.ops.dropout import sparse_dropout, node_dropout_mask
from inductive_recommendation_tpu.ops.topk import topk_scores, masked_topk, sharded_topk
from inductive_recommendation_tpu.ops.cosine_topk import blockwise_cosine_topk

__all__ = [
    "BucketedSpMM",
    "build_bucketed_spmm",
    "spmm_bucketed",
    "spmm",
    "spmm_coo",
    "spmm_ell",
    "propagate_mean",
    "segment_softmax",
    "sparse_dropout",
    "node_dropout_mask",
    "topk_scores",
    "masked_topk",
    "sharded_topk",
    "blockwise_cosine_topk",
]
