"""LightGCN (reference model.py:79-127): single embedding table over
users+items, n_layers of normalized-adjacency propagation, layer mean."""

from __future__ import annotations

from inductive_recommendation_tpu.graph import (
    sym_normalized_adjacency,
    coo_from_edges,
    coo_to_device,
)
from inductive_recommendation_tpu.models.base import (
    BasicModel,
    l2_sq_rows,
    normal_init,
)
from inductive_recommendation_tpu.ops import build_bucketed_spmm, propagate_mean


def build_norm_adj(dataset, nnz_margin: int = 0, layout: str = "bucketed"):
    """Shared builder for the sym-normalized device adjacency
    (model.py:89-98 semantics; every GCN-style model delegates here, as the
    reference delegates to LightGCN.generate_graph).

    ``layout='bucketed'`` (default): degree-bucketed gather-only SpMM with
    transpose backward — the TPU fast path (the sym-normalized adjacency is
    symmetric, so forward and backward share one layout).
    ``layout='coo'``: padded COO + segment-sum, the jnp reference path.
    """
    row, col, val = sym_normalized_adjacency(
        dataset.train_array, dataset.n_users, dataset.n_items
    )
    n = dataset.n_users + dataset.n_items
    if layout == "bucketed":
        return build_bucketed_spmm(row, col, val, (n, n), symmetric=True)
    prow, pcol, pval = coo_from_edges(
        row, col, val, (n, n), nnz_pad=len(row) + nnz_margin
    )
    return coo_to_device(prow, pcol, pval, (n, n))


class LightGCN(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.embedding_size = model_config["embedding_size"]
        self.n_layers = model_config["n_layers"]
        self.buffers = {"norm_adj": build_norm_adj(dataset)}

    def init_params(self, rng):
        return {
            "embedding": normal_init(
                rng,
                (self._align_rows(self.n_users + self.n_items), self.embedding_size),
            )
        }

    def get_rep(self, params, rng=None, training=False, buffers=None):
        b = self._buf(buffers)
        emb = params["embedding"][: self.n_users + self.n_items]
        return propagate_mean(b["norm_adj"], emb, self.n_layers)

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        rep = self.get_rep(params, rng=rng, training=training, buffers=buffers)
        emb = params["embedding"]
        # L2 regularization on the ego embeddings (model.py:114-117)
        l2 = l2_sq_rows(
            emb[users], emb[self.n_users + pos_items], emb[self.n_users + neg_items]
        )
        users_r = rep[users]
        pos_r = rep[self.n_users + pos_items]
        neg_r = rep[self.n_users + neg_items]
        return users_r, pos_r, neg_r, l2
