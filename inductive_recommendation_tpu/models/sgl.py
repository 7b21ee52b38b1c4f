"""SGL and HALF (reference model.py:130-365): LightGCN + per-epoch random
edge-drop augmentation views + InfoNCE.

- SGL: two drop views, InfoNCE between the two views' user reps
  (model.py:213-228)
- HALF: one drop view, InfoNCE(main rep, view rep) (model.py:332-349)

View graphs are regenerated every epoch (``update_aug_adj``). To keep the
jitted train step recompile-free, each view lives in a FIXED-size padded COO
buffer: regeneration writes new edges into the same-shaped arrays
(graph/sparse.py padding discipline). The main adjacency stays on the
bucketed fast path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from inductive_recommendation_tpu.graph import (
    bipartite_edges,
    coo_from_edges,
    coo_to_device,
    sym_normalize_values,
)
from inductive_recommendation_tpu.graph.build import drop_sample_edges
from inductive_recommendation_tpu.models.base import l2_sq_rows
from inductive_recommendation_tpu.models.lightgcn import LightGCN
from inductive_recommendation_tpu.ops import propagate_mean
from inductive_recommendation_tpu.train.losses import info_nce


def padded_view_coo(pairs, n_users, n_items, nnz_budget):
    """(u, i) pairs -> sym-normalized padded COO device container of a FIXED
    nnz size (so per-epoch view regeneration never retraces jit)."""
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    row, col = bipartite_edges(pairs, n_users, n_items)
    n = n_users + n_items
    keys = row * n + col
    uniq, counts = np.unique(keys, return_counts=True)
    row = (uniq // n).astype(np.int64)
    col = (uniq % n).astype(np.int64)
    val = sym_normalize_values(row, col, n, counts.astype(np.float32))
    prow, pcol, pval = coo_from_edges(row, col, val, (n, n), nnz_pad=nnz_budget)
    return coo_to_device(prow, pcol, pval, (n, n))


class SGL(LightGCN):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.aug_rate = model_config.get("aug_rate", 0.8)
        self._np_rng = np.random.default_rng(model_config.get("aug_seed", 0))
        # fixed budget: both directions of the kept edges
        n_keep = int(len(np.asarray(dataset.train_array)) * self.aug_rate)
        self._view_budget = 2 * max(n_keep, 1)
        self.buffers = dict(
            self.buffers,
            aug_adj1=self._drop_view(),
            aug_adj2=self._drop_view(),
        )

    def _drop_view(self):
        pairs = drop_sample_edges(
            self.dataset.train_array, self.aug_rate, self._np_rng
        )
        return padded_view_coo(pairs, self.n_users, self.n_items, self._view_budget)

    def update_aug_adj(self, params=None):
        """Per-epoch view regeneration (model.py:232-237)."""
        self.buffers = dict(
            self.buffers, aug_adj1=self._drop_view(), aug_adj2=self._drop_view()
        )

    def _view_users(self, params, buffers, key, users):
        emb = params["embedding"][: self.n_users + self.n_items]
        rep = propagate_mean(buffers[key], emb, self.n_layers)
        return rep[users]

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        b = self._buf(buffers)
        users_r, pos_r, neg_r, l2 = super().bpr_forward(
            params, users, pos_items, neg_items, rng=rng, training=training, buffers=b
        )
        # reference computes L2 on the final reps here (model.py:224-225)
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        v1 = self._view_users(params, b, "aug_adj1", users)
        v2 = self._view_users(params, b, "aug_adj2", users)
        contrastive = info_nce(v1, v2, v2)
        return users_r, pos_r, neg_r, l2, contrastive


class HALF(SGL):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        # single view (model.py:270-271)
        self.buffers = {
            k: v for k, v in self.buffers.items() if k != "aug_adj2"
        }

    def update_aug_adj(self, params=None):
        self.buffers = dict(self.buffers, aug_adj1=self._drop_view())

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        b = self._buf(buffers)
        users_r, pos_r, neg_r, l2 = LightGCN.bpr_forward(
            self, params, users, pos_items, neg_items, rng=rng, training=training, buffers=b
        )
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        v1 = self._view_users(params, b, "aug_adj1", users)
        contrastive = info_nce(users_r, v1, v1)
        return users_r, pos_r, neg_r, l2, contrastive
