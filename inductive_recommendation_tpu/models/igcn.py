"""IGCN — the core inductive model (reference model.py:4107-4220) — and IMF
(model.py:4290-4297).

A node's representation is built purely from its *feature (template) row*:
a sparse row over core users/items + two type tokens, aggregated against a
core-sized embedding table (``inductive_rep_layer``), then propagated over
the normalized adjacency. Unseen users/items get representations without any
trained per-node row — the inductive property.

TPU-shaped differences from the reference:

- the feature matrix is a rectangular bucketed SpMM (gather-only fwd/bwd);
  its *annealed* edge weights (``row_sum^((alpha-1)/2 - 0.5)``, annealed x
  delta per epoch, model.py:4127-4134) are BAKED into the layout values on
  device once per epoch (ops.bucketed_spmm.with_annealed_values) — never
  gathered per step, never rebuilding the layout;
- training-time edge dropout on the feature matrix (model.py:4189 via
  NGCF.dropout_sp_mat) is generated IN the bucket layout from a counter
  hash of the edge id (spmm_bucketed_dropout) — identical keep/rescale
  algebra, no [nnz] mask vector and no per-step eid gathers;
- no "uninitialized padding rows" trick (model.py:4177-4186 pads the
  embedding with torch.empty to satisfy DGL's square-graph requirement) —
  the rectangular SpMM just works.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.graph import build_feat_matrix, graph_rank_nodes
from inductive_recommendation_tpu.models.base import (
    BasicModel,
    l2_sq_rows,
    normal_init,
)
from inductive_recommendation_tpu.models.lightgcn import build_norm_adj
from inductive_recommendation_tpu.ops import build_bucketed_spmm, propagate_mean, spmm_bucketed
from inductive_recommendation_tpu.ops.bucketed_spmm import (
    spmm_bucketed_dropout,
    with_annealed_values,
)


def select_core(dataset, feature_ratio, ranking_metric):
    """Core (template) user/item selection: top feature_ratio of the node
    ranking (model.py:4141-4148). Returns dense -1-padded map arrays."""
    n_users, n_items = dataset.n_users, dataset.n_items
    if feature_ratio < 1.0:
        ranked_users, ranked_items = graph_rank_nodes(dataset, ranking_metric)
        core_users = ranked_users[: int(n_users * feature_ratio)]
        core_items = ranked_items[: int(n_items * feature_ratio)]
    else:
        core_users = np.arange(n_users, dtype=np.int64)
        core_items = np.arange(n_items, dtype=np.int64)
    user_map = np.full(n_users, -1, dtype=np.int64)
    user_map[core_users] = np.arange(len(core_users))
    item_map = np.full(n_items, -1, dtype=np.int64)
    item_map[core_items] = np.arange(len(core_items))
    return user_map, item_map


class IGCN(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.embedding_size = model_config["embedding_size"]
        self.n_layers = model_config["n_layers"]
        self.dropout = model_config["dropout"]
        self.feature_ratio = model_config["feature_ratio"]
        self.alpha = 1.0
        self.delta = model_config.get("delta", 0.99)
        self.ranking_metric = model_config.get("ranking_metric", "sort")

        self.user_map, self.item_map = select_core(
            dataset, self.feature_ratio, self.ranking_metric
        )
        self._build_graph_buffers(dataset)

    # -- buffers -------------------------------------------------------------
    def _build_graph_buffers(self, dataset):
        self.user_dim = int((self.user_map >= 0).sum())
        self.item_dim = int((self.item_map >= 0).sum())
        row, col, counts, row_sum = build_feat_matrix(
            dataset.train_array,
            dataset.n_users,
            dataset.n_items,
            self.user_map,
            self.item_map,
        )
        n_cols = self.user_dim + self.item_dim + 2
        feat = build_bucketed_spmm(
            row,
            col,
            counts,
            (dataset.n_users + dataset.n_items, n_cols),
            symmetric=False,  # anneal + dropout need the transpose layout
        )
        self.feat_n_cols = n_cols
        # the annealed degree-power weights are BAKED into the layout values
        # on device, once per epoch (feat_mat_anneal) — not gathered per step
        self._feat_base = feat
        self._feat_row_sum = jnp.asarray(row_sum)
        self._anneal_jit = jax.jit(with_annealed_values)
        self.buffers = {
            "norm_adj": self._build_norm_adj(dataset),
            "feat": self._anneal_jit(feat, self._feat_row_sum, self.alpha),
            "feat_row": jnp.asarray(row, dtype=jnp.int32),
            "feat_row_sum": self._feat_row_sum,
            "alpha": jnp.asarray(self.alpha, dtype=jnp.float32),
        }

    def _build_norm_adj(self, dataset):
        return build_norm_adj(dataset)

    def attach_dataset(self, dataset):
        """Inductive protocol: rebuild graph buffers from a NEW dataset
        (train ∪ new interactions) while keeping the trained core maps and
        embedding table (model.py:4219: feat rebuilt with is_updating=True).
        The map arrays are extended with -1 for newly-appeared nodes."""
        um = np.full(dataset.n_users, -1, dtype=np.int64)
        um[: len(self.user_map)] = self.user_map
        im = np.full(dataset.n_items, -1, dtype=np.int64)
        im[: len(self.item_map)] = self.item_map
        self.user_map, self.item_map = um, im
        self.dataset = dataset
        self.n_users, self.n_items = dataset.n_users, dataset.n_items
        self._build_graph_buffers(dataset)

    # -- annealing (model.py:4127-4134) --------------------------------------
    def feat_mat_anneal(self):
        self.alpha *= self.delta
        self.buffers = dict(
            self.buffers,
            alpha=jnp.asarray(self.alpha, dtype=jnp.float32),
            feat=self._anneal_jit(self._feat_base, self._feat_row_sum, self.alpha),
        )

    # -- parameters ----------------------------------------------------------
    def init_params(self, rng):
        r1, _ = jax.random.split(rng)
        return {
            "embedding": normal_init(
                r1, (self._align_rows(self.feat_n_cols), self.embedding_size)
            ),
            "w": jnp.ones((self.embedding_size,), dtype=jnp.float32),
        }

    # -- representations -----------------------------------------------------
    def inductive_rep_layer(self, params, buffers, rng=None, training=False):
        emb = params["embedding"][: self.feat_n_cols]
        if training and self.dropout > 0.0:
            return spmm_bucketed_dropout(buffers["feat"], emb, rng, self.dropout)
        return spmm_bucketed(buffers["feat"], emb)

    def get_rep(self, params, rng=None, training=False, buffers=None):
        b = self._buf(buffers)
        x0 = self.inductive_rep_layer(params, b, rng=rng, training=training)
        return propagate_mean(b["norm_adj"], x0, self.n_layers)

    # -- training forward (NGCF.bpr_forward shape, model.py:4202-4203) -------
    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        rep = self.get_rep(params, rng=rng, training=training, buffers=buffers)
        users_r = rep[users]
        pos_r = rep[self.n_users + pos_items]
        neg_r = rep[self.n_users + neg_items]
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        return users_r, pos_r, neg_r, l2

    # -- checkpoint payload (model.py:4208-4220) ------------------------------
    def checkpoint_aux(self):
        return {
            "user_map": np.asarray(self.user_map),
            "item_map": np.asarray(self.item_map),
            "alpha": float(self.alpha),
        }

    def restore_aux(self, aux):
        if not aux:
            return
        self.user_map = np.asarray(aux["user_map"])
        self.item_map = np.asarray(aux["item_map"])
        self.alpha = float(aux["alpha"])
        # rebuild feat mat + row_sum from the current dataset with the stored
        # maps (reference generate_feat(is_updating=True))
        self._build_graph_buffers(self.dataset)


class IMF(IGCN):
    """Inductive MF: the inductive rep layer only, no graph convolution
    (model.py:4290-4297)."""

    def get_rep(self, params, rng=None, training=False, buffers=None):
        b = self._buf(buffers)
        return self.inductive_rep_layer(params, b, rng=rng, training=training)
