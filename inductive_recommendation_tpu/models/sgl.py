"""SGL and HALF (reference model.py:130-365): LightGCN + per-epoch random
edge-drop augmentation views + InfoNCE.

- SGL: two drop views, InfoNCE between the two views' user reps
  (model.py:213-228)
- HALF: one drop view, InfoNCE(main rep, view rep) (model.py:332-349)

Views are EdgeViews (graph/views.py): a per-edge keep-mask + view-degree
normalization over a shared raw-train bucketed layout — per-epoch
regeneration writes a fixed-shape scale vector (no container rebuilds, no
retrace, no segment-sum propagation).
"""

from __future__ import annotations

import numpy as np

from inductive_recommendation_tpu.graph import (
    coo_from_edges,
    coo_to_device,
    sym_normalized_adjacency,
)
from inductive_recommendation_tpu.graph.views import (
    ViewEngine,
    bake_view,
    random_keep_mask_on_device,
    view_propagate_mean,
)
from inductive_recommendation_tpu.models.base import l2_sq_rows
from inductive_recommendation_tpu.models.lightgcn import LightGCN
from inductive_recommendation_tpu.train.losses import info_nce


def padded_view_coo(pairs, n_users, n_items, nnz_budget):
    """(u, i) pairs -> sym-normalized padded COO device container of a FIXED
    nnz size. Used for one-shot static graphs (e.g. TEST's dropped main
    adjacency); per-epoch views use EdgeView instead."""
    row, col, val = sym_normalized_adjacency(pairs, n_users, n_items)
    n = n_users + n_items
    prow, pcol, pval = coo_from_edges(row, col, val, (n, n), nnz_pad=nnz_budget)
    return coo_to_device(prow, pcol, pval, (n, n))


class SGL(LightGCN):
    #: number of augmentation views (HALF keeps one, model.py:270-271)
    _n_views = 2

    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.aug_rate = model_config.get("aug_rate", 0.8)
        self._aug_seed = int(model_config.get("aug_seed", 0))
        self.view_engine = ViewEngine(
            dataset.train_array, self.n_users, self.n_items, delta_budget=0
        )
        #: raw EdgeViews by buffer key — the edge-sharded SGL step re-indexes
        #: their base_scale into the sharded layout (parallel/step.py)
        self.edge_views = {}
        views = {
            f"aug_adj{i + 1}": self._drop_view(f"aug_adj{i + 1}")
            for i in range(self._n_views)
        }
        self.buffers = dict(self.buffers, view_base=self.view_engine.base, **views)

    def _drop_view(self, key=None):
        """Random-keep view, generated and baked entirely on device."""
        n_pairs = len(self.view_engine.train_pairs)
        self._view_counter = getattr(self, "_view_counter", 0) + 1
        keep = random_keep_mask_on_device(
            self._view_counter,
            n_pairs=n_pairs,
            n_keep=int(n_pairs * self.aug_rate),
            seed=self._aug_seed,
        )
        ev = self.view_engine.make_view_on_device(keep_pair_mask=keep)
        if key is not None:
            self.edge_views[key] = ev
        return bake_view(self.view_engine.base, ev)

    def update_aug_adj(self, params=None):
        """Per-epoch view regeneration (model.py:232-237). Snapshots the
        counter so a checkpoint restore replays THIS update's draws."""
        self._view_counter_base = getattr(self, "_view_counter", 0)
        self._views_updated = True
        self._regen_views()

    def _regen_views(self):
        self.buffers = dict(
            self.buffers,
            aug_adj1=self._drop_view("aug_adj1"),
            aug_adj2=self._drop_view("aug_adj2"),
        )

    def rebuild_views(self, params=None):
        """Trainer hook after a checkpoint load: regenerate the exact views
        the saved run was training on (draws are a pure counter function)."""
        if getattr(self, "_views_updated", False):
            self._view_counter = self._view_counter_base
            self._regen_views()

    def checkpoint_aux(self):
        aux = dict(super().checkpoint_aux())
        aux["view_counter"] = int(getattr(self, "_view_counter", 0))
        aux["view_counter_base"] = int(getattr(self, "_view_counter_base", 0))
        aux["views_updated"] = bool(getattr(self, "_views_updated", False))
        return aux

    def restore_aux(self, aux):
        if not aux:
            return
        aux = dict(aux)
        self._view_counter = int(
            aux.pop("view_counter", getattr(self, "_view_counter", 0))
        )
        self._view_counter_base = int(aux.pop("view_counter_base", 0))
        self._views_updated = bool(aux.pop("views_updated", False))
        super().restore_aux(aux)

    def _view_users(self, params, buffers, key, users):
        emb = params["embedding"][: self.n_users + self.n_items]
        rep = view_propagate_mean(
            buffers["view_base"], buffers[key], emb, self.n_layers
        )
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
    _n_views = 1  # single view (model.py:270-271)

    def _regen_views(self):
        self.buffers = dict(self.buffers, aug_adj1=self._drop_view("aug_adj1"))

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        b = self._buf(buffers)
        users_r, pos_r, neg_r, l2 = LightGCN.bpr_forward(
            self, params, users, pos_items, neg_items, rng=rng, training=training,
            buffers=b,
        )
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        v1 = self._view_users(params, b, "aug_adj1", users)
        contrastive = info_nce(users_r, v1, v1)
        return users_r, pos_r, neg_r, l2, contrastive
