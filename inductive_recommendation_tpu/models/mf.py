"""Matrix factorization (reference model.py:56-76)."""

from __future__ import annotations

import jax

from inductive_recommendation_tpu.models.base import (
    BasicModel,
    l2_sq_rows,
    normal_init,
)


class MF(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.embedding_size = model_config["embedding_size"]

    def init_params(self, rng):
        r1, r2 = jax.random.split(rng)
        # row-aligned for the mesh 'model' axis (padding rows never indexed)
        return {
            "user_embedding": normal_init(
                r1, (self._align_rows(self.n_users), self.embedding_size)
            ),
            "item_embedding": normal_init(
                r2, (self._align_rows(self.n_items), self.embedding_size)
            ),
        }

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        users_e = params["user_embedding"][users]
        pos_e = params["item_embedding"][pos_items]
        neg_e = params["item_embedding"][neg_items]
        l2 = l2_sq_rows(users_e, pos_e, neg_e)
        return users_e, pos_e, neg_e, l2

    def make_scoring_state(self, params, buffers=None):
        return params

    def score(self, state, users):
        items = state["item_embedding"][: self.n_items]
        return state["user_embedding"][users] @ items.T
