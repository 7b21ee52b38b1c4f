"""IMCGAE (reference model.py:4300-4345): personal + shared general/identical
embeddings concatenated to 3d width, per-layer decaying node dropout,
1/(i+2) layer scaling, sum-combined."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.models.base import (
    BasicModel,
    l2_sq_rows,
    normal_init,
)
from inductive_recommendation_tpu.models.lightgcn import build_norm_adj
from inductive_recommendation_tpu.ops import spmm
from inductive_recommendation_tpu.ops.dropout import node_dropout_mask


class IMCGAE(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.embedding_size = model_config["embedding_size"]
        self.n_layers = model_config["n_layers"]
        self.dropout = model_config["dropout"]
        self.buffers = {"norm_adj": build_norm_adj(dataset)}

    def init_params(self, rng):
        # n_users + n_items personal rows + identical/general-user/general-item
        return {
            "embedding": normal_init(
                rng, (self.n_users + self.n_items + 3, self.embedding_size)
            )
        }

    def get_rep(self, params, rng=None, training=False, buffers=None):
        b = self._buf(buffers)
        emb = params["embedding"]
        n_u, n_i = self.n_users, self.n_items
        personal_u = emb[:n_u]
        personal_i = emb[n_u : n_u + n_i]
        identical = emb[n_u + n_i]
        general_u = emb[n_u + n_i + 1]
        general_i = emb[n_u + n_i + 2]
        u_rep = jnp.concatenate(
            [
                personal_u,
                jnp.broadcast_to(general_u[None, :], personal_u.shape),
                jnp.broadcast_to(identical[None, :], personal_u.shape),
            ],
            axis=1,
        )
        i_rep = jnp.concatenate(
            [
                personal_i,
                jnp.broadcast_to(general_i[None, :], personal_i.shape),
                jnp.broadcast_to(identical[None, :], personal_i.shape),
            ],
            axis=1,
        )
        h = jnp.concatenate([u_rep, i_rep], axis=0)
        final = h
        for i in range(self.n_layers):
            if training and rng is not None:
                rng, sub = jax.random.split(rng)
                mask = node_dropout_mask(
                    sub, n_u + n_i, self.dropout - 0.1 * i, training=True
                )
            else:
                mask = None
            if mask is not None:
                h = h * mask[:, None]
            h = spmm(b["norm_adj"], h)
            final = final + h / float(i + 2)
        return final

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        rep = self.get_rep(params, rng=rng, training=training, buffers=buffers)
        users_r = rep[users]
        pos_r = rep[self.n_users + pos_items]
        neg_r = rep[self.n_users + neg_items]
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        return users_r, pos_r, neg_r, l2
