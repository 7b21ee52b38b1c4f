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
        if self.n_layers == 0:
            return h
        use_dropout = training and rng is not None and self.dropout > 0.0
        keys = (
            jax.random.split(rng, self.n_layers)
            if use_dropout
            else jnp.zeros((self.n_layers, 2), dtype=jnp.uint32)
        )
        # per-layer decayed rate, clamped at 0: the reference's
        # dropout - 0.1*i (model.py:4331-4334) goes negative for small
        # dropout configs, where torch F.dropout would raise — clamping
        # makes deep layers no-ops instead of silently DOWN-scaling
        rates = jnp.asarray(
            [max(self.dropout - 0.1 * i, 0.0) for i in range(self.n_layers)],
            jnp.float32,
        )
        inv_scale = jnp.asarray(
            [1.0 / (i + 2) for i in range(self.n_layers)], jnp.float32
        )

        def body(carry, xs):
            h, final = carry
            key, rate, s = xs
            if use_dropout:
                keep = jax.random.uniform(key, (n_u + n_i,)) >= rate
                mask = jnp.where(keep, 1.0 / jnp.maximum(1.0 - rate, 1e-6), 0.0)
                # rate <= 0 (clamped decay): identity, not a rescale
                h = jnp.where(rate > 0.0, h * mask[:, None], h)
            h = spmm(b["norm_adj"], h)
            return (h, final + h * s), None

        (_, final), _ = jax.lax.scan(body, (h, h), (keys, rates, inv_scale))
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
