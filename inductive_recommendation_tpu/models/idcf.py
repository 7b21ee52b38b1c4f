"""IDCF_LGCN (reference model.py:3879-3983): inductive CF via relational
attention over a frozen pretrained LightGCN embedding table.

Per head, every node's query (its aggregated neighborhood feature) attends
over ``n_samples`` randomly sampled key users/items from the frozen table;
head outputs are fused and propagated LightGCN-style. A logsumexp
contrastive regularizer pulls representations toward their own frozen rows.

The frozen table is a *buffer* (not a parameter) — the reference freezes it
with requires_grad=False (model.py:3905-3908); keeping it out of the param
pytree gives the optimizer nothing to touch.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.graph import bipartite_edges
from inductive_recommendation_tpu.models.base import (
    BasicModel,
    init_linear,
    apply_linear,
    l2_sq_rows,
)
from inductive_recommendation_tpu.models.lightgcn import build_norm_adj
from inductive_recommendation_tpu.ops import (
    build_bucketed_spmm,
    propagate_mean,
    spmm_bucketed,
)
from inductive_recommendation_tpu.train.checkpoint import load_checkpoint


def relation_gat(p, x, neighbors):
    """Single-head dot-product attention block (model.py:3879-3892)."""
    q = apply_linear(p["wq"], x)[:, None, :]  # [n, 1, d]
    k = apply_linear(p["wk"], neighbors)[None, :, :]  # [1, m, d]
    attn = jax.nn.softmax(jnp.sum(q * k, axis=2), axis=1)  # [n, m]
    return apply_linear(p["wv"], attn @ neighbors)


class IDCF_LGCN(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.embedding_size = model_config["embedding_size"]
        self.n_layers = model_config["n_layers"]
        self.n_headers = model_config["n_headers"]
        self.n_samples = model_config.get("n_samples", 50)
        self.n_old_users = self.n_users
        self.n_old_items = self.n_items

        if "pretrained_embedding" in model_config:
            emb = np.asarray(model_config["pretrained_embedding"], np.float32)
        else:
            payload = load_checkpoint(model_config["lgcn_path"])
            emb = np.asarray(payload["params"]["embedding"], np.float32)
        assert emb.shape == (
            self.n_old_users + self.n_old_items,
            self.embedding_size,
        ), f"pretrained LightGCN table shape {emb.shape} mismatch"

        # feat = adjacency columns of old users ++ old items (model.py:3921-3925)
        row, col = bipartite_edges(dataset.train_array, self.n_users, self.n_items)
        keep = np.ones(len(row), dtype=bool)  # at build time all nodes are old
        new_col = np.where(
            col < self.n_users, col, self.n_old_users + (col - self.n_users)
        )
        feat = build_bucketed_spmm(
            row[keep],
            new_col[keep],
            np.ones(keep.sum(), np.float32),
            (self.n_users + self.n_items, self.n_old_users + self.n_old_items),
        )
        self.buffers = {
            "norm_adj": build_norm_adj(dataset),
            "feat": feat,
            "frozen_embedding": jnp.asarray(emb),
        }

    def init_params(self, rng):
        keys = jax.random.split(rng, 3 * self.n_headers + 1)
        d = self.embedding_size
        return {
            "gat_units": [
                {
                    "wq": init_linear(keys[3 * i], d, d),
                    "wk": init_linear(keys[3 * i + 1], d, d),
                    "wv": init_linear(keys[3 * i + 2], d, d),
                }
                for i in range(self.n_headers)
            ],
            "w_out": init_linear(keys[-1], d * self.n_headers, d),
        }

    def _representations(self, params, buffers, rng, contrastive=False):
        emb = buffers["frozen_embedding"]
        x_q = spmm_bucketed(buffers["feat"], emb)  # [n_u+n_i, d]
        if rng is None:
            rng = jax.random.key(0)
        gat_outputs = []
        for i in range(self.n_headers):
            rng, r_u, r_i = jax.random.split(rng, 3)
            su = jax.random.randint(r_u, (self.n_samples,), 0, self.n_old_users)
            si = jax.random.randint(r_i, (self.n_samples,), 0, self.n_old_items)
            sampled_user_embs = emb[su]
            sampled_item_embs = emb[self.n_old_users + si]
            user_reps = relation_gat(
                params["gat_units"][i], x_q[: self.n_users], sampled_user_embs
            )
            item_reps = relation_gat(
                params["gat_units"][i], x_q[self.n_users :], sampled_item_embs
            )
            gat_outputs.append(jnp.concatenate([user_reps, item_reps], axis=0))
        representations = apply_linear(
            params["w_out"], jnp.concatenate(gat_outputs, axis=1)
        )
        if not contrastive:
            return representations, None
        # contrastive regularizer vs the LAST head's samples (the reference
        # reads the loop variable after the loop, model.py:3946-3955)
        u_rep = representations[: self.n_users]
        i_rep = representations[self.n_users :]
        user_sim = u_rep @ sampled_user_embs.T
        user_self = jnp.sum(u_rep * emb[: self.n_old_users][: self.n_users], axis=1)
        user_loss = jax.scipy.special.logsumexp(user_sim, axis=1) - user_self
        item_sim = i_rep @ sampled_item_embs.T
        item_self = jnp.sum(
            i_rep * emb[self.n_old_users :][: self.n_items], axis=1
        )
        item_loss = jax.scipy.special.logsumexp(item_sim, axis=1) - item_self
        return representations, jnp.concatenate([user_loss, item_loss], axis=0)

    def get_rep(self, params, rng=None, training=False, buffers=None, contrastive=False):
        b = self._buf(buffers)
        representations, closs = self._representations(
            params, b, rng, contrastive=contrastive
        )
        final = propagate_mean(b["norm_adj"], representations, self.n_layers)
        if contrastive:
            return final, closs
        return final

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        rep, closs = self.get_rep(
            params, rng=rng, training=training, buffers=buffers, contrastive=True
        )
        contrastive = (
            closs[users] + closs[self.n_users + pos_items] + closs[self.n_users + neg_items]
        )
        users_r = rep[users]
        pos_r = rep[self.n_users + pos_items]
        neg_r = rep[self.n_users + neg_items]
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        for unit in params["gat_units"]:
            l2 = l2 + jnp.sum(unit["wq"]["w"] ** 2) + jnp.sum(unit["wk"]["w"] ** 2)
        return users_r, pos_r, neg_r, l2, contrastive
