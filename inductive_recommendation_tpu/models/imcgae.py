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

    def _rep_compact(self, params, rng, training, b):
        """Propagate at width d+3 instead of 3d.

        The 3d concat's shared blocks stay LOW-RANK under propagation:
        h = [P | G | O] with G = u_mask·gu^T + i_mask·gi^T (piecewise
        constant by node type) and O = 1·id^T, and each layer is
        h -> A·D_k·h (D_k the node-dropout diagonal) — linear, applied to
        all columns alike — so A^k's action on G/O is determined by its
        action on the three COEFFICIENT VECTORS u_mask, i_mask, 1. The
        propagation operand is therefore [P | u_mask | i_mask | 1]
        ([n, d+3]): at d=64 that is one 128-lane gather row instead of the
        3d=192-wide (two-vreg) row — the SpMMs are transaction-bound
        (CLAUDE.md), and the measured step halved — 2.28x on v5e at
        Gowalla scale (24,937 -> 56,781 ex/s, ~36 ms, identical loss;
        committed artifact BENCH_DETAIL_r04.json). Returns
        ((compact [n, d+3]), (gu, gi, id)) — reconstruct rows on demand via
        :meth:`_expand_rows`. Exact up to fp reassociation
        ((A u_mask)·gu vs A·(u_mask gu^T))."""
        emb = params["embedding"]
        n_u, n_i = self.n_users, self.n_items
        n = n_u + n_i
        identical = emb[n]
        general_u = emb[n + 1]
        general_i = emb[n + 2]
        u_mask = (jnp.arange(n) < n_u).astype(emb.dtype)
        h = jnp.concatenate(
            [emb[:n], u_mask[:, None], (1.0 - u_mask)[:, None],
             jnp.ones((n, 1), emb.dtype)],
            axis=1,
        )
        parts = (general_u, general_i, identical)
        if self.n_layers == 0:
            return h, parts
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
                keep = jax.random.uniform(key, (n,)) >= rate
                mask = jnp.where(keep, 1.0 / jnp.maximum(1.0 - rate, 1e-6), 0.0)
                # rate <= 0 (clamped decay): identity, not a rescale
                h = jnp.where(rate > 0.0, h * mask[:, None], h)
            h = spmm(b["norm_adj"], h)
            return (h, final + h * s), None

        (_, final), _ = jax.lax.scan(body, (h, h), (keys, rates, inv_scale))
        return final, parts

    def _expand_rows(self, compact_rows, parts):
        """[*, d+3] compact rows -> [*, 3d]: personal block + the general /
        identical blocks reconstructed from their propagated coefficients."""
        general_u, general_i, identical = parts
        p = compact_rows[..., :-3]
        a = compact_rows[..., -3:-2]
        bb = compact_rows[..., -2:-1]
        c = compact_rows[..., -1:]
        return jnp.concatenate(
            [p, a * general_u + bb * general_i, c * identical], axis=-1
        )

    def get_rep(self, params, rng=None, training=False, buffers=None):
        b = self._buf(buffers)
        compact, parts = self._rep_compact(params, rng, training, b)
        return self._expand_rows(compact, parts)

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        b = self._buf(buffers)
        compact, parts = self._rep_compact(params, rng, training, b)
        # gather [B, d+3] rows, expand to 3d per batch row — the full
        # [n, 3d] matrix never materializes in the train step
        users_r = self._expand_rows(compact[users], parts)
        pos_r = self._expand_rows(compact[self.n_users + pos_items], parts)
        neg_r = self._expand_rows(compact[self.n_users + neg_items], parts)
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        return users_r, pos_r, neg_r, l2
