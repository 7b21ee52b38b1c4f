"""NGCF (reference model.py:3986-4055): self-loop row-L1 adjacency, per-layer
gc/bi linear transforms, leaky-relu, dropout, L2-normalized layer concat."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.graph import bipartite_edges, row_l1_normalize_values
from inductive_recommendation_tpu.models.base import (
    BasicModel,
    apply_linear,
    init_linear,
    kaiming_uniform_init,
    l2_sq_rows,
)
from inductive_recommendation_tpu.ops import build_bucketed_spmm, spmm_bucketed
from inductive_recommendation_tpu.ops.bucketed_spmm import spmm_bucketed_dropout


def selfloop_l1_coo(dataset):
    """COO of A + I, row-L1 normalized (model.py:4008-4014) — shared by the
    single-device bucketed layout and the edge-sharded layout
    (parallel/step.py make_edge_sharded_ngcf_step)."""
    n = dataset.n_users + dataset.n_items
    row, col = bipartite_edges(dataset.train_array, dataset.n_users, dataset.n_items)
    row = np.concatenate([row, np.arange(n)])
    col = np.concatenate([col, np.arange(n)])
    keys = row * n + col
    uniq, counts = np.unique(keys, return_counts=True)
    row = (uniq // n).astype(np.int64)
    col = (uniq % n).astype(np.int64)
    val = row_l1_normalize_values(row, col, n, counts.astype(np.float32))
    return row, col, val, n


def build_selfloop_l1_adj(dataset):
    """A + I, row-L1 normalized. Built symmetric=False: training-time edge
    dropout needs the explicit transpose layout."""
    row, col, val, n = selfloop_l1_coo(dataset)
    return build_bucketed_spmm(row, col, val, (n, n), symmetric=False)


class NGCF(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.dropout = model_config["dropout"]
        self.embedding_size = model_config["embedding_size"]
        self.layer_sizes = list(model_config["layer_sizes"])
        self.n_layers = len(self.layer_sizes)
        self.buffers = {"norm_adj": build_selfloop_l1_adj(dataset)}

    def init_params(self, rng):
        keys = jax.random.split(rng, 1 + 2 * self.n_layers)
        sizes = [self.embedding_size] + self.layer_sizes
        params = {
            "embedding": kaiming_uniform_init(
                keys[0], (self.n_users + self.n_items, self.embedding_size)
            ),
            "gc_layers": [
                init_linear(keys[1 + i], sizes[i], sizes[i + 1])
                for i in range(self.n_layers)
            ],
            "bi_layers": [
                init_linear(keys[1 + self.n_layers + i], sizes[i], sizes[i + 1])
                for i in range(self.n_layers)
            ],
        }
        return params

    def get_rep(self, params, rng=None, training=False, buffers=None):
        b = self._buf(buffers)
        adj = b["norm_adj"]
        h = params["embedding"]
        all_layers = [h]
        if training and rng is not None and self.dropout > 0:
            rng_edge, rng_feat = jax.random.split(rng)

            def adj_spmm(x):
                # one mask per step, shared across layers (the reference
                # drops the adjacency once per forward, model.py:4030-4044);
                # generated in-layout from the edge id — no [nnz] vector
                return spmm_bucketed_dropout(adj, x, rng_edge, self.dropout)

        else:
            rng_feat = rng

            def adj_spmm(x):
                return spmm_bucketed(adj, x)

        for i in range(self.n_layers):
            m0 = adj_spmm(h)
            m1 = h * m0
            m0 = apply_linear(params["gc_layers"][i], m0)
            m1 = apply_linear(params["bi_layers"][i], m1)
            h = jax.nn.leaky_relu(m0 + m1, negative_slope=0.2)
            if training and rng_feat is not None and self.dropout > 0:
                rng_feat, sub = jax.random.split(rng_feat)
                keep = jax.random.uniform(sub, h.shape) >= self.dropout
                h = jnp.where(keep, h / (1.0 - self.dropout), 0.0)
            # clamp INSIDE the sqrt: clamping the norm outside still lets
            # norm's VJP compute h/norm = 0/0 for an exactly-zero row before
            # the clamp's zero cotangent arrives (0 * nan = nan). Zero rows
            # are REAL here: an isolated node (self-loop only — zero-degree
            # items exist at catalog scale) whose self-loop is edge-dropped
            # has m0 = m1 = 0 -> h = 0; the nan reached the params through
            # the backward on the first Gowalla-scale step (found via the
            # r04 bench's loss=nan + jax_debug_nans).
            norm = jnp.sqrt(
                jnp.maximum(jnp.sum(h * h, axis=1, keepdims=True), 1e-24)
            )
            all_layers.append(h / norm)
        return jnp.concatenate(all_layers, axis=1)

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        rep = self.get_rep(params, rng=rng, training=training, buffers=buffers)
        users_r = rep[users]
        pos_r = rep[self.n_users + pos_items]
        neg_r = rep[self.n_users + neg_items]
        l2 = l2_sq_rows(users_r, pos_r, neg_r)
        return users_r, pos_r, neg_r, l2
