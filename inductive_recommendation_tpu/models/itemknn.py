"""ItemKNN (reference model.py:4058-4088): Jaccard item-item similarity,
top-k neighbors per item, score = user profile x similarity matrix.

The reference loops every item on the CPU against a scipy CSR
(model.py:4072-4080: one sparse matvec per item). Here the similarity is
computed on device in item blocks: intersections for a block are one SpMM of
R^T against the block's dense user columns, Jaccard is elementwise, and the
per-item top-k is a single ``lax.top_k`` over the block — n_items/block
device steps total, no python inner loops. Scoring runs through the bucketed
SpMM of the (sparse, k-per-row) similarity transpose.

Divergence (documented): the reference's ``np.argsort(sims)[-k:]`` keeps
ties by index order; ``lax.top_k`` breaks ties by lowest index — identical
sets except among exactly-tied similarity values.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.data.dataset import device_padded_from_lists
from inductive_recommendation_tpu.models.base import BasicModel
from inductive_recommendation_tpu.ops import build_bucketed_spmm, spmm_bucketed
from inductive_recommendation_tpu.utils.profiles import dense_profiles


class ItemKNN(BasicModel):
    trainable = False

    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.k = model_config["k"]
        self._build_similarity(dataset, block=model_config.get("sim_block", 512))
        # built ON DEVICE from O(E) components — never upload an
        # O(n_users * max_degree) padded matrix over the ~MB/s H2D path
        self.buffers["train_padded"] = device_padded_from_lists(
            dataset.train_data, self.n_items
        )

    def _build_similarity(self, dataset, block):
        n_users, n_items = self.n_users, self.n_items
        train_array = np.asarray(dataset.train_array).reshape(-1, 2)
        # coalesce duplicate (u, i) pairs (external train files may repeat
        # them): the Jaccard numerator must be binary on BOTH sides — a
        # multiplicity-weighted R^T against one-hot block columns would make
        # S asymmetric (the reference's scipy-CSR semantics are set-based)
        train_array = np.unique(train_array, axis=0)
        users, items = train_array[:, 0], train_array[:, 1]
        item_deg = np.bincount(items, minlength=n_items).astype(np.float32)

        # R^T as bucketed spmm: rows=items, cols=users
        rt = build_bucketed_spmm(
            items, users, np.ones(len(items), np.float32), (n_items, n_users)
        )
        # per-item user lists, padded (sentinel n_users scatters off the
        # edge); device-built from O(E) components
        item_users = [[] for _ in range(n_items)]
        for u, i in zip(users.tolist(), items.tolist()):
            item_users[i].append(u)
        iu_padded = device_padded_from_lists(item_users, n_users)
        deg_d = jnp.asarray(item_deg)
        k = min(self.k, n_items)

        # the big buffers (rt layout, padded item-user rows) are jit ARGUMENTS
        # — closure constants get baked into the compiled payload and break
        # the remote-compile size limit at real graph sizes (CLAUDE.md)
        @jax.jit
        def block_topk(rt, iu_padded, deg_d, block_ids):
            # dense user-columns for the block's items: [n_users, bs]
            rows = iu_padded[block_ids]  # [bs, L]
            bs = rows.shape[0]
            cols = jnp.zeros((n_users + 1, bs), jnp.float32)
            cols = cols.at[rows.T, jnp.arange(bs)[None, :]].set(1.0)[:-1]
            inter = spmm_bucketed(rt, cols)  # [n_items, bs]
            denom = deg_d[:, None] + deg_d[block_ids][None, :] - inter
            sims = jnp.where(denom > 0, inter / jnp.maximum(denom, 1e-12), 0.0)
            sims = jnp.where(deg_d[:, None] > 0, sims, 0.0)
            top_v, top_i = jax.lax.top_k(sims.T, k)  # [bs, k]
            return top_v, top_i

        rows_out, cols_out, vals_out = [], [], []
        for start in range(0, n_items, block):
            ids = np.arange(start, min(start + block, n_items))
            pad = block - len(ids)
            ids_p = np.concatenate([ids, np.zeros(pad, ids.dtype)])
            tv, ti = block_topk(rt, iu_padded, deg_d, jnp.asarray(ids_p))
            tv = np.asarray(tv[: len(ids)])
            ti = np.asarray(ti[: len(ids)])
            rows_out.append(np.repeat(ids, k))
            cols_out.append(ti.reshape(-1))
            vals_out.append(tv.reshape(-1))
        s_row = np.concatenate(rows_out)
        s_col = np.concatenate(cols_out)
        s_val = np.concatenate(vals_out)
        # scoring computes P @ S as (S^T @ P^T)^T -> build S^T directly
        self.buffers = {
            "sim_t": build_bucketed_spmm(
                s_col, s_row, s_val, (n_items, n_items)
            )
        }

    def init_params(self, rng):
        return {}

    def make_scoring_state(self, params, buffers=None):
        return self._buf(buffers)

    def score(self, state, users):
        profiles = dense_profiles(state["train_padded"], users, self.n_items)
        return spmm_bucketed(state["sim_t"], profiles.T).T
