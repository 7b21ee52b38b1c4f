"""Vectorized top-k ranking metrics.

Exact-parity re-derivation of the reference's per-user python loops
(trainer.py:115-144):

- hit_matrix[u, j] = 1 if rec_items[u, j] in eval_data[u]
- Precision@k = hits/k, Recall@k = hits/|gt|
- NDCG@k = DCG/IDCG with DCG denominators log2(j+2) and ideal DCG over
  min(|gt|, k) leading slots
- every mean is over users with |gt| > 0 only (trainer.py:140-143; the
  reference's mask is min(|gt|, k) > 0 which equals |gt| > 0 for k >= 1)

The whole computation is one jnp pass over [n_users, K] instead of the
reference's O(n_users * K) python loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.data.dataset import pad_user_lists


def _hit_matrix(rec_items: jnp.ndarray, gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """[n_users, K] membership of recommended items in per-user sorted gt
    rows (padded with a large sentinel)."""
    n_users, K = rec_items.shape
    L = gt_sorted.shape[1]

    def row_hits(row_gt, row_rec):
        pos = jnp.clip(jnp.searchsorted(row_gt, row_rec), 0, L - 1)
        return row_gt[pos] == row_rec

    import jax

    return jax.vmap(row_hits)(gt_sorted, rec_items).astype(jnp.float32)


def calculate_metrics(eval_data, rec_items, topks):
    """eval_data: list of per-user ground-truth item lists;
    rec_items: [n_users, K>=max(topks)] recommended item ids.
    Returns {'Precision': {k: float}, 'Recall': {...}, 'NDCG': {...}}.
    """
    rec_items = jnp.asarray(np.asarray(rec_items, dtype=np.int64))
    n_users, K = rec_items.shape
    n_sentinel = int(rec_items.max(initial=0)) + 2
    gt_padded, gt_len = pad_user_lists(eval_data, n_sentinel, sort=True)
    gt_sorted = jnp.asarray(gt_padded)
    gt_len = jnp.asarray(gt_len.astype(np.float32))

    hits = _hit_matrix(rec_items, gt_sorted)  # [n_users, K]
    denom = 1.0 / jnp.log2(jnp.arange(2, K + 2, dtype=jnp.float32))
    dcg_cum = jnp.cumsum(hits * denom[None, :], axis=1)  # [n_users, K]
    hit_cum = jnp.cumsum(hits, axis=1)
    ideal_cum = jnp.cumsum(denom)  # [K]

    user_mask = gt_len > 0
    n_valid = jnp.maximum(user_mask.sum(), 1)

    results = {"Precision": {}, "Recall": {}, "NDCG": {}}
    for k in topks:
        hit_num = hit_cum[:, k - 1]
        precision = hit_num / k
        recall = jnp.where(gt_len > 0, hit_num / jnp.maximum(gt_len, 1.0), 0.0)
        max_hit = jnp.minimum(gt_len, float(k)).astype(jnp.int32)
        idcg = ideal_cum[jnp.clip(max_hit - 1, 0, K - 1)]
        ndcg = jnp.where(gt_len > 0, dcg_cum[:, k - 1] / jnp.maximum(idcg, 1e-12), 0.0)
        results["Precision"][k] = float(jnp.where(user_mask, precision, 0.0).sum() / n_valid)
        results["Recall"][k] = float(jnp.where(user_mask, recall, 0.0).sum() / n_valid)
        results["NDCG"][k] = float(jnp.where(user_mask, ndcg, 0.0).sum() / n_valid)
    return results
