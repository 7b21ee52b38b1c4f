"""Device-side ranking-metric partial sums.

The reference computes Precision/Recall/NDCG on the host from fetched
recommendation lists (trainer.py:115-144). On a tunneled TPU backend the
device->host fetch of [n_users, 100] int32 recommendations dominates eval
wall-clock, so the fast path keeps everything on device: each user batch is
scored, masked, top-k'd AND reduced to per-metric partial sums in one jitted
call; only a [n_topks, 3] float vector + a valid-user count leave the device
per batch.

Semantics are an exact re-derivation of eval/metrics.py::calculate_metrics
(itself the vectorized form of trainer.py:115-144):

- hits[u, j]   = rec[u, j] in gt[u]
- Precision@k  = hits_1..k / k                  (divides by k, not min(k,K))
- Recall@k     = hits_1..k / |gt|               (0 when |gt| = 0)
- NDCG@k       = DCG@k / IDCG(min(|gt|, k))     (0 when IDCG = 0)
- all sums are over users with |gt| > 0; the caller divides by that count

Membership is a broadcast compare against the padded ground-truth rows
(pad sentinel = n_items can never equal a recommended id), so the rows do
not need to be sorted. For wide rows (``sorted_gt=True``; the caller sorts
each row once per eval) it switches to a fixed-iteration per-row binary
search, turning the O(K * m) compare into O(K * log m).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _hits_bsearch(rec, gt_sorted):
    """hits[b, j] = rec[b, j] in gt_sorted[b] (rows ascending; pad sentinel
    sorts last so it never matches)."""
    B, K = rec.shape
    m = gt_sorted.shape[1]
    lo = jnp.zeros((B, K), dtype=jnp.int32)
    hi = jnp.full((B, K), m, dtype=jnp.int32)
    # interval width starts at m; +1 halving to reach width 0 (lo == hi)
    for _ in range(m.bit_length() + 1):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(gt_sorted, jnp.minimum(mid, m - 1), axis=1)
        go_right = v < rec
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    found = jnp.take_along_axis(gt_sorted, jnp.minimum(lo, m - 1), axis=1)
    return jnp.logical_and(lo < m, found == rec)


def batch_metric_sums(rec, gt_rows, gt_len, valid, topks, sorted_gt=False):
    """Per-batch metric partial sums, all on device.

    rec:     [B, K] int32 recommended items (rank order)
    gt_rows: [B, m] int32 ground-truth items padded with the catalog-size
             sentinel (which can never equal a recommended id)
    gt_len:  [B] int32 ground-truth sizes
    valid:   [B] bool — False for padding users in the (short) last batch
    topks:   static tuple of cutoff ks
    returns ([n_topks, 3] f32 sums of (precision, recall, ndcg), f32 n_valid)
    """
    B, K = rec.shape
    if sorted_gt:
        hits = _hits_bsearch(rec, gt_rows)
    else:
        hits = jnp.any(rec[:, :, None] == gt_rows[:, None, :], axis=-1)
    hits = hits.astype(jnp.float32)  # [B, K]

    denom = 1.0 / np.log2(np.arange(2, K + 2, dtype=np.float64))
    denom_j = jnp.asarray(denom, dtype=jnp.float32)
    ideal_cum = jnp.asarray(np.cumsum(denom), dtype=jnp.float32)  # [K]

    hit_cum = jnp.cumsum(hits, axis=1)
    dcg_cum = jnp.cumsum(hits * denom_j[None, :], axis=1)

    gt_len_f = gt_len.astype(jnp.float32)
    mask = jnp.logical_and(gt_len > 0, valid)
    mask_f = mask.astype(jnp.float32)

    rows = []
    for k in topks:
        kk = min(k, K)
        hit_num = hit_cum[:, kk - 1]
        precision = hit_num / float(k)
        recall = jnp.where(mask, hit_num / jnp.maximum(gt_len_f, 1.0), 0.0)
        max_hit = jnp.minimum(gt_len, k)
        idcg = ideal_cum[jnp.clip(max_hit - 1, 0, K - 1)]
        ndcg = jnp.where(idcg > 0, dcg_cum[:, kk - 1] / idcg, 0.0)
        rows.append(
            jnp.stack(
                [
                    jnp.sum(precision * mask_f),
                    jnp.sum(recall * mask_f),
                    jnp.sum(ndcg * mask_f),
                ]
            )
        )
    return jnp.stack(rows), jnp.sum(mask_f)


def combine_metric_sums(batch_sums, batch_valids, topks):
    """Host-side: combine per-batch [n_topks, 3] sums -> the metrics dict
    (same structure as eval/metrics.py::calculate_metrics)."""
    total = np.sum([np.asarray(s, dtype=np.float64) for s in batch_sums], axis=0)
    n_valid = max(float(np.sum([float(v) for v in batch_valids])), 1.0)
    results = {"Precision": {}, "Recall": {}, "NDCG": {}}
    for i, k in enumerate(topks):
        results["Precision"][k] = float(total[i, 0] / n_valid)
        results["Recall"][k] = float(total[i, 1] / n_valid)
        results["NDCG"][k] = float(total[i, 2] / n_valid)
    return results
