"""Metric parity vs a direct numpy port of the reference loops
(trainer.py:115-144)."""

import numpy as np

from inductive_recommendation_tpu.eval.metrics import calculate_metrics


def reference_metrics(eval_data, rec_items, topks):
    """Line-for-line numpy oracle of reference trainer.py:115-144."""
    results = {"Precision": {}, "Recall": {}, "NDCG": {}}
    hit_matrix = np.zeros_like(rec_items, dtype=np.float32)
    for user in range(rec_items.shape[0]):
        for item_idx in range(rec_items.shape[1]):
            if rec_items[user, item_idx] in eval_data[user]:
                hit_matrix[user, item_idx] = 1.0
    eval_data_len = np.array([len(items) for items in eval_data], dtype=np.int32)
    for k in topks:
        hit_num = np.sum(hit_matrix[:, :k], axis=1)
        precisions = hit_num / k
        with np.errstate(invalid="ignore", divide="ignore"):
            recalls = hit_num / eval_data_len
        max_hit_num = np.minimum(eval_data_len, k)
        max_hit_matrix = np.zeros_like(hit_matrix[:, :k], dtype=np.float32)
        for user, num in enumerate(max_hit_num):
            max_hit_matrix[user, :num] = 1.0
        denominator = np.log2(np.arange(2, k + 2, dtype=np.float32))[None, :]
        dcgs = np.sum(hit_matrix[:, :k] / denominator, axis=1)
        idcgs = np.sum(max_hit_matrix / denominator, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            ndcgs = dcgs / idcgs
        user_masks = max_hit_num > 0
        results["Precision"][k] = precisions[user_masks].mean()
        results["Recall"][k] = recalls[user_masks].mean()
        results["NDCG"][k] = ndcgs[user_masks].mean()
    return results


def test_metrics_parity_random(rng):
    n_users, n_items, K = 50, 200, 25
    topks = [1, 5, 10, 20, 25]
    rec_items = np.stack(
        [rng.choice(n_items, size=K, replace=False) for _ in range(n_users)]
    )
    eval_data = []
    for u in range(n_users):
        n = int(rng.integers(0, 12))
        eval_data.append(list(rng.choice(n_items, size=n, replace=False)))
    got = calculate_metrics(eval_data, rec_items, topks)
    want = reference_metrics(eval_data, rec_items, topks)
    for metric in want:
        for k in topks:
            assert abs(got[metric][k] - want[metric][k]) < 1e-5, (metric, k)


def test_metrics_handcomputed():
    # 2 users, k=2: user0 gt={1,2}, recs [1, 5] -> hits [1,0]
    # user1 gt={7}, recs [3, 7] -> hits [0,1]
    eval_data = [[1, 2], [7]]
    rec_items = np.array([[1, 5], [3, 7]])
    got = calculate_metrics(eval_data, rec_items, [2])
    assert abs(got["Precision"][2] - 0.5) < 1e-6
    assert abs(got["Recall"][2] - (0.5 + 1.0) / 2) < 1e-6
    # ndcg user0: dcg=1/log2(2)=1, idcg=1/log2(2)+1/log2(3); user1:
    # dcg=1/log2(3), idcg=1/log2(2)=1
    idcg0 = 1.0 + 1.0 / np.log2(3)
    ndcg0 = 1.0 / idcg0
    ndcg1 = 1.0 / np.log2(3)
    assert abs(got["NDCG"][2] - (ndcg0 + ndcg1) / 2) < 1e-6


def test_metrics_empty_users_masked():
    eval_data = [[1], [], []]
    rec_items = np.array([[1, 2], [0, 1], [2, 3]])
    got = calculate_metrics(eval_data, rec_items, [2])
    # only user 0 counts
    assert abs(got["Recall"][2] - 1.0) < 1e-6
    assert abs(got["Precision"][2] - 0.5) < 1e-6
