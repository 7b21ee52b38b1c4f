"""Device-side metric sums == host calculate_metrics (both membership
variants), and the Evaluator device path == the host recommend+metrics
path including banned items and inductive slices."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from inductive_recommendation_tpu import get_dataset, get_model
from inductive_recommendation_tpu.eval.device_metrics import (
    batch_metric_sums,
    combine_metric_sums,
)
from inductive_recommendation_tpu.eval.evaluator import Evaluator
from inductive_recommendation_tpu.eval.metrics import calculate_metrics

TOPKS = [1, 5, 10, 15, 20, 25]


def _random_case(rng, n_users=37, n_items=120, K=25, max_gt=9):
    rec = np.stack(
        [rng.choice(n_items, size=K, replace=False) for _ in range(n_users)]
    ).astype(np.int32)
    gt = [
        list(rng.choice(n_items, size=rng.integers(0, max_gt), replace=False))
        for _ in range(n_users)
    ]
    return rec, gt


def _device_metrics(rec, gt, n_items, topks, sorted_gt):
    n_users = rec.shape[0]
    m = max(1, max(len(l) for l in gt))
    rows = np.full((n_users, m), n_items, dtype=np.int32)
    for u, l in enumerate(gt):
        rows[u, : len(l)] = l
    if sorted_gt:
        rows = np.sort(rows, axis=1)
    sums, n_valid = jax.jit(
        batch_metric_sums, static_argnames=("topks", "sorted_gt")
    )(
        jnp.asarray(rec),
        jnp.asarray(rows),
        jnp.asarray([len(l) for l in gt], dtype=jnp.int32),
        jnp.ones(n_users, bool),
        tuple(topks),
        sorted_gt=sorted_gt,
    )
    return combine_metric_sums([sums], [n_valid], topks)


def test_batch_metric_sums_matches_host(rng):
    rec, gt = _random_case(rng)
    want = calculate_metrics(gt, rec, TOPKS)
    for sorted_gt in (False, True):
        got = _device_metrics(rec, gt, 120, TOPKS, sorted_gt)
        for metric in want:
            for k in TOPKS:
                assert abs(got[metric][k] - want[metric][k]) < 1e-6, (
                    sorted_gt,
                    metric,
                    k,
                )


def test_evaluator_device_path_matches_host_path(rng):
    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 41,
            "n_items": 53,
            "n_interactions": 600,
            "seed": 3,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 2,
        }
    )
    model = get_model({"name": "LightGCN", "embedding_size": 16, "n_layers": 2}, ds)
    params = model.init_params(jax.random.key(1))
    ev = Evaluator(ds, TOPKS, test_batch_size=16)

    for stage, banned in [
        ("val", None),
        ("test", None),
        ("test", np.arange(40, ds.n_items)),
    ]:
        _, got = ev.evaluate(model, params, stage, banned_items=banned)
        rec = ev.recommend(model, params, stage, banned_items=banned)
        want = calculate_metrics(getattr(ds, stage + "_data"), rec, TOPKS)
        for metric in want:
            for k in TOPKS:
                assert abs(got[metric][k] - want[metric][k]) < 1e-6, (
                    stage,
                    metric,
                    k,
                )


@pytest.mark.slow
def test_inductive_eval_device_vs_host(rng):
    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 30,
            "n_items": 40,
            "n_interactions": 500,
            "seed": 5,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 2,
        }
    )
    model = get_model({"name": "MF", "embedding_size": 8}, ds)
    params = model.init_params(jax.random.key(2))
    ev = Evaluator(ds, TOPKS, test_batch_size=8)
    out = ev.inductive_eval(model, params, n_old_users=20, n_old_items=25,
                            verbose=False)
    assert len(out) == 6
    # spot-check one slice against the host pipeline
    old_i = [[i for i in t if i < 25] for t in ds.test_data]
    rec = ev.recommend(
        model, params, "test", banned_items=np.arange(25, ds.n_items)
    )
    want = calculate_metrics(old_i, rec, TOPKS)
    got = out["All users and old items"]
    for metric in want:
        for k in TOPKS:
            assert abs(got[metric][k] - want[metric][k]) < 1e-6
