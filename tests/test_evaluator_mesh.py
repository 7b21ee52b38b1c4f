"""Evaluator with a mesh: sharded retrieval produces identical metrics."""

import numpy as np

import jax

from inductive_recommendation_tpu import get_dataset, get_model
from inductive_recommendation_tpu.eval.evaluator import Evaluator
from inductive_recommendation_tpu.parallel import make_mesh


def test_evaluator_mesh_matches_single_device():
    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 50,
            "n_items": 44,
            "n_interactions": 700,
            "seed": 9,
            "split_ratio": [0.7, 0.15, 0.15],
            "min_inter": 3,
        }
    )
    model = get_model({"name": "LightGCN", "embedding_size": 16, "n_layers": 2}, ds)
    params = model.init_params(jax.random.key(0))

    ev1 = Evaluator(ds, [1, 5, 10, 15, 20, 25], test_batch_size=16)
    ev8 = Evaluator(
        ds,
        [1, 5, 10, 15, 20, 25],
        test_batch_size=16,
        mesh=make_mesh(n_data=2, n_model=4),
    )
    for stage in ("val", "test"):
        _, m1 = ev1.evaluate(model, params, stage)
        _, m8 = ev8.evaluate(model, params, stage)
        for metric in m1:
            for k, v in m1[metric].items():
                # ev1 sums metrics on device in f32; ev8 on host in f64
                assert abs(v - m8[metric][k]) < 1e-6, (stage, metric, k)
