"""Guard for the end-to-end flagship golden-parity harness
(benchmarks/golden_parity_flagships.py, artifact GOLDEN_r05.json): the same
two-sided multi-epoch run — anneal + epoch-end selection on BOTH sides,
metric trajectories through the shared evaluator — at reduced scale.

Tolerances: IGCN has no selection, so the two sides track to metric noise
(< 0.005 abs, the artifact gate). DOSE's epoch-end cos-top-k flips fp-level
near-ties between the two implementations' reps; at THIS tiny scale (k=50
of 3000 candidate pairs) tie density is far above the real runs', so the
gate is wider (0.03) — the committed full-scale artifact carries the real
numbers plus the per-epoch selection-Jaccard trajectory."""

import importlib.util
import os

import pytest

pytestmark = pytest.mark.slow


def _harness():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "golden_parity_flagships.py",
    )
    spec = importlib.util.spec_from_file_location("golden_flagships", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_igcn_golden_end_to_end_small():
    g = _harness()
    r = g.run_family(
        "IGCN", n_users=60, n_items=50, n_inter=1500, d=16, n_layers=2,
        n_epochs=4, batch=128, eval_every=2,
    )
    assert r["max_abs_recall_diff"] < 0.005, r
    assert r["max_abs_ndcg_diff"] < 0.005, r
    # the trajectory must be real training, not a frozen model
    assert r["trajectory"][-1]["ours_recall20"] > 0.2


def test_dose_aug_golden_end_to_end_small():
    g = _harness()
    r = g.run_family(
        "DOSE_aug", n_users=60, n_items=50, n_inter=1500, d=16, n_layers=2,
        n_epochs=6, batch=128, eval_every=2, aug_num=50,
    )
    assert r["max_abs_recall_diff"] < 0.03, r
    assert r["max_abs_ndcg_diff"] < 0.03, r
    # both sides select nearly the same pairs every epoch
    for row in r["trajectory"]:
        assert row["selection_jaccard"] > 0.7, row
