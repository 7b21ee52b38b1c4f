"""Per-EPOCH boundary cost (r5 verdict item 4): time the DOSE epoch-end
machinery end-to-end at the Gowalla (aug 500k) and Amazon (aug 800k) tiers
— the work that replaces reference trainer.py:298-299's epoch hook:

- ``feat_mat_anneal``: anneal alpha + re-bake the feat layout values
  (ops.bucketed_spmm.with_annealed_values)
- ``update_aug_adj`` sub-phases: cos-top-k selection over the full catalog
  (the blockwise replacement for model.py:503-545), the device view build
  (make_view_on_device), and bake_view (keep-mask x normalization folded
  into value copies + the chunked delta-gather structures)
- the full ``update_aug_adj`` call (includes everything above)

Each figure is compared against the measured steady-state step time x
steps-per-epoch, so the artifact states the boundary as a fraction of a
real training epoch — the number round-4 defended only with prose.

Run (TPU): python benchmarks/epoch_boundary.py --json EPOCH_BOUNDARY_r05.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
from inductive_recommendation_tpu.graph.views import bake_view
from inductive_recommendation_tpu.models import get_model

# steady-state DOSE_aug step ms from the committed artifacts
STEP_MS = {
    "gowalla": ("DOSE_BREAKDOWN_r04.json full_step", 124.37),
    "amazon": ("BENCH_SCALE_r04.json dose_aug800k (568 ms)", 568.0),
}
BATCH = 2048


def _sync(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    float(jnp.sum(leaves[0].astype(jnp.float32)))


def _timeit(fn, iters=5):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def measure_tier(tier, n_users, n_items, n_inter, aug_num):
    ds = quick_synthetic_dataset(n_users, n_items, n_inter, seed=0)
    model = get_model(
        {
            "name": "DOSE_aug",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
            "aug_num": aug_num,
            "aug_rate": 0.1,
        },
        ds,
    )
    params = model.init_params(jax.random.key(0))

    # -- feat_mat_anneal (alpha decay + re-bake of the feat layout values)
    def anneal():
        model.feat_mat_anneal()
        return model.buffers["feat"]

    t_anneal = _timeit(anneal)

    # -- update_aug_adj sub-phases
    def select():
        return model._cos_pairs(params, aug_num, negate_items=True, device=True)

    t_select = _timeit(select)
    sel = select()

    def view_build():
        return model.view_engine.make_view_on_device(add_pairs=sel)

    t_view = _timeit(view_build)
    view = view_build()

    def bake():
        return bake_view(model.view_engine.base, view)

    t_bake = _timeit(bake)

    def full():
        model.update_aug_adj(params)
        return model.buffers["aug_adj"]

    t_full = _timeit(full)

    steps_per_epoch = max(1, len(ds.train_array) // BATCH)
    src, step_ms = STEP_MS[tier]
    epoch_ms = steps_per_epoch * step_ms
    boundary_ms = t_anneal + t_full
    row = {
        "tier": tier,
        "scale": f"{n_users}x{n_items}",
        "aug_num": aug_num,
        "feat_mat_anneal_ms": round(t_anneal, 1),
        "update_aug_adj_ms": round(t_full, 1),
        "  selection_cos_topk_ms": round(t_select, 1),
        "  view_build_ms": round(t_view, 1),
        "  bake_plus_chunk_structs_ms": round(t_bake, 1),
        "steps_per_epoch": steps_per_epoch,
        "step_ms_source": src,
        "epoch_compute_ms": round(epoch_ms, 0),
        "boundary_ms_total": round(boundary_ms, 1),
        "boundary_pct_of_epoch": round(100.0 * boundary_ms / epoch_ms, 2),
    }
    print(json.dumps(row, indent=1), file=sys.stderr)
    return row


def _release():
    import gc

    gc.collect()
    jax.clear_caches()
    gc.collect()


def main():
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    rows = [measure_tier("gowalla", 29858, 40981, 1_200_000, 500_000)]
    _release()
    rows.append(measure_tier("amazon", 52643, 91599, 4_800_000, 800_000))
    payload = {"tiers": rows}
    print(json.dumps(payload, indent=1))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
