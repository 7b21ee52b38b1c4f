"""DOSE_aug step breakdown on the real chip — the committed artifact behind
BASELINE.md's "the delta is at its floor" claim (round-4 verdict item 3).

Phases are isolated by timing value_and_grad+adam of nested loss variants
(identical batch, identical params; each variant adds one component):

  bpr        : main propagation BPR + L2 only
  + aux      : + the auxiliary BPR on the core table
  + view     : + InfoNCE over the view propagation with the injected-pair
               delta EMPTIED (a BakedView with zero-size delta arrays —
               static shapes, the view-BASE cost alone)
  + delta    : the full step (real fixed-budget delta, steady-state view)

so  delta tax = t_full - t_noDelta,  view base = t_noDelta - t_aux,  etc.

Also micro-times the delta SpMM alone (fwd and fwd+bwd at the real [2*aug]
entry count) and the raw sorted segment-sum, so the phase number traces to
the kernel measurement. ``--json PATH`` writes the committed artifact
(DOSE_BREAKDOWN_r{N}.json); without it, stderr diagnostics only.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from inductive_recommendation_tpu.data.dataset import (
    AuxiliaryDataset,
    quick_synthetic_dataset,
)
from inductive_recommendation_tpu.data.sampling import (
    build_sampler_state,
    sample_bpr_batch,
)
from inductive_recommendation_tpu.models import get_model
from inductive_recommendation_tpu.train import losses as L


def _timeit(fn, *args, iters=15):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    ds = quick_synthetic_dataset(29858, 40981, 1_200_000, seed=0)
    # bench.py's measure_dose_aug config (Gowalla grid aug_num=500000)
    model = get_model(
        {
            "name": "DOSE_aug",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
            "aug_num": 500_000,
            "aug_rate": 0.1,
        },
        ds,
    )
    optimizer = optax.adam(1e-3)
    params = model.init_params(jax.random.key(0))
    opt_state = optimizer.init(params)
    # steady state: a REAL view delta (construction views have an all-zero
    # delta — a degenerate fast path, see bench.py)
    model.feat_mat_anneal()
    model.update_aug_adj(params)
    buffers = model.buffers

    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    batch = 2048
    l2_reg, aux_reg, c_reg = 1e-4, 0.01, 0.01
    user_dim = model.user_dim

    # the delta-emptied BakedView: same base (baked values), zero-size delta
    from inductive_recommendation_tpu.graph.views import BakedView

    bv = buffers["aug_adj"]
    z_i = jnp.zeros((0,), jnp.int32)
    z_f = jnp.zeros((0,), jnp.float32)
    bv_nodelta = BakedView(
        base=bv.base, d_row=z_i, d_col=z_i, d_val=z_f,
        dt_row=z_i, dt_col=z_i, dt_val=z_f, ck_fwd=None, ck_bwd=None,
        n_nodes=bv.n_nodes,
    )

    def make_step(level):
        """level: 'bpr' | 'aux' | 'view' (empty delta) | 'full'."""

        def step(params, opt_state, b, smp, aux_smp, seed):
            rng = jax.random.fold_in(jax.random.key(0), seed)
            rng_s, rng_a, rng_m = jax.random.split(rng, 3)
            users, pos, neg = sample_bpr_batch(smp, rng_s, batch)
            a_users, a_pos, a_neg = sample_bpr_batch(aux_smp, rng_a, batch)

            def loss_fn(p):
                if level == "bpr":
                    u_r, p_r, n_r, l2 = model._main_forward(
                        p, users, pos, neg[:, 0], rng_m, True, b
                    )
                    closs = 0.0
                else:
                    u_r, p_r, n_r, l2, closs = model.bpr_forward(
                        p, users, pos, neg[:, 0], rng=rng_m, training=True,
                        buffers=b,
                    )
                    closs = 0.0 if level == "aux" else closs.mean()
                total = L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()
                if level != "bpr":
                    total = total + aux_reg * L.aux_bpr_w(
                        p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0],
                        user_dim,
                    )
                return total + c_reg * closs

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    # NOTE: 'aux' reuses bpr_forward (so the view branch IS computed there);
    # isolating the view means swapping the BUFFERS, not the loss: level
    # 'aux' gets closs multiplied by 0 — XLA does NOT remove the branch for
    # a traced multiply, so instead we time 'aux' with a separate loss that
    # never touches the view. Rebuild explicitly:
    def make_aux_step():
        def step(params, opt_state, b, smp, aux_smp, seed):
            rng = jax.random.fold_in(jax.random.key(0), seed)
            rng_s, rng_a, rng_m = jax.random.split(rng, 3)
            users, pos, neg = sample_bpr_batch(smp, rng_s, batch)
            a_users, a_pos, a_neg = sample_bpr_batch(aux_smp, rng_a, batch)

            def loss_fn(p):
                u_r, p_r, n_r, l2 = model._main_forward(
                    p, users, pos, neg[:, 0], rng_m, True, b
                )
                return (
                    L.bpr_loss(u_r, p_r, n_r)
                    + l2_reg * l2.mean()
                    + aux_reg * L.aux_bpr_w(
                        p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0],
                        user_dim,
                    )
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def run(step, b, tag):
        ms = _timeit(
            lambda: step(params, opt_state, b, sampler, aux_sampler, 1)
        )
        print(f"# {tag:18s} {ms:8.2f} ms", file=sys.stderr)
        return ms

    t_bpr = run(make_step("bpr"), buffers, "bpr+l2")
    t_aux = run(make_aux_step(), buffers, "+aux")
    b_nodelta = dict(buffers)
    b_nodelta["aug_adj"] = bv_nodelta
    t_view = run(make_step("full"), b_nodelta, "+view (no delta)")
    t_full = run(make_step("full"), buffers, "+delta (full)")

    # kernel-level: the delta SpMM alone at the real entry count
    delta = (bv.d_row, bv.d_col, bv.d_val, bv.dt_row, bv.dt_col, bv.dt_val)
    from inductive_recommendation_tpu.graph.views import _delta_spmm

    x = params["embedding"]
    n_nodes = model.n_users + model.n_items
    xn = jnp.zeros((n_nodes, 64), jnp.float32).at[: x.shape[0]].set(
        x[: min(x.shape[0], n_nodes)]
    )
    fwd = jax.jit(lambda d, x: _delta_spmm(d, x))
    t_delta_fwd = _timeit(fwd, delta, xn)
    fwdbwd = jax.jit(jax.grad(lambda x: jnp.sum(_delta_spmm(delta, x))))
    t_delta_fwdbwd = _timeit(fwdbwd, xn)
    g = jnp.take(xn, bv.d_col, axis=0) * bv.d_val[:, None]
    seg = jax.jit(
        lambda g, r: jax.ops.segment_sum(
            g, r, num_segments=n_nodes, indices_are_sorted=True
        )
    )
    t_segsum = _timeit(seg, g, bv.d_row)
    # the production scatter-free path (chunked structures baked per epoch)
    from inductive_recommendation_tpu.graph.views import chunked_delta_spmm

    ck = jax.jit(lambda f, b, x: chunked_delta_spmm(f, b, x))
    t_ck_fwd = _timeit(ck, bv.ck_fwd, bv.ck_bwd, xn)
    ckg = jax.jit(
        jax.grad(lambda x: jnp.sum(chunked_delta_spmm(bv.ck_fwd, bv.ck_bwd, x)))
    )
    t_ck_fwdbwd = _timeit(ckg, xn)
    n_entries = int(bv.d_row.shape[0])
    print(
        f"# delta segsum-oracle fwd {t_delta_fwd:.2f} ms | fwd+bwd "
        f"{t_delta_fwdbwd:.2f} ms | raw segsum {t_segsum:.2f} ms | "
        f"CHUNKED fwd {t_ck_fwd:.2f} ms | fwd+bwd {t_ck_fwdbwd:.2f} ms "
        f"@ {n_entries} entries",
        file=sys.stderr,
    )

    # ---- DOSE_aug2: the aug-FEATURE-matrix tax on top of DOSE_aug --------
    # The view branch swaps the train feat base for the per-epoch aug-feat
    # base (same entry count + annealing — a wash) and ADDS the injected-
    # entry rect delta (2*aug_num entries through the chunked structs, one
    # application per step). Isolate it by timing the full aug2 step with
    # and without the aug_feat_delta buffers (different trace, same shapes
    # otherwise).
    model2 = get_model(
        {
            "name": "DOSE_aug2",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.3,
            "feature_ratio": 1.0,
            "aug_num": 500_000,
            "aug_rate": 0.1,
        },
        ds,
    )
    params2 = model2.init_params(jax.random.key(0))
    opt_state2 = optimizer.init(params2)
    model2.feat_mat_anneal()
    model2.update_aug_adj(params2)
    buffers2 = model2.buffers
    aux2 = AuxiliaryDataset(ds, model2.user_map, model2.item_map)
    aux2_sampler = build_sampler_state(aux2.train_data, aux2.n_items)
    user_dim2 = model2.user_dim

    def make_aug2_step():
        def step(params, opt_state, b, smp, aux_smp, seed):
            rng = jax.random.fold_in(jax.random.key(0), seed)
            rng_s, rng_a, rng_m = jax.random.split(rng, 3)
            users, pos, neg = sample_bpr_batch(smp, rng_s, batch)
            a_users, a_pos, a_neg = sample_bpr_batch(aux_smp, rng_a, batch)

            def loss_fn(p):
                u_r, p_r, n_r, l2, closs = model2.bpr_forward(
                    p, users, pos, neg[:, 0], rng=rng_m, training=True,
                    buffers=b,
                )
                total = (
                    L.bpr_loss(u_r, p_r, n_r)
                    + l2_reg * l2.mean()
                    + aux_reg * L.aux_bpr_w(
                        p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0],
                        user_dim2,
                    )
                )
                return total + c_reg * closs.mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def run2(b, tag):
        step = make_aug2_step()
        ms = _timeit(
            lambda: step(params2, opt_state2, b, sampler, aux2_sampler, 1)
        )
        print(f"# {tag:22s} {ms:8.2f} ms", file=sys.stderr)
        return ms

    t2_full = run2(buffers2, "aug2 full")
    b2_nod = dict(buffers2)
    b2_nod.pop("aug_feat_delta", None)
    b2_nod.pop("aug_feat_delta_ck", None)
    t2_noafd = run2(b2_nod, "aug2 (no aug-feat delta)")

    # kernel: the chunked rect delta alone (training path hashes dropout
    # masks from the entry keys) at the real entry count
    from inductive_recommendation_tpu.graph.views import (
        chunked_rect_delta_spmm_dropout,
    )

    ck2 = buffers2["aug_feat_delta_ck"]
    emb2 = params2["embedding"][: model2.feat_n_cols]
    kd = jax.random.key_data(jax.random.key(3))
    p_drop = jnp.asarray(0.3, jnp.float32)
    rect_drop = jax.jit(
        lambda f, b, k, p, x: chunked_rect_delta_spmm_dropout(f, b, k, p, x)
    )
    t_rect_fwd = _timeit(rect_drop, ck2[0], ck2[1], kd, p_drop, emb2)
    rect_g = jax.jit(
        jax.grad(
            lambda x: jnp.sum(
                chunked_rect_delta_spmm_dropout(ck2[0], ck2[1], kd, p_drop, x)
            )
        )
    )
    t_rect_fwdbwd = _timeit(rect_g, emb2)
    n_rect = int(buffers2["aug_feat_delta"][0].shape[0])
    print(
        f"# aug-feat CHUNKED rect delta (dropout) fwd {t_rect_fwd:.2f} ms | "
        f"fwd+bwd {t_rect_fwdbwd:.2f} ms @ {n_rect} entries",
        file=sys.stderr,
    )

    payload = {
        "config": "DOSE_aug Gowalla-scale d=64 L=3 batch=2048 aug_num=500000, steady-state view",
        "phase_ms": {
            "main_bpr_l2": round(t_bpr, 2),
            "aux": round(t_aux - t_bpr, 2),
            "view_base": round(t_view - t_aux, 2),
            "view_delta": round(t_full - t_view, 2),
            "full_step": round(t_full, 2),
        },
        "kernel_ms": {
            "delta_spmm_segsum_oracle_fwd": round(t_delta_fwd, 2),
            "delta_spmm_segsum_oracle_fwd_bwd": round(t_delta_fwdbwd, 2),
            "raw_sorted_segment_sum": round(t_segsum, 2),
            "chunked_delta_fwd": round(t_ck_fwd, 2),
            "chunked_delta_fwd_bwd": round(t_ck_fwdbwd, 2),
            "delta_entries": n_entries,
        },
        "n_view_delta_applications_per_step": int(model.n_layers),
        "aug2": {
            "config": "DOSE_aug2 same shape, steady-state aug feat + view",
            "phase_ms": {
                "full_step": round(t2_full, 2),
                "full_step_no_aug_feat_delta": round(t2_noafd, 2),
                "aug_feat_delta_tax": round(t2_full - t2_noafd, 2),
            },
            "kernel_ms": {
                "chunked_rect_delta_dropout_fwd": round(t_rect_fwd, 2),
                "chunked_rect_delta_dropout_fwd_bwd": round(t_rect_fwdbwd, 2),
                "rect_delta_entries": n_rect,
            },
            "n_aug_feat_delta_applications_per_step": 1,
        },
    }
    print(json.dumps(payload, indent=1), file=sys.stderr)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"# -> {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
