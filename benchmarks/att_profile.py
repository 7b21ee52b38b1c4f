"""AttIGCN per-phase breakdown (r5 verdict item 3): trace the flagship's
2.85x-below-BPR step time to measured kernel floors, the way
dose_profile.py did for DOSE (which paid for itself with +28%).

Phases (each a full jitted fwd+bwd+adam step with the IGCNTrainer loss —
bpr + l2 + aux; reference spec model.py:4224-4287):

- ``floor_step``:  x0 = plain feat SpMM (the IGCN-alpha0 step — shared floor)
- ``qproj_step``:  floor + the detached query-side feat SpMM + Wq projection
                   (kept live with an epsilon-weighted loss term)
- ``full_step``:   the real attention x0 (fused-kv scores + per-head edge
                   softmax + weighted aggregation)

Kernel-level floors: feat SpMM fwd / fwd+bwd (the 6.7 ms random-gather
floor), attention x0 fwd / fwd+bwd, head scaling (h=1 vs h=4), and the
backward split by path — d(embedding) flows only through the value
aggregation (the scatter-add path), d(Wq/Wk) only through the score/softmax
chain — so the artifact shows WHERE the fwd+bwd premium lives.

Run (TPU): python benchmarks/att_profile.py --json ATT_BREAKDOWN_r05.json
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
from inductive_recommendation_tpu.models.base import l2_sq_rows
from inductive_recommendation_tpu.ops import propagate_mean, spmm_bucketed
from inductive_recommendation_tpu.ops.attention_spmm import attention_spmm_fused_kv
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
    # bench.py's measure_att_igcn config (n_heads defaults to 4)
    model = get_model(
        {
            "name": "AttIGCN",
            "embedding_size": 64,
            "n_layers": 3,
            "dropout": 0.0,
            "feature_ratio": 1.0,
        },
        ds,
    )
    optimizer = optax.adam(1e-3)
    params = model.init_params(jax.random.key(0))
    opt_state = optimizer.init(params)
    buffers = model.buffers
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    batch, l2_reg, aux_reg = 2048, 1e-4, 0.01
    user_dim = model.user_dim
    d, h = model.embedding_size, model.n_heads
    T = model.temperature

    def x0_of(p, b, level):
        emb = p["embedding"][: model.feat_n_cols]
        if level == "floor":
            return spmm_bucketed(b["feat"], emb)
        emb_sg = jax.lax.stop_gradient(emb)
        x_q = spmm_bucketed(b["feat"], emb_sg)
        q = (x_q @ p["weight_q"]["w"] + p["weight_q"]["b"]).reshape(-1, h, d)
        if level == "qproj":
            # keep the query chain live without the attention math: an
            # epsilon-weighted loss term (a true *0 multiply invites DCE)
            return spmm_bucketed(b["feat"], emb) + 1e-30 * jnp.sum(q)
        return attention_spmm_fused_kv(
            b["feat"], q, p["weight_k"]["w"], p["weight_k"]["b"], emb, T
        )

    def make_step(level):
        def step(params, opt_state, b, smp, aux_smp, seed):
            rng = jax.random.fold_in(jax.random.key(0), seed)
            rng_s, rng_a = jax.random.split(rng)
            users, pos, neg = sample_bpr_batch(smp, rng_s, batch)
            a_users, a_pos, a_neg = sample_bpr_batch(aux_smp, rng_a, batch)

            def loss_fn(p):
                rep = propagate_mean(b["norm_adj"], x0_of(p, b, level), 3)
                u_r, p_r, n_r = rep[users], rep[model.n_users + pos], rep[
                    model.n_users + neg[:, 0]
                ]
                l2 = l2_sq_rows(u_r, p_r, n_r)
                if level == "full":
                    l2 = l2 + jnp.sum(p["weight_q"]["w"] ** 2) + jnp.sum(
                        p["weight_k"]["w"] ** 2
                    )
                total = L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()
                return total + aux_reg * L.aux_bpr_w(
                    p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0], user_dim
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def run(step, tag):
        ms = _timeit(lambda: step(params, opt_state, buffers, sampler, aux_sampler, 1))
        print(f"# {tag:22s} {ms:8.2f} ms", file=sys.stderr)
        return ms

    t_floor = run(make_step("floor"), "floor (IGCN-alpha0)")
    t_qproj = run(make_step("qproj"), "+query chain")
    t_full = run(make_step("full"), "full (attention)")

    # ---- kernel floors ----------------------------------------------------
    emb = params["embedding"][: model.feat_n_cols]
    feat = buffers["feat"]

    spmm_fwd = jax.jit(lambda e: spmm_bucketed(feat, e))
    t_spmm_fwd = _timeit(spmm_fwd, emb)
    spmm_fb = jax.jit(jax.grad(lambda e: jnp.sum(spmm_bucketed(feat, e))))
    t_spmm_fb = _timeit(spmm_fb, emb)

    def att_x0(e, wq, wk):
        e_sg = jax.lax.stop_gradient(e)
        x_q = spmm_bucketed(feat, e_sg)
        q = (x_q @ wq["w"] + wq["b"]).reshape(-1, h, d)
        return attention_spmm_fused_kv(feat, q, wk["w"], wk["b"], e, T)

    att_fwd = jax.jit(att_x0)
    t_att_fwd = _timeit(att_fwd, emb, params["weight_q"], params["weight_k"])

    att_fb = jax.jit(
        jax.grad(
            lambda e, wq, wk: jnp.sum(att_x0(e, wq, wk)), argnums=(0, 1, 2)
        )
    )
    t_att_fb = _timeit(att_fb, emb, params["weight_q"], params["weight_k"])

    # backward split: d(embedding) = value-aggregation (scatter) path only;
    # d(Wq, Wk) = score/softmax chain only
    att_fb_emb = jax.jit(
        jax.grad(lambda e, wq, wk: jnp.sum(att_x0(e, wq, wk)), argnums=0)
    )
    t_att_fb_emb = _timeit(att_fb_emb, emb, params["weight_q"], params["weight_k"])
    att_fb_qk = jax.jit(
        jax.grad(lambda e, wq, wk: jnp.sum(att_x0(e, wq, wk)), argnums=(1, 2))
    )
    t_att_fb_qk = _timeit(att_fb_qk, emb, params["weight_q"], params["weight_k"])

    # head scaling: the same x0 at n_heads=1
    wq1 = {
        "w": params["weight_q"]["w"][:, :d],
        "b": params["weight_q"]["b"][:d],
    }
    wk1 = {
        "w": params["weight_k"]["w"][:, :d],
        "b": params["weight_k"]["b"][:d],
    }

    def att_x0_h1(e, wq, wk):
        e_sg = jax.lax.stop_gradient(e)
        x_q = spmm_bucketed(feat, e_sg)
        q = (x_q @ wq["w"] + wq["b"]).reshape(-1, 1, d)
        return attention_spmm_fused_kv(feat, q, wk["w"], wk["b"], e, T)

    t_att_fwd_h1 = _timeit(jax.jit(att_x0_h1), emb, wq1, wk1)
    t_att_fb_h1 = _timeit(
        jax.jit(jax.grad(lambda e, wq, wk: jnp.sum(att_x0_h1(e, wq, wk)))),
        emb, wq1, wk1,
    )

    # adjacency propagation alone (3 layers over norm_adj, fwd+bwd)
    prop_fb = jax.jit(
        jax.grad(lambda x: jnp.sum(propagate_mean(buffers["norm_adj"], x, 3)))
    )
    x_nodes = jnp.zeros((model.n_users + model.n_items, d), jnp.float32)
    t_prop_fb = _timeit(prop_fb, x_nodes)

    payload = {
        "config": "AttIGCN Gowalla-scale d=64 L=3 h=4 batch=2048 (bench.py row)",
        "phase_ms": {
            "floor_step_igcn_alpha0": round(t_floor, 2),
            "plus_query_chain": round(t_qproj, 2),
            "full_step": round(t_full, 2),
            "attention_premium_in_step": round(t_full - t_qproj, 2),
            "query_chain_premium": round(t_qproj - t_floor, 2),
        },
        "kernel_ms": {
            "feat_spmm_fwd": round(t_spmm_fwd, 2),
            "feat_spmm_fwd_bwd": round(t_spmm_fb, 2),
            "att_x0_fwd_h4": round(t_att_fwd, 2),
            "att_x0_fwd_bwd_h4": round(t_att_fb, 2),
            "att_x0_fwd_bwd_emb_only": round(t_att_fb_emb, 2),
            "att_x0_fwd_bwd_qk_only": round(t_att_fb_qk, 2),
            "att_x0_fwd_h1": round(t_att_fwd_h1, 2),
            "att_x0_fwd_bwd_h1": round(t_att_fb_h1, 2),
            "adjacency_3layer_fwd_bwd": round(t_prop_fb, 2),
        },
    }
    print(json.dumps(payload, indent=1))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
