"""End-to-end GOLDEN metric parity for the flagship families (r5 verdict
item 1): train IGCN and DOSE_aug for many epochs with the FULL per-epoch
machinery running on both sides — feat_mat_anneal, and for DOSE the
epoch-end cos-top-k selection + view rebuild — against an independent torch
(CPU, sparse) implementation of the reference math (model.py:4107-4220 for
IGCN; model.py:367-613 + 503-545 for DOSE_aug; trainer.py:298-299 for the
anneal->select epoch order), with identical init and identical pre-sampled
batches. Both sides' weights are evaluated through the SAME evaluator
(Recall@20 / NDCG@20, the reference protocol of trainer.py:146-210) every
``eval_every`` epochs, so the trajectory comparison isolates weight
divergence — the compounding channel per-step parity tests cannot see
(selection ties, annealing order, fp drift through view regeneration).

Documented divergence carried by BOTH sides: selection uses one exact
global cos top-k (the reference's two-halves index quirk, model.py:537-540,
is replaced identically on each side — see tests/test_torch_parity_zoo.py).

Run (CPU): JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python benchmarks/golden_parity_flagships.py
Writes GOLDEN_r05.json at the repo root. The slow-tier guard
tests/test_golden_flagships.py runs the same harness at reduced scale.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# torch replica pieces (sparse so ML-100K scale runs in minutes on CPU)
# ---------------------------------------------------------------------------


def _torch():
    import torch

    return torch


def torch_sparse_norm_adj(pairs, n_users, n_items):
    """Symmetric-normalized bipartite adjacency as torch.sparse
    (model.py:4140-4153 semantics: D^-1/2 (A) D^-1/2, degree clamped >=1)."""
    torch = _torch()
    pairs = np.asarray(pairs, np.int64)
    n = n_users + n_items
    rows = np.concatenate([pairs[:, 0], n_users + pairs[:, 1]])
    cols = np.concatenate([n_users + pairs[:, 1], pairs[:, 0]])
    deg = np.bincount(rows, minlength=n).astype(np.float64)
    dinv = 1.0 / np.sqrt(np.clip(deg, 1.0, None))
    vals = dinv[rows] * dinv[cols]
    idx = torch.tensor(np.stack([rows, cols]))
    return torch.sparse_coo_tensor(
        idx, torch.tensor(vals, dtype=torch.float32), (n, n)
    ).coalesce()


def torch_feat_struct(ds, model):
    """IGCN feature-matrix COO counts (model.py:4156-4188): rows/cols/counts
    + the one-hot self column per node type; per-epoch annealing rescales
    values by row_sum^((alpha-1)/2 - 0.5)."""
    n = ds.n_users + ds.n_items
    um, im = np.asarray(model.user_map), np.asarray(model.item_map)
    pairs = np.asarray(ds.train_array, np.int64)
    rows = np.concatenate(
        [
            pairs[:, 0],
            ds.n_users + pairs[:, 1],
            np.arange(ds.n_users),
            ds.n_users + np.arange(ds.n_items),
        ]
    )
    cols = np.concatenate(
        [
            model.user_dim + im[pairs[:, 1]],
            um[pairs[:, 0]],
            np.full(ds.n_users, model.user_dim + model.item_dim),
            np.full(ds.n_items, model.user_dim + model.item_dim + 1),
        ]
    )
    # coalesce duplicate (row, col) into counts
    key = rows * (model.feat_n_cols) + cols
    key, counts = np.unique(key, return_counts=True)
    rows = key // model.feat_n_cols
    cols = key % model.feat_n_cols
    row_sum = np.bincount(rows, weights=counts.astype(np.float64), minlength=n)
    return rows, cols, counts.astype(np.float64), row_sum


def torch_feat(feat_struct, alpha, n_rows, n_cols):
    torch = _torch()
    rows, cols, counts, row_sum = feat_struct
    w = row_sum ** ((alpha - 1.0) / 2.0 - 0.5)
    vals = counts * w[rows]
    idx = torch.tensor(np.stack([rows, cols]))
    return torch.sparse_coo_tensor(
        idx, torch.tensor(vals, dtype=torch.float32), (n_rows, n_cols)
    ).coalesce()


def torch_propagate_mean(A, x0, n_layers):
    torch = _torch()
    acc, x = x0.clone(), x0
    for _ in range(n_layers):
        x = torch.sparse.mm(A, x)
        acc = acc + x
    return acc / (n_layers + 1.0)


def torch_info_nce(q, p, neg, temperature=0.1):
    """InfoNCE as the reference uses it (info_nce package semantics,
    model.py:447-455): L2-normalize, positives on the diagonal, ALL view
    rows as negatives."""
    torch = _torch()

    def l2n(x, eps=1e-12):
        return x / x.norm(dim=1, keepdim=True).clamp_min(eps)

    q, p = l2n(q), l2n(neg)  # p == neg rows for the (main, view) pair
    logits = (q @ p.T) / temperature
    labels = torch.arange(q.shape[0])
    return torch.nn.functional.cross_entropy(logits, labels, reduction="none")


def torch_topk_pairs(rep, n_users, k, negate_items):
    """Exact global cos top-k (reference cal_cos_sim minus the two-halves
    quirk, model.py:503-545; items negated for DOSE_aug). float32 like the
    reference (and like our device selection) — f64 here flips near-ties
    and reads as spurious divergence."""
    torch = _torch()
    u = rep[:n_users].float()
    i = rep[n_users:].float()
    if negate_items:
        i = -i
    un = u / u.norm(dim=1, keepdim=True).clamp_min(1e-12)
    inn = i / i.norm(dim=1, keepdim=True).clamp_min(1e-12)
    sims = un @ inn.T
    ncols = sims.shape[1]
    _, idx = torch.topk(sims.reshape(-1), k)
    uu = (idx // ncols).numpy()
    ii = (idx % ncols).numpy()
    return np.stack([uu, ii], axis=1).astype(np.int64)


def union_pairs(train_pairs, add):
    s = {(int(u), int(i)) for u, i in np.asarray(train_pairs)}
    s |= {(int(u), int(i)) for u, i in np.asarray(add)}
    return np.array(sorted(s), dtype=np.int64)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def make_batches(rng, ds, model, aux, n_epochs, steps_per_epoch, batch):
    """Pre-sampled identical batch streams: uniform users with REAL
    positives + uniform negatives for the main BPR, same for the aux loss
    over the core id space."""
    pos_of = [np.asarray(l, np.int64) for l in ds.train_data]
    aux_of = [np.asarray(l, np.int64) for l in aux.train_data]
    have_main = np.array([len(l) > 0 for l in pos_of])
    have_aux = np.array([len(l) > 0 for l in aux_of])
    main_users = np.flatnonzero(have_main)
    aux_users = np.flatnonzero(have_aux)
    epochs = []
    for _ in range(n_epochs):
        steps = []
        for _ in range(steps_per_epoch):
            users = main_users[rng.integers(0, len(main_users), batch)]
            pos = np.array([pos_of[u][rng.integers(0, len(pos_of[u]))] for u in users])
            neg = rng.integers(0, ds.n_items, batch)
            au = aux_users[rng.integers(0, len(aux_users), batch)]
            ap = np.array([aux_of[u][rng.integers(0, len(aux_of[u]))] for u in au])
            an = rng.integers(0, model.item_dim, batch)
            steps.append(tuple(a.astype(np.int32) for a in (users, pos, neg, au, ap, an)))
        epochs.append(steps)
    return epochs


def run_family(
    family,
    n_users=943,
    n_items=1682,
    n_inter=100_000,
    d=64,
    n_layers=3,
    n_epochs=40,
    batch=2048,
    eval_every=5,
    seed=7,
    aug_num=25_000,
    lr=1e-3,
    l2_reg=1e-4,
    aux_reg=0.01,
    c_reg=0.05,
    init_noise=0.0,
):
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from inductive_recommendation_tpu.data.dataset import (
        AuxiliaryDataset,
        quick_synthetic_dataset,
    )
    from inductive_recommendation_tpu.eval.evaluator import Evaluator
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train import losses as L

    is_dose = family == "DOSE_aug"
    ds = quick_synthetic_dataset(n_users, n_items, n_inter, seed=seed)
    model = get_model(
        {
            "name": family,
            "embedding_size": d,
            "n_layers": n_layers,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "table_align": 1,
            **({"aug_num": aug_num, "aug_rate": 0.5} if is_dose else {}),
        },
        ds,
    )
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    rng = np.random.default_rng(seed + 1)
    emb0 = (rng.standard_normal((model.feat_n_cols, d)) * 0.1).astype(np.float32)
    emb0_ours = emb0
    if init_noise:
        # self-variance probe: an epsilon-perturbed init on OUR side only
        # (separate rng stream — the batch streams stay identical). The
        # torch side keeps the unperturbed weights, so the divergence this
        # run measures is the ALGORITHM's sensitivity to an epsilon (the
        # epoch-end selection chaos), the yardstick the cross-implementation
        # run is judged against.
        nrng = np.random.default_rng(seed + 1234)
        emb0_ours = emb0 + (
            init_noise * nrng.standard_normal(emb0.shape)
        ).astype(np.float32)
    steps_per_epoch = max(1, len(ds.train_array) // batch)
    epochs = make_batches(rng, ds, model, aux, n_epochs, steps_per_epoch, batch)
    train_pairs = (
        np.asarray(model._dedup_train) if is_dose else np.asarray(ds.train_array)
    )
    ev = Evaluator(ds, [20], test_batch_size=256)

    # ---- torch side -------------------------------------------------------
    n = ds.n_users + ds.n_items
    feat_struct = torch_feat_struct(ds, model)
    A = torch_sparse_norm_adj(np.asarray(ds.train_array), ds.n_users, ds.n_items)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt_t = torch.optim.Adam([emb_t, w_t], lr=lr)
    alpha_t = 1.0
    Av = torch_sparse_norm_adj(train_pairs, ds.n_users, ds.n_items)

    def torch_epoch(batches):
        nonlocal alpha_t, Av
        feat = torch_feat(feat_struct, alpha_t, n, model.feat_n_cols)
        for users, pos, neg, au, ap, an in batches:
            x0 = torch.sparse.mm(feat, emb_t)
            rep = torch_propagate_mean(A, x0, n_layers)
            u_r = rep[users.astype(np.int64)]
            p_r = rep[ds.n_users + pos.astype(np.int64)]
            n_r = rep[ds.n_users + neg.astype(np.int64)]
            l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
            loss = (
                torch.nn.functional.softplus(
                    (u_r * n_r).sum(1) - (u_r * p_r).sum(1)
                ).mean()
                + l2_reg * l2.mean()
            )
            pos_s = (emb_t[au] * emb_t[model.user_dim + ap] * w_t[None]).sum(1)
            neg_s = (emb_t[au] * emb_t[model.user_dim + an] * w_t[None]).sum(1)
            loss = loss + aux_reg * torch.nn.functional.softplus(neg_s - pos_s).mean()
            if is_dose:
                repv = torch_propagate_mean(Av, x0, n_layers)
                v = repv[users.astype(np.int64)]
                loss = loss + c_reg * torch_info_nce(u_r, v, v).mean()
            opt_t.zero_grad()
            loss.backward()
            opt_t.step()
        # epoch end: anneal, then re-select from CURRENT params
        # (reference trainer.py:298-299 order)
        alpha_t *= model.delta
        if is_dose:
            with torch.no_grad():
                feat2 = torch_feat(feat_struct, alpha_t, n, model.feat_n_cols)
                rep_eval = torch_propagate_mean(
                    A, torch.sparse.mm(feat2, emb_t), n_layers
                )
                sel = torch_topk_pairs(
                    rep_eval, ds.n_users, min(aug_num, n_users * n_items), True
                )
            Av = torch_sparse_norm_adj(
                union_pairs(train_pairs, sel), ds.n_users, ds.n_items
            )
            return sel
        return None

    # ---- our side ---------------------------------------------------------
    params = {"embedding": jnp.asarray(emb0_ours), "w": jnp.ones((d,), jnp.float32)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg, au, ap, an):
        def loss_fn(p):
            out = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            if is_dose:
                u_r, p_r, n_r, l2, closs = out
            else:
                u_r, p_r, n_r, l2 = out
            loss = L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()
            emb, w = p["embedding"], p["w"]
            pos_s = jnp.sum(emb[au] * emb[model.user_dim + ap] * w[None], axis=1)
            neg_s = jnp.sum(emb[au] * emb[model.user_dim + an] * w[None], axis=1)
            loss = loss + aux_reg * jnp.mean(jax.nn.softplus(neg_s - pos_s))
            if is_dose:
                loss = loss + c_reg * closs.mean()
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)

    def ours_epoch(batches):
        nonlocal params, opt_state
        for b in batches:
            args = [jnp.asarray(a) for a in b]
            params, opt_state, _ = jstep(params, opt_state, model.buffers, *args)
        model.feat_mat_anneal()
        if is_dose:
            sel = np.asarray(
                model._cos_pairs(params, aug_num, negate_items=True)
            ).reshape(-1, 2)
            model.update_aug_adj(params)
            return sel
        return None

    # ---- run + trajectory -------------------------------------------------
    traj = []
    t0 = time.time()
    for e, batches in enumerate(epochs):
        sel_t = torch_epoch(batches)
        sel_j = ours_epoch(batches)
        overlap = None
        if sel_t is not None:
            st = {(int(u), int(i)) for u, i in sel_t}
            sj = {(int(u), int(i)) for u, i in sel_j}
            overlap = len(st & sj) / max(len(st | sj), 1)
        if (e + 1) % eval_every == 0 or e == n_epochs - 1:
            _, ours_m = ev.evaluate(model, params, "val")
            params_t = {
                "embedding": jnp.asarray(emb_t.detach().numpy()),
                "w": jnp.asarray(w_t.detach().numpy()),
            }
            _, torch_m = ev.evaluate(model, params_t, "val")
            row = {
                "epoch": e + 1,
                "ours_recall20": round(float(ours_m["Recall"][20]), 5),
                "torch_recall20": round(float(torch_m["Recall"][20]), 5),
                "ours_ndcg20": round(float(ours_m["NDCG"][20]), 5),
                "torch_ndcg20": round(float(torch_m["NDCG"][20]), 5),
            }
            if overlap is not None:
                row["selection_jaccard"] = round(overlap, 4)
            traj.append(row)
            print(f"[{family}] {row}  ({time.time() - t0:.0f}s)", flush=True)
    dr = max(abs(r["ours_recall20"] - r["torch_recall20"]) for r in traj)
    dn = max(abs(r["ours_ndcg20"] - r["torch_ndcg20"]) for r in traj)
    return {
        "family": family,
        "config": {
            "n_users": n_users, "n_items": n_items, "d": d,
            "n_layers": n_layers, "n_epochs": n_epochs, "batch": batch,
            "steps_per_epoch": steps_per_epoch, "lr": lr, "l2_reg": l2_reg,
            "aux_reg": aux_reg, "c_reg": c_reg,
            **({"aug_num": aug_num} if family == "DOSE_aug" else {}),
        },
        "trajectory": traj,
        "max_abs_recall_diff": round(dr, 5),
        "max_abs_ndcg_diff": round(dn, 5),
    }


def main():
    import jax

    if jax.default_backend() != "cpu":
        print(f"backend: {jax.default_backend()} (expected cpu)", file=sys.stderr)
    results = {}
    results["IGCN"] = run_family("IGCN")
    results["DOSE_aug"] = run_family("DOSE_aug")
    # the DOSE selection feedback is chaotic in early training (near-tie cos
    # boundaries over 1.6M candidate pairs while the reps are still
    # near-random): fp-level implementation differences flip boundary pairs,
    # the views diverge, and the metric trajectories separate TRANSIENTLY
    # before converging to the same attractor. The yardstick for "within
    # run-to-run variance" is therefore measured, not asserted: the same
    # two-sided run with a 1e-5-perturbed init on OUR side only — any
    # transient the cross-implementation run shows must be within ~the band
    # an epsilon produces by itself.
    results["DOSE_aug_selfvariance_1e-5"] = run_family("DOSE_aug", init_noise=1e-5)

    tol = 0.005
    igcn = results["IGCN"]
    dose = results["DOSE_aug"]
    self_v = results["DOSE_aug_selfvariance_1e-5"]
    final = dose["trajectory"][-1]
    final_dr = abs(final["ours_recall20"] - final["torch_recall20"])
    final_dn = abs(final["ours_ndcg20"] - final["torch_ndcg20"])
    band = max(
        self_v["max_abs_recall_diff"], self_v["max_abs_ndcg_diff"], tol
    )
    gates = {
        # IGCN has no selection: the whole trajectory must track
        "igcn_trajectory_within_tol": igcn["max_abs_recall_diff"] < tol
        and igcn["max_abs_ndcg_diff"] < tol,
        # DOSE: converged end state within tol ...
        "dose_final_within_tol": final_dr < tol and final_dn < tol,
        # ... and the transient within 1.5x the measured intrinsic band
        "dose_transient_within_selfvariance_band": (
            dose["max_abs_recall_diff"] <= 1.5 * band
            and dose["max_abs_ndcg_diff"] <= 1.5 * band
        ),
    }
    out = {
        "tolerance_abs": tol,
        "dose_selfvariance_band": round(band, 5),
        "gates": gates,
        "results": results,
        "pass": all(gates.values()),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GOLDEN_r05.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    assert out["pass"], "GOLDEN parity gate FAILED"
    print("GOLDEN FLAGSHIP PARITY OK")


if __name__ == "__main__":
    main()
