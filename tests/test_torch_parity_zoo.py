"""Cross-framework golden parity for the remaining config-reachable models:
DOSE_aug (cos-sim selection + edge injection), DOSE_drop3 (low-cos drop),
DOSE_aug_drop2 (degree-tail selection + the reference's no-op drop), and
IDCF_LGCN (relational attention over a frozen LightGCN table).

Each test feeds identical weights/batches to our jitted step and to an
independent torch (CPU) replica of the reference math (model.py citations
inline) and asserts loss + parameter agreement over Adam steps. For the DOSE
variants the per-epoch SELECTION itself runs on both sides (anneal ->
cos-topk -> graph rebuild), so agreement also proves the selected pair sets
match. Selection uses one exact global top-k on both sides — the documented
divergence from the reference's two-halves index quirk (model.py:537-540)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from inductive_recommendation_tpu import get_dataset, get_model
from inductive_recommendation_tpu.train import losses as L

from test_torch_parity import (
    torch_info_nce,
    torch_norm_adj,
    torch_norm_adj_from_pairs,
)


pytestmark = pytest.mark.slow

def _synth(seed, n_users=36, n_items=28, n_inter=450):
    return get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": n_users,
            "n_items": n_items,
            "n_interactions": n_inter,
            "seed": seed,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )


def _dose_model(name, ds, **kw):
    cfg = {
        "name": name,
        "embedding_size": 16,
        "n_layers": 2,
        "dropout": 0.0,
        "feature_ratio": 1.0,
        "table_align": 1,
    }
    cfg.update(kw)
    return get_model(cfg, ds)


def _batches(rng, ds, model, n, bs=48):
    return [
        (
            rng.integers(0, ds.n_users, bs),
            rng.integers(0, ds.n_items, bs),
            rng.integers(0, ds.n_items, bs),
            rng.integers(0, model.user_dim, bs),
            rng.integers(0, model.item_dim, bs),
            rng.integers(0, model.item_dim, bs),
        )
        for _ in range(n)
    ]


def _torch_feat_counts(ds, model, pairs=None):
    n = ds.n_users + ds.n_items
    C = model.feat_n_cols
    feat_counts = torch.zeros((n, C), dtype=torch.float64)
    um, im = model.user_map, model.item_map
    for u, i in np.asarray(ds.train_array if pairs is None else pairs):
        feat_counts[u, model.user_dim + im[i]] += 1.0
        feat_counts[ds.n_users + i, um[u]] += 1.0
    feat_counts[: ds.n_users, model.user_dim + model.item_dim] += 1.0
    feat_counts[ds.n_users :, model.user_dim + model.item_dim + 1] += 1.0
    return feat_counts


def _torch_feat(feat_counts, alpha):
    row_sum = feat_counts.sum(dim=1)
    w = row_sum ** ((alpha - 1.0) / 2.0 - 0.5)
    return (feat_counts * w[:, None]).to(torch.float32)


def _propagate_mean(A, x0, n_layers):
    acc, x = x0.clone(), x0
    for _ in range(n_layers):
        x = A @ x
        acc = acc + x
    return acc / (n_layers + 1.0)


def _torch_topk_pairs(rep, n_users, k, negate_items, restrict=None, threshold=None):
    """Exact global cos top-k, reference cal_cos_sim semantics minus the
    two-halves quirk (model.py:503-545: items negated before similarity).
    ``threshold``: additionally require cos >= threshold (DOSE_aug4,
    model.py:750-769)."""
    u = rep[:n_users].double()
    i = rep[n_users:].double()
    if negate_items:
        i = -i
    un = u / u.norm(dim=1, keepdim=True).clamp_min(1e-12)
    inn = i / i.norm(dim=1, keepdim=True).clamp_min(1e-12)
    sims = un @ inn.T
    if restrict is not None:
        ru = torch.as_tensor(np.asarray(restrict[0], np.int64))
        ri = torch.as_tensor(np.asarray(restrict[1], np.int64))
        sims = sims[ru][:, ri]
    ncols = sims.shape[1]
    vals, idx = torch.topk(sims.reshape(-1), k)
    if threshold is not None:
        idx = idx[vals >= threshold]
    uu = (idx // ncols).numpy()
    ii = (idx % ncols).numpy()
    if restrict is not None:
        uu = np.asarray(restrict[0])[uu]
        ii = np.asarray(restrict[1])[ii]
    return np.stack([uu, ii], axis=1).astype(np.int64).reshape(-1, 2)


def _union_pairs(train_pairs, add):
    s = {(int(u), int(i)) for u, i in np.asarray(train_pairs)}
    s |= {(int(u), int(i)) for u, i in np.asarray(add)}
    return np.array(sorted(s), dtype=np.int64)


def _diff_pairs(train_pairs, drop):
    d = {(int(u), int(i)) for u, i in np.asarray(drop)}
    return np.array(
        [e for e in np.asarray(train_pairs) if (int(e[0]), int(e[1])) not in d],
        dtype=np.int64,
    )


def _run_dose_parity(
    name, view_pairs_fn, select_kw, seed=11, aug_num=12, contrastive="nce"
):
    """Shared harness: 2 'epochs' x 2 steps; after each epoch both sides
    anneal alpha and re-select/rebuild the contrastive view from the CURRENT
    params (trainer.py:298-299 order: feat_mat_anneal then update_aug_adj).
    ``contrastive``: 'nce' = InfoNCE(main, view); 'mean' = the DOSE_test
    quirk where the raw aug-view user reps fill the contrastive slot and the
    trainer regularizes their plain mean (model.py:3843-3855)."""
    ds = _synth(seed)
    model = _dose_model(name, ds, aug_num=aug_num, **select_kw.pop("model_kw", {}))
    d, lr, l2_reg, aux_reg, c_reg = 16, 1e-2, 1e-3, 0.01, 0.1
    rng = np.random.default_rng(seed)
    emb0 = rng.standard_normal((model.feat_n_cols, d)).astype(np.float32) * 0.1
    batches = _batches(rng, ds, model, 4)
    train_pairs = np.asarray(model._dedup_train)

    # ---- torch replica ----
    feat_counts = _torch_feat_counts(ds, model)
    A = torch_norm_adj(ds).to(torch.float32)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt = torch.optim.Adam([emb_t, w_t], lr=lr)
    t_losses = []
    alpha = 1.0
    # initial view: selection recipes fall back to the full train graph
    Av = torch_norm_adj_from_pairs(train_pairs, ds.n_users, ds.n_items)
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        feat = _torch_feat(feat_counts, alpha)
        x0 = feat @ emb_t
        rep = _propagate_mean(A, x0, 2)
        repv = _propagate_mean(Av, x0, 2)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        v = repv[users]
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
        if contrastive == "mean":
            loss = loss + c_reg * v.mean()
        else:
            loss = loss + c_reg * torch_info_nce(u_r, v, v).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))
        if s % 2 == 1:  # epoch end: anneal, then re-select from current params
            alpha *= 0.99
            with torch.no_grad():
                feat = _torch_feat(feat_counts, alpha)
                rep_eval = _propagate_mean(A, feat @ emb_t, 2)
                pairs = _torch_topk_pairs(
                    rep_eval, ds.n_users, min(aug_num, len(train_pairs)), **select_kw
                )
            Av = torch_norm_adj_from_pairs(
                view_pairs_fn(train_pairs, pairs), ds.n_users, ds.n_items
            )

    # ---- ours ----
    params = {"embedding": jnp.asarray(emb0), "w": jnp.ones((d,), jnp.float32)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg, au, ap, an):
        def loss_fn(p):
            u_r, p_r, n_r, l2, closs = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            bpr = L.bpr_loss(u_r, p_r, n_r)
            emb, w = p["embedding"], p["w"]
            pos_s = jnp.sum(emb[au] * emb[model.user_dim + ap] * w[None], axis=1)
            neg_s = jnp.sum(emb[au] * emb[model.user_dim + an] * w[None], axis=1)
            aux = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            return bpr + l2_reg * l2.mean() + aux_reg * aux + c_reg * closs.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)
    j_losses = []
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg, au, ap, an)]
        params, opt_state, loss = jstep(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))
        if s % 2 == 1:
            model.feat_mat_anneal()
            model.update_aug_adj(params)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(params["w"]), w_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def test_dose_aug_training_parity():
    """DOSE_aug (model.py:367-613): inject the aug_num lowest-cos pairs
    (items negated, model.py:510) into the adjacency; InfoNCE(main, aug)."""
    _run_dose_parity("DOSE_aug", _union_pairs, {"negate_items": True})


def test_dose_drop3_training_parity():
    """DOSE_drop3 (model.py:2544-2863): drop the aug_num lowest-cos pairs
    (set difference, utils.py:123-141); InfoNCE(main, dropped)."""
    _run_dose_parity("DOSE_drop3", _diff_pairs, {"negate_items": True}, seed=13)


def test_dose_aug_drop2_training_parity():
    """DOSE_aug_drop2 (model.py:3182-3428): top-cos pairs among the degree
    TAIL users/items only (model.py:3291-3325), injected; the 'drop' view is
    the reference's no-op drop = the same union (utils.py:105-121)."""
    ds = _synth(17)
    probe = _dose_model("DOSE_aug_drop2", ds, aug_num=10, aug_ratio=0.2)
    _run_dose_parity(
        "DOSE_aug_drop2",
        _union_pairs,
        {
            "negate_items": False,
            "restrict": (probe._tail_users, probe._tail_items),
            "model_kw": {"aug_ratio": 0.2},
        },
        seed=17,
        aug_num=10,
    )


def test_dose_aug4_training_parity():
    """DOSE_aug4 (model.py:616-829): threshold injection — all pairs with
    cos >= pai (no item negation, model.py:750-769), capped at aug_num on our
    side (the documented divergence from the unbounded torch.where list); the
    torch replica applies the same cap + threshold so the selected sets match."""
    _run_dose_parity(
        "DOSE_aug4",
        _union_pairs,
        {"negate_items": False, "threshold": 0.0, "model_kw": {"pai": 0.0}},
        seed=19,
        aug_num=12,
    )


def _run_replay_parity(
    name,
    model_kw,
    seed,
    torch_views,
    torch_contrastive,
    main_adj_fn=None,
    aug_num=15,
):
    """Golden-parity harness for the RANDOM-view DOSE variants: the model's
    device-rng draws are replayed (same counter/seed hash) on the torch side,
    so both frameworks train on the identical random graphs.

    ``torch_views(model, ds, train_pairs, phase)`` -> list of torch view
    adjacencies (phase 0 = the __init__ draws, phase 1 = the first
    update_aug_adj draws). ``torch_contrastive(u_r, views_u)`` -> scalar term
    (already includes any view propagation the model does with dropout off).
    ``main_adj_fn(model, ds, train_pairs)`` overrides the MAIN adjacency
    (the TEST variant trains on a dropped main graph, model.py:1989-1990)."""
    ds = _synth(seed)
    model = _dose_model(name, ds, aug_num=aug_num, **model_kw)
    d, lr, l2_reg, aux_reg, c_reg = 16, 1e-2, 1e-3, 0.01, 0.1
    rng = np.random.default_rng(seed)
    emb0 = rng.standard_normal((model.feat_n_cols, d)).astype(np.float32) * 0.1
    batches = _batches(rng, ds, model, 4)
    train_pairs = np.asarray(model._dedup_train)

    feat_counts = _torch_feat_counts(ds, model)
    if main_adj_fn is None:
        A = torch_norm_adj(ds).to(torch.float32)
    else:
        A = main_adj_fn(model, ds, train_pairs)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt = torch.optim.Adam([emb_t, w_t], lr=lr)
    t_losses = []
    alpha = 1.0
    Avs = torch_views(model, ds, train_pairs, 0)
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        feat = _torch_feat(feat_counts, alpha)
        x0 = feat @ emb_t
        rep = _propagate_mean(A, x0, 2)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        views_u = [_propagate_mean(Av, x0, 2)[users] for Av in Avs]
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
        loss = loss + c_reg * torch_contrastive(u_r, views_u)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))
        if s % 2 == 1:
            alpha *= 0.99
            Avs = torch_views(model, ds, train_pairs, 1)

    params = {"embedding": jnp.asarray(emb0), "w": jnp.ones((d,), jnp.float32)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg, au, ap, an):
        def loss_fn(p):
            u_r, p_r, n_r, l2, closs = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            bpr = L.bpr_loss(u_r, p_r, n_r)
            emb, w = p["embedding"], p["w"]
            pos_s = jnp.sum(emb[au] * emb[model.user_dim + ap] * w[None], axis=1)
            neg_s = jnp.sum(emb[au] * emb[model.user_dim + an] * w[None], axis=1)
            aux = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            return bpr + l2_reg * l2.mean() + aux_reg * aux + c_reg * closs.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)
    j_losses = []
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg, au, ap, an)]
        params, opt_state, loss = jstep(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))
        if s % 2 == 1:
            model.feat_mat_anneal()
            model.update_aug_adj(params)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(params["w"]), w_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def _replayed_pairs(model, counter, n):
    from inductive_recommendation_tpu.graph.views import random_pairs_on_device

    return np.asarray(
        random_pairs_on_device(
            jnp.int32(counter),
            n=n,
            n_users=model.n_users,
            n_items=model.n_items,
            seed=model._aug_seed,
        )
    )


def _replayed_keep(model, counter, n_pairs, rate):
    from inductive_recommendation_tpu.graph.views import random_keep_mask_on_device

    return np.asarray(
        random_keep_mask_on_device(
            jnp.int32(counter),
            n_pairs=n_pairs,
            n_keep=int(n_pairs * rate),
            seed=model._aug_seed,
        )
    )


def test_dose_aug3_training_parity():
    """DOSE_aug3 (model.py:1120-1348): RANDOM edge injection — the device
    pair stream is replayed so the torch replica unions the identical pairs
    (__init__ draws counter 1, the first update_aug_adj draws counter 2)."""

    def views(model, ds, train_pairs, phase):
        pairs = _replayed_pairs(model, 1 if phase == 0 else 2, model.aug_num)
        return [
            torch_norm_adj_from_pairs(
                _union_pairs(train_pairs, pairs), ds.n_users, ds.n_items
            )
        ]

    _run_replay_parity(
        "DOSE_aug3",
        {},
        53,
        views,
        lambda u_r, vs: torch_info_nce(u_r, vs[0], vs[0]).mean(),
    )


def test_TEST_training_parity():
    """TEST (model.py:1963-2251): the MAIN adjacency is itself a random-drop
    graph (static for the run, host rng, model.py:1989-1990); the contrastive
    view is a per-epoch random drop (device counter 1, then 2)."""

    def main_adj(model, ds, train_pairs):
        return torch_norm_adj_from_pairs(
            train_pairs[model._main_keep], ds.n_users, ds.n_items
        )

    def views(model, ds, train_pairs, phase):
        keep = _replayed_keep(
            model, 1 if phase == 0 else 2, len(train_pairs), model.aug_rate
        )
        return [torch_norm_adj_from_pairs(train_pairs[keep], ds.n_users, ds.n_items)]

    _run_replay_parity(
        "TEST",
        {"aug_rate": 0.7},
        59,
        views,
        lambda u_r, vs: torch_info_nce(u_r, vs[0], vs[0]).mean(),
        main_adj_fn=main_adj,
    )


def test_TEST2_training_parity():
    """TEST2 (model.py:2253-2543): TWO random-drop views, InfoNCE BETWEEN
    the views (SGL-style on the IGCN base; __init__ draws counters 1-2, the
    first update_aug_adj draws 3-4)."""

    def views(model, ds, train_pairs, phase):
        base = 1 if phase == 0 else 3
        return [
            torch_norm_adj_from_pairs(
                train_pairs[
                    _replayed_keep(model, base + j, len(train_pairs), model.aug_rate)
                ],
                ds.n_users,
                ds.n_items,
            )
            for j in range(2)
        ]

    _run_replay_parity(
        "TEST2",
        {"aug_rate": 0.7},
        61,
        views,
        lambda u_r, vs: torch_info_nce(vs[0], vs[1], vs[1]).mean(),
    )


def test_mf_training_parity():
    """MF (model.py:56-76 + trainer.py:403-429): separate user/item tables,
    BPR + ego-embedding L2 — identical weights/batches through Adam on both
    sides."""
    ds = _synth(43)
    d, lr, l2_reg, bs = 16, 1e-2, 1e-3, 48
    model = get_model({"name": "MF", "embedding_size": d, "table_align": 1}, ds)
    rng = np.random.default_rng(43)
    ue0 = rng.standard_normal((ds.n_users, d)).astype(np.float32) * 0.1
    ie0 = rng.standard_normal((ds.n_items, d)).astype(np.float32) * 0.1
    batches = [
        (
            rng.integers(0, ds.n_users, bs),
            rng.integers(0, ds.n_items, bs),
            rng.integers(0, ds.n_items, bs),
        )
        for _ in range(5)
    ]

    ue_t = torch.nn.Parameter(torch.tensor(ue0))
    ie_t = torch.nn.Parameter(torch.tensor(ie0))
    opt = torch.optim.Adam([ue_t, ie_t], lr=lr)
    t_losses = []
    for users, pos, neg in batches:
        u_r, p_r, n_r = ue_t[users], ie_t[pos], ie_t[neg]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
        loss = (
            torch.nn.functional.softplus(
                (u_r * n_r).sum(1) - (u_r * p_r).sum(1)
            ).mean()
            + l2_reg * l2.mean()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    params = {"user_embedding": jnp.asarray(ue0), "item_embedding": jnp.asarray(ie0)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, users, pos, neg):
        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(p, users, pos, neg, training=False)
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for users, pos, neg in batches:
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg)]
        params, opt_state, loss = step(params, opt_state, *args)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(params["user_embedding"]), ue_t.detach().numpy(), rtol=5e-3, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["item_embedding"]), ie_t.detach().numpy(), rtol=5e-3, atol=5e-5
    )


def test_imf_training_parity():
    """IMF (model.py:4290-4297): inductive MF = the feat-matrix rep layer
    with NO graph convolution, trained with the IGCN aux loss
    (trainer.py:518-561); anneal applied between steps on both sides."""
    ds = _synth(47)
    model = _dose_model("IMF", ds)
    d, lr, l2_reg, aux_reg = 16, 1e-2, 1e-3, 0.01
    rng = np.random.default_rng(47)
    emb0 = rng.standard_normal((model.feat_n_cols, d)).astype(np.float32) * 0.1
    batches = _batches(rng, ds, model, 4)

    feat_counts = _torch_feat_counts(ds, model)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt = torch.optim.Adam([emb_t, w_t], lr=lr)
    t_losses = []
    alpha = 1.0
    for users, pos, neg, au, ap, an in batches:
        rep = _torch_feat(feat_counts, alpha) @ emb_t  # no propagation
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
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
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))
        alpha *= 0.99

    params = {"embedding": jnp.asarray(emb0), "w": jnp.ones((d,), jnp.float32)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg, au, ap, an):
        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            bpr = L.bpr_loss(u_r, p_r, n_r)
            emb, w = p["embedding"], p["w"]
            pos_s = jnp.sum(emb[au] * emb[model.user_dim + ap] * w[None], axis=1)
            neg_s = jnp.sum(emb[au] * emb[model.user_dim + an] * w[None], axis=1)
            aux = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            return bpr + l2_reg * l2.mean() + aux_reg * aux

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)
    j_losses = []
    for users, pos, neg, au, ap, an in batches:
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg, au, ap, an)]
        params, opt_state, loss = jstep(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))
        model.feat_mat_anneal()

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(params["w"]), w_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def test_dose_drop_training_parity():
    """DOSE_drop (model.py:1351-1670): drop the aug_num HIGHEST-cos train
    pairs (no negation; set difference via utils.py:123-141);
    InfoNCE(main, dropped)."""
    _run_dose_parity("DOSE_drop", _diff_pairs, {"negate_items": False}, seed=29)


def test_dose_aug_drop3_training_parity():
    """DOSE_aug_drop3 (model.py:3431-3660): ONE top-cos selection feeds both
    an injection graph and a difference drop graph (model.py:3473-3497); the
    loss contrasts against the DROP view only (model.py:3626-3639), so the
    torch replica propagates the set-difference graph."""
    _run_dose_parity("DOSE_aug_drop3", _diff_pairs, {"negate_items": False}, seed=31)


def test_dose_test_training_parity():
    """DOSE_test (model.py:3663-3877): DOSE_aug selection (items negated,
    union-injection view) but bpr_forward returns the RAW aug-view user reps
    in the contrastive slot; the trainer regularizes their plain mean
    (model.py:3843-3855 + trainer.py:355-402) — quirk reproduced on both
    sides."""
    _run_dose_parity(
        "DOSE_test", _union_pairs, {"negate_items": True}, seed=41, contrastive="mean"
    )


def test_attigcn_training_parity():
    """AttIGCN (the reference's commented-out spec, model.py:4224-4287):
    per-edge multi-head attention over the feature matrix — q = Wq(feat @
    sg(emb)), k = Wk(sg(emb)), row softmax at temperature sqrt(d)*10, head
    mean, aggregation of the NON-detached embedding — then IGCN propagation;
    L2 adds ||Wq||^2 + ||Wk||^2. Torch replica uses a dense masked softmax;
    ours runs the bucketed-ELL attention_spmm kernel."""
    ds = _synth(23, n_users=30, n_items=24, n_inter=400)
    d, h, n_layers = 8, 2, 2
    model = get_model(
        {
            "name": "AttIGCN",
            "embedding_size": d,
            "n_layers": n_layers,
            "n_heads": h,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "table_align": 1,
        },
        ds,
    )
    n = ds.n_users + ds.n_items
    C = model.feat_n_cols
    lr, l2_reg = 1e-2, 1e-3
    rng = np.random.default_rng(23)
    emb0 = rng.standard_normal((C, d)).astype(np.float32) * 0.1
    params0 = model.init_params(jax.random.key(9))
    params0 = dict(params0, embedding=jnp.asarray(emb0))
    batches = [
        (
            rng.integers(0, ds.n_users, 32),
            rng.integers(0, ds.n_items, 32),
            rng.integers(0, ds.n_items, 32),
        )
        for _ in range(3)
    ]

    # ---- torch replica (dense masked attention) ----
    feat_counts = _torch_feat_counts(ds, model)
    mask = (feat_counts > 0).to(torch.float32)
    row_sum = feat_counts.sum(dim=1)
    feat = (feat_counts * (row_sum ** -1.0)[:, None]).to(torch.float32)  # alpha=0
    A = torch_norm_adj(ds).to(torch.float32)
    temp = float(np.sqrt(d) * 10.0)

    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    wq = torch.nn.Linear(d, d * h)
    wk = torch.nn.Linear(d, d * h)
    with torch.no_grad():
        wq.weight.copy_(torch.tensor(np.asarray(params0["weight_q"]["w"]).T))
        wq.bias.copy_(torch.tensor(np.asarray(params0["weight_q"]["b"])))
        wk.weight.copy_(torch.tensor(np.asarray(params0["weight_k"]["w"]).T))
        wk.bias.copy_(torch.tensor(np.asarray(params0["weight_k"]["b"])))
    opt = torch.optim.Adam([emb_t] + list(wq.parameters()) + list(wk.parameters()), lr=lr)

    t_losses = []
    for users, pos, neg in batches:
        emb_sg = emb_t.detach()
        x_q = feat @ emb_sg
        q = wq(x_q).view(n, h, d)
        k = wk(emb_sg).view(C, h, d)
        scores = torch.einsum("rhd,chd->rhc", q, k)  # [n, h, C]
        scores = scores.masked_fill(mask[:, None, :] == 0, -torch.inf) / temp
        attn = torch.softmax(scores, dim=2).mean(dim=1)  # head mean -> [n, C]
        x0 = attn @ emb_t
        rep = _propagate_mean(A, x0, n_layers)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
        l2 = l2 + (wq.weight**2).sum() + (wk.weight**2).sum()
        loss = (
            torch.nn.functional.softplus((u_r * n_r).sum(1) - (u_r * p_r).sum(1)).mean()
            + l2_reg * l2.mean()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    # ---- ours ----
    params = params0
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg):
        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)
    j_losses = []
    for users, pos, neg in batches:
        params, opt_state, loss = jstep(
            params,
            opt_state,
            model.buffers,
            *[jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg)],
        )
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(params["weight_q"]["w"]),
        wq.weight.detach().numpy().T,
        rtol=5e-3,
        atol=5e-4,
    )


def test_idcf_lgcn_training_parity():
    """IDCF_LGCN (model.py:3879-3983): RelationGAT heads attending over
    sampled rows of a frozen LightGCN table, w_out fusion, LightGCN
    propagation, logsumexp contrastive regularizer, L2 on wq/wk. The random
    key/sample indices are extracted from our rng stream and fed to the
    torch replica so both sides attend over identical samples."""
    ds = _synth(19, n_users=30, n_items=24, n_inter=400)
    d, n_headers, n_samples, n_layers = 16, 2, 8, 2
    rng = np.random.default_rng(19)
    frozen = rng.standard_normal((ds.n_users + ds.n_items, d)).astype(np.float32) * 0.1
    model = get_model(
        {
            "name": "IDCF_LGCN",
            "embedding_size": d,
            "n_layers": n_layers,
            "n_headers": n_headers,
            "n_samples": n_samples,
            "pretrained_embedding": frozen,
        },
        ds,
    )
    params0 = model.init_params(jax.random.key(5))
    lr, l2_reg, c_reg = 1e-2, 1e-3, 1e-3
    batches = [
        (
            rng.integers(0, ds.n_users, 32),
            rng.integers(0, ds.n_items, 32),
            rng.integers(0, ds.n_items, 32),
        )
        for _ in range(4)
    ]
    step_keys = [jax.random.fold_in(jax.random.key(77), s) for s in range(4)]

    # replicate _representations' sample-index stream per step
    def samples_for(key):
        out = []
        r = key
        for _ in range(n_headers):
            r, r_u, r_i = jax.random.split(r, 3)
            su = np.asarray(jax.random.randint(r_u, (n_samples,), 0, ds.n_users))
            si = np.asarray(jax.random.randint(r_i, (n_samples,), 0, ds.n_items))
            out.append((su, si))
        return out

    # ---- torch replica ----
    emb = torch.tensor(frozen)  # frozen: never in the optimizer
    n = ds.n_users + ds.n_items
    A_raw = torch.zeros((n, n), dtype=torch.float32)
    for u, i in np.asarray(ds.train_array):
        A_raw[u, ds.n_users + i] += 1.0
        A_raw[ds.n_users + i, u] += 1.0
    A = torch_norm_adj(ds).to(torch.float32)

    gat_t, t_params = [], []
    for h in range(n_headers):
        unit = {}
        for nm in ("wq", "wk", "wv"):
            lin = torch.nn.Linear(d, d)
            with torch.no_grad():
                lin.weight.copy_(torch.tensor(np.asarray(params0["gat_units"][h][nm]["w"]).T))
                lin.bias.copy_(torch.tensor(np.asarray(params0["gat_units"][h][nm]["b"])))
            unit[nm] = lin
            t_params += list(lin.parameters())
        gat_t.append(unit)
    w_out = torch.nn.Linear(d * n_headers, d)
    with torch.no_grad():
        w_out.weight.copy_(torch.tensor(np.asarray(params0["w_out"]["w"]).T))
        w_out.bias.copy_(torch.tensor(np.asarray(params0["w_out"]["b"])))
    t_params += list(w_out.parameters())
    opt = torch.optim.Adam(t_params, lr=lr)

    t_losses = []
    for (users, pos, neg), key in zip(batches, step_keys):
        x_q = A_raw @ emb
        heads = []
        for h, (su, si) in enumerate(samples_for(key)):
            s_u_emb = emb[su.copy()]
            s_i_emb = emb[ds.n_users + si.copy()]
            u = gat_t[h]
            def gat(x, neigh):
                q = u["wq"](x).unsqueeze(1)
                k = u["wk"](neigh).unsqueeze(0)
                attn = torch.softmax((q * k).sum(2), dim=1)
                return u["wv"](attn @ neigh)
            heads.append(
                torch.cat([gat(x_q[: ds.n_users], s_u_emb), gat(x_q[ds.n_users :], s_i_emb)], 0)
            )
        reps = w_out(torch.cat(heads, dim=1))
        u_rep, i_rep = reps[: ds.n_users], reps[ds.n_users :]
        user_loss = torch.logsumexp(u_rep @ s_u_emb.T, dim=1) - (
            u_rep * emb[: ds.n_users]
        ).sum(1)
        item_loss = torch.logsumexp(i_rep @ s_i_emb.T, dim=1) - (
            i_rep * emb[ds.n_users :]
        ).sum(1)
        closs = torch.cat([user_loss, item_loss], 0)
        final = _propagate_mean(A, reps, n_layers)
        u_r, p_r, n_r = final[users], final[ds.n_users + pos], final[ds.n_users + neg]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
        for u in gat_t:
            l2 = l2 + (u["wq"].weight ** 2).sum() + (u["wk"].weight ** 2).sum()
        c = closs[users] + closs[ds.n_users + pos] + closs[ds.n_users + neg]
        loss = (
            torch.nn.functional.softplus((u_r * n_r).sum(1) - (u_r * p_r).sum(1)).mean()
            + l2_reg * l2.mean()
            + c_reg * c.mean()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    # ---- ours ----
    params = params0
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, key, users, pos, neg):
        def loss_fn(p):
            u_r, p_r, n_r, l2, closs = model.bpr_forward(
                p, users, pos, neg, rng=key, training=True, buffers=buffers
            )
            return (
                L.bpr_loss(u_r, p_r, n_r)
                + l2_reg * l2.mean()
                + c_reg * closs.mean()
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)
    j_losses = []
    for (users, pos, neg), key in zip(batches, step_keys):
        params, opt_state, loss = jstep(
            params,
            opt_state,
            model.buffers,
            key,
            *[jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg)],
        )
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["w_out"]["w"]),
        w_out.weight.detach().numpy().T,
        rtol=5e-3,
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["gat_units"][0]["wq"]["w"]),
        gat_t[0]["wq"].weight.detach().numpy().T,
        rtol=5e-3,
        atol=5e-4,
    )


def test_half_training_parity():
    """HALF (model.py:246-365): LightGCN + ONE random-drop view,
    InfoNCE(main users, view users); the L2 term is on the FINAL propagated
    reps (model.py:345-346 — unlike LightGCN's ego L2; quirk reproduced).
    Same keep masks injected on both sides, regenerated between epochs."""
    from inductive_recommendation_tpu.graph.views import bake_view

    ds = _synth(29)
    model = get_model(
        {"name": "HALF", "embedding_size": 16, "n_layers": 2, "aug_rate": 0.7}, ds
    )
    n = ds.n_users + ds.n_items
    d, lr, l2_reg, c_reg = 16, 1e-2, 1e-3, 0.1
    rng = np.random.default_rng(29)
    emb0 = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    E = len(model.view_engine.train_pairs)
    masks = [rng.random(E) < 0.7 for _ in range(2)]
    batches = [
        (
            rng.integers(0, ds.n_users, 48),
            rng.integers(0, ds.n_items, 48),
            rng.integers(0, ds.n_items, 48),
        )
        for _ in range(4)
    ]

    # ---- torch replica ----
    A = torch_norm_adj(ds).to(torch.float32)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    opt = torch.optim.Adam([emb_t], lr=lr)
    t_losses = []
    for s, (users, pos, neg) in enumerate(batches):
        Av = torch_norm_adj_from_pairs(
            np.asarray(model.view_engine.train_pairs)[masks[s // 2]],
            ds.n_users,
            ds.n_items,
        )
        rep = _propagate_mean(A, emb_t, 2)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        v = _propagate_mean(Av, emb_t, 2)[users]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)  # final reps
        loss = (
            torch.nn.functional.softplus((u_r * n_r).sum(1) - (u_r * p_r).sum(1)).mean()
            + l2_reg * l2.mean()
            + c_reg * torch_info_nce(u_r, v, v).mean()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    # ---- ours ----
    params = {"embedding": jnp.asarray(emb0)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg):
        def loss_fn(p):
            u_r, p_r, n_r, l2, closs = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean() + c_reg * closs.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)
    j_losses = []
    for s, (users, pos, neg) in enumerate(batches):
        model.buffers = dict(
            model.buffers,
            aug_adj1=bake_view(
                model.view_engine.base,
                model.view_engine.make_view(keep_pair_mask=masks[s // 2]),
            ),
        )
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg)]
        params, opt_state, loss = jstep(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def test_dose_aug2_training_parity():
    """DOSE_aug2 (model.py:831-1117): highest-cos selection (no negation,
    model.py:1034-1051), edge injection, AND an aug feature matrix rebuilt
    over train ∪ aug for the view's inductive layer (model.py:935-978,
    992-1002). Selection + aug-feat rebuild run on both sides per epoch."""
    ds = _synth(31)
    aug_num = 12
    model = _dose_model("DOSE_aug2", ds, aug_num=aug_num)
    d, lr, l2_reg, aux_reg, c_reg = 16, 1e-2, 1e-3, 0.01, 0.1
    rng = np.random.default_rng(31)
    emb0 = rng.standard_normal((model.feat_n_cols, d)).astype(np.float32) * 0.1
    batches = _batches(rng, ds, model, 4)
    train_pairs = np.asarray(model._dedup_train)

    # ---- torch replica ----
    feat_counts = _torch_feat_counts(ds, model)
    A = torch_norm_adj(ds).to(torch.float32)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt = torch.optim.Adam([emb_t, w_t], lr=lr)
    t_losses = []
    alpha = 1.0
    Av = torch_norm_adj_from_pairs(train_pairs, ds.n_users, ds.n_items)
    feat_counts_v = None  # until the first update the view uses the MAIN feat
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        feat = _torch_feat(feat_counts, alpha)
        x0 = feat @ emb_t
        rep = _propagate_mean(A, x0, 2)
        x0v = x0 if feat_counts_v is None else _torch_feat(feat_counts_v, alpha) @ emb_t
        repv = _propagate_mean(Av, x0v, 2)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        v = repv[users]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
        loss = (
            torch.nn.functional.softplus((u_r * n_r).sum(1) - (u_r * p_r).sum(1)).mean()
            + l2_reg * l2.mean()
        )
        pos_s = (emb_t[au] * emb_t[model.user_dim + ap] * w_t[None]).sum(1)
        neg_s = (emb_t[au] * emb_t[model.user_dim + an] * w_t[None]).sum(1)
        loss = loss + aux_reg * torch.nn.functional.softplus(neg_s - pos_s).mean()
        loss = loss + c_reg * torch_info_nce(u_r, v, v).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))
        if s % 2 == 1:
            alpha *= 0.99
            with torch.no_grad():
                rep_eval = _propagate_mean(A, _torch_feat(feat_counts, alpha) @ emb_t, 2)
                pairs = _torch_topk_pairs(
                    rep_eval, ds.n_users, aug_num, negate_items=False
                )
            union = _union_pairs(train_pairs, pairs)
            Av = torch_norm_adj_from_pairs(union, ds.n_users, ds.n_items)
            feat_counts_v = _torch_feat_counts(ds, model, pairs=union)

    # ---- ours ----
    params = {"embedding": jnp.asarray(emb0), "w": jnp.ones((d,), jnp.float32)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg, au, ap, an):
        def loss_fn(p):
            u_r, p_r, n_r, l2, closs = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            bpr = L.bpr_loss(u_r, p_r, n_r)
            emb, w = p["embedding"], p["w"]
            pos_s = jnp.sum(emb[au] * emb[model.user_dim + ap] * w[None], axis=1)
            neg_s = jnp.sum(emb[au] * emb[model.user_dim + an] * w[None], axis=1)
            aux = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            return bpr + l2_reg * l2.mean() + aux_reg * aux + c_reg * closs.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    steps = {}
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        # aug_feat_delta appears in the buffers after the first update —
        # jit once per buffer structure
        key = tuple(sorted(model.buffers))
        if key not in steps:
            steps[key] = jax.jit(step)
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg, au, ap, an)]
        params, opt_state, loss = steps[key](params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))
        if s % 2 == 1:
            model.feat_mat_anneal()
            model.update_aug_adj(params)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def test_dose_aug_drop_training_parity():
    """DOSE_aug_drop (model.py:2866-3179): random-inject + random-drop
    graphs, TWO InfoNCE terms — both of whose view reps the reference
    propagates over the AUG graph (model.py:3140-3142; quirk reproduced).
    The device-side random pair stream is replayed in the test so the torch
    replica builds the identical union graph."""
    from inductive_recommendation_tpu.graph.views import random_pairs_on_device

    ds = _synth(37)
    aug_num = 15
    model = _dose_model("DOSE_aug_drop", ds, aug_num=aug_num, aug_rate=0.7)
    d, lr, l2_reg, aux_reg, c_reg = 16, 1e-2, 1e-3, 0.01, 0.1
    rng = np.random.default_rng(37)
    emb0 = rng.standard_normal((model.feat_n_cols, d)).astype(np.float32) * 0.1
    batches = _batches(rng, ds, model, 4)
    train_pairs = np.asarray(model._dedup_train)

    def drawn_pairs(counter):
        return np.asarray(
            random_pairs_on_device(
                jnp.int32(counter),
                n=aug_num,
                n_users=ds.n_users,
                n_items=ds.n_items,
                seed=0,
            )
        )

    # __init__ drew counters 1 (aug pairs) and 2 (drop mask); the first
    # update_aug_adj draws 3 and 4
    feat_counts = _torch_feat_counts(ds, model)
    A = torch_norm_adj(ds).to(torch.float32)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt = torch.optim.Adam([emb_t, w_t], lr=lr)
    t_losses = []
    alpha = 1.0
    Av = torch_norm_adj_from_pairs(
        _union_pairs(train_pairs, drawn_pairs(1)), ds.n_users, ds.n_items
    )
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        feat = _torch_feat(feat_counts, alpha)
        x0 = feat @ emb_t
        rep = _propagate_mean(A, x0, 2)
        repv = _propagate_mean(Av, x0, 2)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        v = repv[users]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
        loss = (
            torch.nn.functional.softplus((u_r * n_r).sum(1) - (u_r * p_r).sum(1)).mean()
            + l2_reg * l2.mean()
        )
        pos_s = (emb_t[au] * emb_t[model.user_dim + ap] * w_t[None]).sum(1)
        neg_s = (emb_t[au] * emb_t[model.user_dim + an] * w_t[None]).sum(1)
        loss = loss + aux_reg * torch.nn.functional.softplus(neg_s - pos_s).mean()
        # both view terms ride the aug graph; dropout off -> identical
        loss = loss + c_reg * 2.0 * torch_info_nce(u_r, v, v).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))
        if s % 2 == 1:
            alpha *= 0.99
            Av = torch_norm_adj_from_pairs(
                _union_pairs(train_pairs, drawn_pairs(3)), ds.n_users, ds.n_items
            )

    # ---- ours ----
    params = {"embedding": jnp.asarray(emb0), "w": jnp.ones((d,), jnp.float32)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def step(params, opt_state, buffers, users, pos, neg, au, ap, an):
        def loss_fn(p):
            u_r, p_r, n_r, l2, closs = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            bpr = L.bpr_loss(u_r, p_r, n_r)
            emb, w = p["embedding"], p["w"]
            pos_s = jnp.sum(emb[au] * emb[model.user_dim + ap] * w[None], axis=1)
            neg_s = jnp.sum(emb[au] * emb[model.user_dim + an] * w[None], axis=1)
            aux = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            return bpr + l2_reg * l2.mean() + aux_reg * aux + c_reg * closs.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(step)
    j_losses = []
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg, au, ap, an)]
        params, opt_state, loss = jstep(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))
        if s % 2 == 1:
            model.feat_mat_anneal()
            model.update_aug_adj(params)

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
