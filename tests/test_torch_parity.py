"""Cross-framework golden parity: our jitted LightGCN BPR training step vs
an independent torch (CPU) implementation of the reference's exact math
(model.py:79-127 + trainer.py:412-429), fed identical weights and batches.

The reference itself cannot run here (DGL is not in the image), so the torch
replica recreates its computation with dense matmuls — same normalized
adjacency, same layer-mean propagation, same softplus BPR + ego-embedding L2,
same Adam hyperparameters. Agreement over several optimizer steps validates
propagation, loss, gradients, and optimizer together.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from inductive_recommendation_tpu import get_dataset, get_model
from inductive_recommendation_tpu.train import losses as L


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def setup():
    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 40,
            "n_items": 30,
            "n_interactions": 500,
            "seed": 3,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    model = get_model({"name": "LightGCN", "embedding_size": 16, "n_layers": 3}, ds)
    return ds, model


def torch_norm_adj(ds):
    n = ds.n_users + ds.n_items
    A = torch.zeros((n, n), dtype=torch.float64)
    for u, i in np.asarray(ds.train_array):
        A[u, ds.n_users + i] += 1.0
        A[ds.n_users + i, u] += 1.0
    deg = torch.clamp(A.sum(dim=1), min=1.0)
    d_inv = deg.pow(-0.5)
    return d_inv[:, None] * A * d_inv[None, :]


def test_lightgcn_training_parity(setup):
    ds, model = setup
    n = ds.n_users + ds.n_items
    d = 16
    lr = 1e-2
    l2_reg = 1e-3
    rng = np.random.default_rng(0)
    emb0 = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    batches = [
        (
            rng.integers(0, ds.n_users, 64),
            rng.integers(0, ds.n_items, 64),
            rng.integers(0, ds.n_items, 64),
        )
        for _ in range(5)
    ]

    # ---- torch replica of the reference math ----
    A = torch_norm_adj(ds).to(torch.float32)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    opt = torch.optim.Adam([emb_t], lr=lr)
    t_losses = []
    for users, pos, neg in batches:
        h = emb_t
        acc = emb_t.clone()
        for _ in range(3):
            h = A @ h
            acc = acc + h
        rep = acc / 4.0
        u_r = rep[users]
        p_r = rep[ds.n_users + pos]
        n_r = rep[ds.n_users + neg]
        l2 = (
            emb_t[users].norm(dim=1) ** 2
            + emb_t[ds.n_users + pos].norm(dim=1) ** 2
            + emb_t[ds.n_users + neg].norm(dim=1) ** 2
        )
        pos_s = (u_r * p_r).sum(dim=1)
        neg_s = (u_r * n_r).sum(dim=1)
        loss = torch.nn.functional.softplus(neg_s - pos_s).mean() + l2_reg * l2.mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---- our jitted step with the same weights/batches ----
    params = {"embedding": jnp.asarray(emb0)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, users, pos, neg):
        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg, training=False
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for users, pos, neg in batches:
        params, opt_state, loss = step(
            params,
            opt_state,
            jnp.asarray(users.astype(np.int32)),
            jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(neg.astype(np.int32)),
        )
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]),
        emb_t.detach().numpy(),
        rtol=5e-3,
        atol=5e-5,
    )


def test_igcn_training_parity():
    """The flagship: our jitted IGCN step (baked annealed feat weights + aux
    BPR with w) vs an independent torch replica of the reference math
    (model.py:4107-4220 + trainer.py:518-561), identical weights/batches.
    Dropout off for determinism; anneal applied between steps on both sides."""
    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 40,
            "n_items": 30,
            "n_interactions": 500,
            "seed": 7,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "table_align": 1,
        },
        ds,
    )
    n = ds.n_users + ds.n_items
    C = model.feat_n_cols
    d, lr, l2_reg, aux_reg = 16, 1e-2, 1e-3, 0.01
    rng = np.random.default_rng(1)
    emb0 = rng.standard_normal((C, d)).astype(np.float32) * 0.1
    batches = [
        (
            rng.integers(0, ds.n_users, 64),
            rng.integers(0, ds.n_items, 64),
            rng.integers(0, ds.n_items, 64),
            rng.integers(0, model.user_dim, 64),  # aux (core ids)
            rng.integers(0, model.item_dim, 64),
            rng.integers(0, model.item_dim, 64),
        )
        for _ in range(4)
    ]

    # ---- torch replica ----
    feat_counts = torch.zeros((n, C), dtype=torch.float64)
    um, im = model.user_map, model.item_map
    for u, i in np.asarray(ds.train_array):
        feat_counts[u, model.user_dim + im[i]] += 1.0
        feat_counts[ds.n_users + i, um[u]] += 1.0
    feat_counts[: ds.n_users, model.user_dim + model.item_dim] += 1.0
    feat_counts[ds.n_users :, model.user_dim + model.item_dim + 1] += 1.0
    row_sum = feat_counts.sum(dim=1)
    A = torch_norm_adj(ds).to(torch.float32)

    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt = torch.optim.Adam([emb_t, w_t], lr=lr)
    t_losses = []
    alpha = 1.0
    for users, pos, neg, au, ap, an in batches:
        weights = row_sum ** ((alpha - 1.0) / 2.0 - 0.5)
        feat = (feat_counts * weights[:, None]).to(torch.float32)
        h = feat @ emb_t
        acc = h.clone()
        x = h
        for _ in range(2):
            x = A @ x
            acc = acc + x
        rep = acc / 3.0
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        l2 = (
            (u_r**2).sum(dim=1) + (p_r**2).sum(dim=1) + (n_r**2).sum(dim=1)
        )
        loss = torch.nn.functional.softplus(
            (u_r * n_r).sum(1) - (u_r * p_r).sum(1)
        ).mean() + l2_reg * l2.mean()
        pos_s = (emb_t[au] * emb_t[model.user_dim + ap] * w_t[None]).sum(1)
        neg_s = (emb_t[au] * emb_t[model.user_dim + an] * w_t[None]).sum(1)
        loss = loss + aux_reg * torch.nn.functional.softplus(neg_s - pos_s).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))
        alpha *= 0.99  # feat_mat_anneal between steps

    # ---- our jitted step ----
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


def torch_norm_adj_from_pairs(pairs, n_users, n_items):
    n = n_users + n_items
    A = torch.zeros((n, n), dtype=torch.float64)
    for u, i in np.asarray(pairs):
        A[u, n_users + i] += 1.0
        A[n_users + i, u] += 1.0
    deg = torch.clamp(A.sum(dim=1), min=1.0)
    d_inv = deg.pow(-0.5)
    return (d_inv[:, None] * A * d_inv[None, :]).to(torch.float32)


def torch_info_nce(q, p, n, temperature=0.1):
    """info-nce-pytorch 'unpaired' semantics, exactly as losses.info_nce
    (incl. the zero-row-safe normalization clamp)."""
    def l2n(x, eps=1e-12):
        sq = (x * x).sum(dim=-1, keepdim=True)
        return x / torch.sqrt(torch.clamp(sq, min=eps * eps))

    q, p, n = l2n(q), l2n(p), l2n(n)
    pos = (q * p).sum(dim=-1, keepdim=True)
    neg = q @ n.T
    logits = torch.cat([pos, neg], dim=1) / temperature
    return -torch.log_softmax(logits, dim=1)[:, 0]


def test_dose_drop2_training_parity():
    """The DOSE family's defining loss — IGCN main BPR + aux BPR + InfoNCE
    against a dropped-view propagation — vs an independent torch replica of
    the reference math (model.py:1673-1961 + trainer.py:307-353), with the
    SAME fixed keep masks injected on both sides (views regenerate between
    steps, exercising the baked-view path)."""
    from inductive_recommendation_tpu.graph.views import bake_view

    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 36,
            "n_items": 28,
            "n_interactions": 450,
            "seed": 9,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    model = get_model(
        {
            "name": "DOSE_drop2",
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "aug_rate": 0.6,
            "table_align": 1,
        },
        ds,
    )
    n = ds.n_users + ds.n_items
    C = model.feat_n_cols
    d, lr, l2_reg, aux_reg, c_reg = 16, 1e-2, 1e-3, 0.01, 0.1
    rng = np.random.default_rng(2)
    emb0 = rng.standard_normal((C, d)).astype(np.float32) * 0.1
    E = len(model._dedup_train)
    masks = [rng.random(E) < 0.6 for _ in range(2)]
    batches = [
        (
            rng.integers(0, ds.n_users, 48),
            rng.integers(0, ds.n_items, 48),
            rng.integers(0, ds.n_items, 48),
            rng.integers(0, model.user_dim, 48),
            rng.integers(0, model.item_dim, 48),
            rng.integers(0, model.item_dim, 48),
        )
        for _ in range(4)
    ]

    # ---- torch replica ----
    feat_counts = torch.zeros((n, C), dtype=torch.float64)
    um, im = model.user_map, model.item_map
    for u, i in np.asarray(ds.train_array):
        feat_counts[u, model.user_dim + im[i]] += 1.0
        feat_counts[ds.n_users + i, um[u]] += 1.0
    feat_counts[: ds.n_users, model.user_dim + model.item_dim] += 1.0
    feat_counts[ds.n_users :, model.user_dim + model.item_dim + 1] += 1.0
    row_sum = feat_counts.sum(dim=1)
    feat = (feat_counts * (row_sum ** -0.5)[:, None]).to(torch.float32)  # alpha=1
    A = torch_norm_adj(ds).to(torch.float32)

    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    w_t = torch.nn.Parameter(torch.ones(d))
    opt = torch.optim.Adam([emb_t, w_t], lr=lr)
    t_losses = []
    for s, (users, pos, neg, au, ap, an) in enumerate(batches):
        Av = torch_norm_adj_from_pairs(
            np.asarray(model._dedup_train)[masks[s % 2]], ds.n_users, ds.n_items
        )
        x0 = feat @ emb_t
        acc, x = x0.clone(), x0
        for _ in range(2):
            x = A @ x
            acc = acc + x
        rep = acc / 3.0
        accv, xv = x0.clone(), x0
        for _ in range(2):
            xv = Av @ xv
            accv = accv + xv
        repv = accv / 3.0
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
        t_losses.append(float(loss))

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
        model.buffers = dict(
            model.buffers,
            aug_adj=bake_view(
                model.view_engine.base,
                model.view_engine.make_view(keep_pair_mask=masks[s % 2]),
            ),
        )
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg, au, ap, an)]
        params, opt_state, loss = jstep(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
