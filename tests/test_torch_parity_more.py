"""Cross-framework golden parity, part 2: NGCF, NeuMF, and MultiVAE vs
independent torch (CPU) replicas of the reference's exact math, fed identical
weights and batches through several Adam steps.

Covers the three trickiest non-graph model families:
- NGCF (model.py:3986-4055): self-loop L1 adjacency, gc/bi linear layers,
  leaky-relu(0.2), per-layer L2-normalized concat.
- NeuMF (model.py:4411-4467 + trainer.py:588-599): GMF/MLP towers, the
  arch switch, ones-initialized fusion, softplus BCE on pos + negs.
- MultiVAE (model.py:4348-4408 + trainer.py:622-641): L2-normalized
  profiles, tanh encoder/decoder, the reference's exact KL payload,
  multinomial log-likelihood + annealed KL + weight L2.

Determinism: dropout off everywhere; MultiVAE runs the training=False
reparameterization (eps=0 on both sides, exactly `float(self.training)*eps`
in model.py:4394) so every other term — including KL gradients — is compared
without injected noise.
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

def make_ds(n_users, n_items, n_inter, seed):
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


def adam_pair(lr, jax_params):
    optimizer = optax.adam(lr)
    return optimizer, optimizer.init(jax_params)


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
    """info-nce-pytorch 'unpaired' semantics (losses.info_nce parity)."""

    def l2n(x, eps=1e-12):
        sq = (x * x).sum(dim=-1, keepdim=True)
        return x / torch.sqrt(torch.clamp(sq, min=eps * eps))

    q, p, n = l2n(q), l2n(p), l2n(n)
    pos = (q * p).sum(dim=-1, keepdim=True)
    neg = q @ n.T
    logits = torch.cat([pos, neg], dim=1) / temperature
    return -torch.log_softmax(logits, dim=1)[:, 0]


# ---------------------------------------------------------------------------
# NGCF
# ---------------------------------------------------------------------------


def test_ngcf_training_parity():
    ds = make_ds(36, 28, 450, seed=11)
    d = 16
    layer_sizes = [16, 16]
    model = get_model(
        {
            "name": "NGCF",
            "embedding_size": d,
            "layer_sizes": layer_sizes,
            "dropout": 0.0,
        },
        ds,
    )
    n = ds.n_users + ds.n_items
    lr, l2_reg = 1e-2, 1e-3
    rng = np.random.default_rng(4)
    emb0 = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    sizes = [d] + layer_sizes
    gc0 = [rng.standard_normal((sizes[i], sizes[i + 1])).astype(np.float32) * 0.2
           for i in range(len(layer_sizes))]
    bi0 = [rng.standard_normal((sizes[i], sizes[i + 1])).astype(np.float32) * 0.2
           for i in range(len(layer_sizes))]
    batches = [
        (
            rng.integers(0, ds.n_users, 48),
            rng.integers(0, ds.n_items, 48),
            rng.integers(0, ds.n_items, 48),
        )
        for _ in range(5)
    ]

    # ---- torch replica (model.py:4008-4055) ----
    A = torch.zeros((n, n), dtype=torch.float64)
    for u, i in np.asarray(ds.train_array):
        A[u, ds.n_users + i] += 1.0
        A[ds.n_users + i, u] += 1.0
    A += torch.eye(n, dtype=torch.float64)
    A = (A / A.sum(dim=1, keepdim=True)).to(torch.float32)

    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    gc_t = [torch.nn.Parameter(torch.tensor(w)) for w in gc0]
    gcb_t = [torch.nn.Parameter(torch.zeros(w.shape[1])) for w in gc0]
    bi_t = [torch.nn.Parameter(torch.tensor(w)) for w in bi0]
    bib_t = [torch.nn.Parameter(torch.zeros(w.shape[1])) for w in bi0]
    opt = torch.optim.Adam([emb_t] + gc_t + gcb_t + bi_t + bib_t, lr=lr)
    t_losses = []
    for users, pos, neg in batches:
        h = emb_t
        all_layers = [h]
        for i in range(len(layer_sizes)):
            m0 = A @ h
            m1 = h * m0
            h = torch.nn.functional.leaky_relu(
                m0 @ gc_t[i] + gcb_t[i] + m1 @ bi_t[i] + bib_t[i],
                negative_slope=0.2,
            )
            all_layers.append(torch.nn.functional.normalize(h, p=2, dim=1))
        rep = torch.cat(all_layers, dim=1)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
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
        t_losses.append(float(loss))

    # ---- ours ----
    params = {
        "embedding": jnp.asarray(emb0),
        "gc_layers": [
            {"w": jnp.asarray(w), "b": jnp.zeros((w.shape[1],), jnp.float32)}
            for w in gc0
        ],
        "bi_layers": [
            {"w": jnp.asarray(w), "b": jnp.zeros((w.shape[1],), jnp.float32)}
            for w in bi0
        ],
    }
    optimizer, opt_state = adam_pair(lr, params)

    @jax.jit
    def step(params, opt_state, buffers, users, pos, neg):
        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for users, pos, neg in batches:
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg)]
        params, opt_state, loss = step(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    for i in range(len(layer_sizes)):
        np.testing.assert_allclose(
            np.asarray(params["gc_layers"][i]["w"]),
            gc_t[i].detach().numpy(),
            rtol=5e-3,
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(params["bi_layers"][i]["b"]),
            bib_t[i].detach().numpy(),
            rtol=5e-3,
            atol=5e-4,
        )


# ---------------------------------------------------------------------------
# NeuMF
# ---------------------------------------------------------------------------


def test_neumf_training_parity():
    """All three archs in sequence on shared weights — gmf steps, then mlp,
    then neumf — mirroring BCETrainer's phase order without the checkpoint
    reloads (those are covered by trainer tests). The optimizer is reset at
    each phase boundary exactly as both trainers do (trainer.py:578,584);
    without the reset the two frameworks legitimately diverge — torch leaves
    inactive-tower params out of the autograd graph (grad None, Adam step
    count frozen) while optax sees zero grads and advances its global count,
    changing the bias correction when the tower activates."""
    ds = make_ds(30, 24, 350, seed=13)
    d = 8
    layer_sizes = [16, 16, 8]
    model = get_model(
        {"name": "NeuMF", "embedding_size": d, "layer_sizes": layer_sizes}, ds
    )
    lr, l2_reg, n_neg = 1e-2, 1e-3, 2
    rng = np.random.default_rng(5)
    mf_u0 = rng.standard_normal((ds.n_users, d)).astype(np.float32) * 0.1
    mf_i0 = rng.standard_normal((ds.n_items, d)).astype(np.float32) * 0.1
    half = layer_sizes[0] // 2
    mlp_u0 = rng.standard_normal((ds.n_users, half)).astype(np.float32) * 0.1
    mlp_i0 = rng.standard_normal((ds.n_items, half)).astype(np.float32) * 0.1
    mlp_w0 = [
        rng.standard_normal((layer_sizes[i], layer_sizes[i + 1])).astype(np.float32)
        * 0.2
        for i in range(len(layer_sizes) - 1)
    ]
    out_dim = layer_sizes[-1] + d
    phases = [("gmf", 3), ("mlp", 3), ("neumf", 3)]
    batches = [
        (
            rng.integers(0, ds.n_users, 32),
            rng.integers(0, ds.n_items, 32),
            rng.integers(0, ds.n_items, (32, n_neg)),
        )
        for _ in range(sum(k for _, k in phases))
    ]

    # ---- torch replica (model.py:4441-4460 + trainer.py:588-599) ----
    mf_u = torch.nn.Parameter(torch.tensor(mf_u0))
    mf_i = torch.nn.Parameter(torch.tensor(mf_i0))
    mlp_u = torch.nn.Parameter(torch.tensor(mlp_u0))
    mlp_i = torch.nn.Parameter(torch.tensor(mlp_i0))
    mlp_w = [torch.nn.Parameter(torch.tensor(w)) for w in mlp_w0]
    mlp_b = [torch.nn.Parameter(torch.zeros(w.shape[1])) for w in mlp_w0]
    out_w = torch.nn.Parameter(torch.ones(out_dim))
    t_params = [mf_u, mf_i, mlp_u, mlp_i, out_w] + mlp_w + mlp_b

    def t_bce_forward(users, items, arch):
        mf_vec = mf_u[users] * mf_i[items]
        mlp_vec = torch.cat([mlp_u[users], mlp_i[items]], dim=1)
        for w, b in zip(mlp_w, mlp_b):
            mlp_vec = torch.nn.functional.leaky_relu(mlp_vec @ w + b)
        if arch == "gmf":
            vec = torch.cat([mf_vec, torch.zeros_like(mlp_vec)], dim=1)
        elif arch == "mlp":
            vec = torch.cat([torch.zeros_like(mf_vec), mlp_vec], dim=1)
        else:
            vec = torch.cat([mf_vec, mlp_vec], dim=1)
        scored = vec * out_w[None, :]
        return scored.sum(dim=1), (scored**2).sum(dim=1)

    t_losses = []
    bi = 0
    for arch, n_steps in phases:
        opt = torch.optim.Adam(t_params, lr=lr)  # phase-boundary reset
        for _ in range(n_steps):
            users, pos, neg = batches[bi]
            bi += 1
            pos_logits, l2_p = t_bce_forward(
                torch.tensor(users), torch.tensor(pos), arch
            )
            u_rep = torch.tensor(np.repeat(users, n_neg))
            neg_logits, l2_n = t_bce_forward(
                u_rep, torch.tensor(neg.reshape(-1)), arch
            )
            bce = torch.cat(
                [
                    torch.nn.functional.softplus(-pos_logits),
                    torch.nn.functional.softplus(neg_logits),
                ]
            ).mean()
            l2 = torch.cat([l2_p, l2_n]).mean()
            loss = bce + l2_reg * l2
            opt.zero_grad()
            loss.backward()
            opt.step()
            t_losses.append(float(loss))

    # ---- ours ----
    params = {
        "mf_user_embedding": jnp.asarray(mf_u0),
        "mf_item_embedding": jnp.asarray(mf_i0),
        "mlp_user_embedding": jnp.asarray(mlp_u0),
        "mlp_item_embedding": jnp.asarray(mlp_i0),
        "mlp_layers": [
            {"w": jnp.asarray(w), "b": jnp.zeros((w.shape[1],), jnp.float32)}
            for w in mlp_w0
        ],
        "output_w": jnp.ones((out_dim,), jnp.float32),
    }
    optimizer = optax.adam(lr)

    def make_step(arch):
        @jax.jit
        def step(params, opt_state, users, pos, neg):
            def loss_fn(p):
                pos_logits, l2_p = model.bce_forward(p, users, pos, arch=arch)
                u_rep = jnp.repeat(users, n_neg)
                neg_logits, l2_n = model.bce_forward(
                    p, u_rep, neg.reshape(-1), arch=arch
                )
                bce = L.bce_losses(pos_logits, neg_logits).mean()
                l2 = jnp.concatenate([l2_p, l2_n], axis=0)
                return bce + l2_reg * l2.mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    j_losses = []
    bi = 0
    for arch, n_steps in phases:
        step = make_step(arch)
        opt_state = optimizer.init(params)  # phase-boundary reset
        for _ in range(n_steps):
            users, pos, neg = batches[bi]
            bi += 1
            params, opt_state, loss = step(
                params,
                opt_state,
                jnp.asarray(users.astype(np.int32)),
                jnp.asarray(pos.astype(np.int32)),
                jnp.asarray(neg.astype(np.int32)),
            )
            j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["mf_user_embedding"]),
        mf_u.detach().numpy(),
        rtol=5e-3,
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["mlp_layers"][0]["w"]),
        mlp_w[0].detach().numpy(),
        rtol=5e-3,
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["output_w"]), out_w.detach().numpy(), rtol=5e-3, atol=5e-4
    )


# ---------------------------------------------------------------------------
# MultiVAE
# ---------------------------------------------------------------------------


def test_multivae_training_parity():
    ds = make_ds(30, 24, 350, seed=17)
    layer_sizes = [16, 8]
    model = get_model(
        {"name": "MultiVAE", "layer_sizes": layer_sizes, "dropout": 0.0}, ds
    )
    lr, l2_reg, kl_reg = 1e-2, 1e-3, 0.2
    e_sizes = [ds.n_items] + layer_sizes  # encoder, last doubled below
    d_sizes = e_sizes[::-1]
    mid = e_sizes[-1]
    e_out = e_sizes[1:-1] + [mid * 2]
    rng = np.random.default_rng(6)
    enc0 = [
        rng.standard_normal((e_sizes[i], e_out[i])).astype(np.float32) * 0.2
        for i in range(len(e_out))
    ]
    dec0 = [
        rng.standard_normal((d_sizes[i], d_sizes[i + 1])).astype(np.float32) * 0.2
        for i in range(len(d_sizes) - 1)
    ]
    batches = [rng.integers(0, ds.n_users, 16) for _ in range(5)]

    # profiles (binary + L2-normalized rows), from the dataset
    prof = np.zeros((ds.n_users, ds.n_items), np.float32)
    for u, lst in enumerate(ds.train_data):
        for i in lst:
            prof[u, i] = 1.0
    deg = np.maximum(prof.sum(axis=1), 1.0)
    prof_norm = prof / np.sqrt(deg)[:, None]

    # ---- torch replica (model.py:4377-4401 + trainer.py:622-641), eval-mode
    # reparam (float(self.training)=0 -> h = mean exactly) ----
    enc_t = [torch.nn.Parameter(torch.tensor(w)) for w in enc0]
    encb_t = [torch.nn.Parameter(torch.zeros(w.shape[1])) for w in enc0]
    dec_t = [torch.nn.Parameter(torch.tensor(w)) for w in dec0]
    decb_t = [torch.nn.Parameter(torch.zeros(w.shape[1])) for w in dec0]
    opt = torch.optim.Adam(enc_t + encb_t + dec_t + decb_t, lr=lr)
    t_losses = []
    for users in batches:
        h = torch.tensor(prof_norm[users])
        l2 = torch.zeros(1)
        h = h @ enc_t[0] + encb_t[0]
        l2 = l2 + (enc_t[0] ** 2).sum()
        for w, b in zip(enc_t[1:], encb_t[1:]):
            h = torch.tanh(h) @ w + b
            l2 = l2 + (w**2).sum()
        mean, log_var = h[:, :mid], h[:, -mid:]
        kl = torch.sum(-log_var + torch.exp(log_var) + mean**2, dim=1)
        h = mean
        for w, b in zip(dec_t[:-1], decb_t[:-1]):
            h = torch.tanh(h @ w + b)
            l2 = l2 + (w**2).sum()
        scores = h @ dec_t[-1] + decb_t[-1]
        l2 = l2 + (dec_t[-1] ** 2).sum()
        log_probs = torch.log_softmax(scores, dim=1)
        ml = -torch.sum(torch.tensor(prof[users]) * log_probs, dim=1).mean()
        loss = ml + kl_reg * kl.mean() + l2_reg * l2.mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---- ours ----
    params = {
        "encoder": [
            {"w": jnp.asarray(w), "b": jnp.zeros((w.shape[1],), jnp.float32)}
            for w in enc0
        ],
        "decoder": [
            {"w": jnp.asarray(w), "b": jnp.zeros((w.shape[1],), jnp.float32)}
            for w in dec0
        ],
    }
    optimizer, opt_state = adam_pair(lr, params)

    @jax.jit
    def step(params, opt_state, buffers, users):
        def loss_fn(p):
            scores, kl, l2 = model.ml_forward(
                p, users, training=False, buffers=buffers
            )
            profiles = model._profiles(buffers, users, normalized=False)
            ml = L.multinomial_ll_loss(scores, profiles)
            return ml + kl_reg * kl.mean() + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for users in batches:
        params, opt_state, loss = step(
            params, opt_state, model.buffers, jnp.asarray(users.astype(np.int32))
        )
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["encoder"][0]["w"]),
        enc_t[0].detach().numpy(),
        rtol=5e-3,
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["decoder"][-1]["w"]),
        dec_t[-1].detach().numpy(),
        rtol=5e-3,
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["decoder"][-1]["b"]),
        decb_t[-1].detach().numpy(),
        rtol=5e-3,
        atol=5e-4,
    )


# ---------------------------------------------------------------------------
# SGL (two-view InfoNCE) and IMCGAE (layer-scaled sum combine)
# ---------------------------------------------------------------------------


def test_sgl_training_parity():
    """SGL's defining loss — BPR on the main propagation + InfoNCE between
    the user reps of two random-edge-drop views (model.py:130-244 +
    trainer.py:432-459) — vs an independent torch replica with the SAME keep
    masks injected on both sides, regenerated between steps."""
    from inductive_recommendation_tpu.graph.views import bake_view

    ds = make_ds(36, 28, 450, seed=21)
    model = get_model(
        {"name": "SGL", "embedding_size": 16, "n_layers": 2, "aug_rate": 0.7}, ds
    )
    n = ds.n_users + ds.n_items
    d, lr, l2_reg, c_reg = 16, 1e-2, 1e-3, 0.1
    rng = np.random.default_rng(8)
    emb0 = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    E = len(model.view_engine.train_pairs)
    # two keep masks per "epoch", two epochs
    masks = [rng.random(E) < 0.7 for _ in range(4)]
    batches = [
        (
            rng.integers(0, ds.n_users, 48),
            rng.integers(0, ds.n_items, 48),
            rng.integers(0, ds.n_items, 48),
        )
        for _ in range(4)
    ]

    # ---- torch replica ----
    A = torch_norm_adj_from_pairs(ds.train_array, ds.n_users, ds.n_items)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    opt = torch.optim.Adam([emb_t], lr=lr)

    def t_prop(Ax):
        h = emb_t
        acc = emb_t.clone()
        for _ in range(2):
            h = Ax @ h
            acc = acc + h
        return acc / 3.0

    t_losses = []
    for s, (users, pos, neg) in enumerate(batches):
        e = (s // 2) * 2  # masks pair per epoch
        A1 = torch_norm_adj_from_pairs(
            np.asarray(model.view_engine.train_pairs)[masks[e]], ds.n_users, ds.n_items
        )
        A2 = torch_norm_adj_from_pairs(
            np.asarray(model.view_engine.train_pairs)[masks[e + 1]],
            ds.n_users,
            ds.n_items,
        )
        rep = t_prop(A)
        u_r, p_r, n_r = rep[users], rep[ds.n_users + pos], rep[ds.n_users + neg]
        v1 = t_prop(A1)[users]
        v2 = t_prop(A2)[users]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
        loss = (
            torch.nn.functional.softplus((u_r * n_r).sum(1) - (u_r * p_r).sum(1)).mean()
            + l2_reg * l2.mean()
            + c_reg * torch_info_nce(v1, v2, v2).mean()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # ---- ours (same masks baked into the view buffers) ----
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
        e = (s // 2) * 2
        model.buffers = dict(
            model.buffers,
            aug_adj1=bake_view(
                model.view_engine.base,
                model.view_engine.make_view(keep_pair_mask=masks[e]),
            ),
            aug_adj2=bake_view(
                model.view_engine.base,
                model.view_engine.make_view(keep_pair_mask=masks[e + 1]),
            ),
        )
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg)]
        params, opt_state, loss = jstep(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def test_imcgae_training_parity():
    """IMCGAE's 3d-wide shared/personal embedding concat, 1/(i+2) layer
    scaling and sum combine (model.py:4300-4345) vs a torch replica
    (dropout off for determinism)."""
    ds = make_ds(30, 24, 350, seed=23)
    model = get_model(
        {"name": "IMCGAE", "embedding_size": 16, "n_layers": 2, "dropout": 0.0}, ds
    )
    n = ds.n_users + ds.n_items
    d, lr, l2_reg = 16, 1e-2, 1e-3
    rng = np.random.default_rng(9)
    emb0 = rng.standard_normal((n + 3, d)).astype(np.float32) * 0.1
    batches = [
        (
            rng.integers(0, ds.n_users, 32),
            rng.integers(0, ds.n_items, 32),
            rng.integers(0, ds.n_items, 32),
        )
        for _ in range(5)
    ]

    A = torch_norm_adj_from_pairs(ds.train_array, ds.n_users, ds.n_items)
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    opt = torch.optim.Adam([emb_t], lr=lr)
    t_losses = []
    for users, pos, neg in batches:
        pu = emb_t[: ds.n_users]
        pi = emb_t[ds.n_users : n]
        identical = emb_t[n]
        gu, gi = emb_t[n + 1], emb_t[n + 2]
        u_rep = torch.cat(
            [pu, gu[None, :].expand(pu.shape), identical[None, :].expand(pu.shape)],
            dim=1,
        )
        i_rep = torch.cat(
            [pi, gi[None, :].expand(pi.shape), identical[None, :].expand(pi.shape)],
            dim=1,
        )
        h = torch.cat([u_rep, i_rep], dim=0)
        final = h.clone()
        x = h
        for i in range(2):
            x = A @ x
            final = final + x / float(i + 2)
        u_r = final[users]
        p_r = final[ds.n_users + pos]
        n_r = final[ds.n_users + neg]
        l2 = (u_r**2).sum(1) + (p_r**2).sum(1) + (n_r**2).sum(1)
        loss = (
            torch.nn.functional.softplus((u_r * n_r).sum(1) - (u_r * p_r).sum(1)).mean()
            + l2_reg * l2.mean()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    params = {"embedding": jnp.asarray(emb0)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, buffers, users, pos, neg):
        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg, training=False, buffers=buffers
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for users, pos, neg in batches:
        args = [jnp.asarray(a.astype(np.int32)) for a in (users, pos, neg)]
        params, opt_state, loss = step(params, opt_state, model.buffers, *args)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]), emb_t.detach().numpy(), rtol=5e-3, atol=5e-4
    )
