"""Golden end-to-end parity: train LightGCN to (partial) convergence with
this framework AND with an independent torch CPU implementation of the
reference math, same data/batches/init, and compare Recall@20 / NDCG@20.

Stands in for the reference-run parity gate (the reference itself needs DGL,
which is not in this image, and public datasets are not fetchable — zero
egress), at ML-100K-like scale.

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python benchmarks/golden_parity.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if jax.default_backend() not in ("cpu",):
        print(f"backend: {jax.default_backend()}")
    import jax.numpy as jnp
    import optax
    import torch

    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset
    from inductive_recommendation_tpu.eval.evaluator import Evaluator
    from inductive_recommendation_tpu.models import get_model
    from inductive_recommendation_tpu.train import losses as L

    # ML-100K-like scale
    ds = quick_synthetic_dataset(943, 1682, 100_000, seed=7)
    n = ds.n_users + ds.n_items
    d, n_layers, lr, l2_reg, batch = 64, 3, 1e-2, 1e-4, 2048
    n_steps = 150
    rng = np.random.default_rng(0)
    emb0 = (rng.standard_normal((n, d)) * 0.1).astype(np.float32)
    batches = [
        (
            rng.integers(0, ds.n_users, batch),
            rng.integers(0, ds.n_items, batch),
            rng.integers(0, ds.n_items, batch),
        )
        for _ in range(n_steps)
    ]
    # replace random pos with actual positives (uniform over user's items)
    for bi, (users, pos, neg) in enumerate(batches):
        pos = np.array(
            [
                ds.train_data[u][rng.integers(0, len(ds.train_data[u]))]
                if ds.train_data[u]
                else 0
                for u in users
            ]
        )
        batches[bi] = (users, pos, neg)

    # ---- ours ----
    model = get_model(
        {"name": "LightGCN", "embedding_size": d, "n_layers": n_layers}, ds
    )
    params = {"embedding": jnp.asarray(emb0)}
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, users, pos, neg):
        def loss_fn(p):
            u, pp, nn, l2 = model.bpr_forward(p, users, pos, neg, training=False)
            return L.bpr_loss(u, pp, nn) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for users, pos, neg in batches:
        params, opt_state, loss = step(
            params,
            opt_state,
            jnp.asarray(users.astype(np.int32)),
            jnp.asarray(pos.astype(np.int32)),
            jnp.asarray(neg.astype(np.int32)),
        )
    print(f"ours: {n_steps} steps in {time.time()-t0:.1f}s, loss {float(loss):.4f}")
    ev = Evaluator(ds, [20], test_batch_size=256)
    _, ours = ev.evaluate(model, params, "val")

    # ---- torch replica of the reference math ----
    A = torch.zeros((n, n), dtype=torch.float32)
    for u, i in np.asarray(ds.train_array):
        A[u, ds.n_users + i] += 1.0
        A[ds.n_users + i, u] += 1.0
    deg = torch.clamp(A.sum(dim=1), min=1.0)
    d_inv = deg.pow(-0.5)
    A = d_inv[:, None] * A * d_inv[None, :]
    emb_t = torch.nn.Parameter(torch.tensor(emb0))
    opt = torch.optim.Adam([emb_t], lr=lr)
    t0 = time.time()
    for users, pos, neg in batches:
        h = emb_t
        acc = emb_t.clone()
        for _ in range(n_layers):
            h = A @ h
            acc = acc + h
        rep = acc / (n_layers + 1)
        u_r = rep[users]
        p_r = rep[ds.n_users + pos]
        n_r = rep[ds.n_users + neg]
        l2 = (
            emb_t[users].norm(dim=1) ** 2
            + emb_t[ds.n_users + pos].norm(dim=1) ** 2
            + emb_t[ds.n_users + neg].norm(dim=1) ** 2
        )
        loss = (
            torch.nn.functional.softplus(
                (u_r * n_r).sum(1) - (u_r * p_r).sum(1)
            ).mean()
            + l2_reg * l2.mean()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
    print(f"torch: {n_steps} steps in {time.time()-t0:.1f}s, loss {float(loss):.4f}")

    # evaluate the torch weights through OUR evaluator (same protocol)
    params_t = {"embedding": jnp.asarray(emb_t.detach().numpy())}
    _, theirs = ev.evaluate(model, params_t, "val")

    print(f"ours  recall@20 {ours['Recall'][20]:.4f}  ndcg@20 {ours['NDCG'][20]:.4f}")
    print(
        f"torch recall@20 {theirs['Recall'][20]:.4f}  ndcg@20 {theirs['NDCG'][20]:.4f}"
    )
    dr = abs(ours["Recall"][20] - theirs["Recall"][20])
    dn = abs(ours["NDCG"][20] - theirs["NDCG"][20])
    print(f"abs diff: recall {dr:.5f} ndcg {dn:.5f}")
    assert dr < 0.005 and dn < 0.005, "parity gate FAILED"
    print("GOLDEN PARITY OK")


if __name__ == "__main__":
    main()
