"""Sharded training steps.

One jit contains sampling, forward (full-graph SpMM over the row-sharded
embedding), loss, backward, and the optimizer update. Sharding is declared
with ``with_sharding_constraint``; XLA turns the sharded-table gathers into
all-to-all / all-gather collectives and the data-parallel gradient reduction
into a psum — no hand-written communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from inductive_recommendation_tpu.data.sampling import sample_bpr_batch
from inductive_recommendation_tpu.train import losses as L


def make_sharded_bpr_step(model, optimizer, sampler, batch_size, l2_reg, mesh):
    """-> jitted step(params, opt_state, rng) -> (params, opt_state, loss)
    with table rows sharded over 'model' and the batch over 'data'."""

    def constrain_batch(x):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))

    def step(params, opt_state, buffers, smp, rng):
        rng_s, rng_m = jax.random.split(rng)
        users, pos, neg = sample_bpr_batch(smp, rng_s, batch_size)
        users, pos = constrain_batch(users), constrain_batch(pos)
        neg = jax.lax.with_sharding_constraint(
            neg, NamedSharding(mesh, P("data", None))
        )

        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg[:, 0], rng=rng_m, training=True, buffers=buffers
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, model.buffers, sampler, rng)

    return run


def make_edge_sharded_bpr_step(
    emat,
    mesh,
    optimizer,
    sampler,
    batch_size,
    l2_reg,
    n_users,
    n_layers,
    axis="model",
):
    """LightGCN BPR step where NEITHER the graph NOR the embedding table ever
    materializes on one device.

    The [n_nodes_pad, d] table is row-sharded over ``axis``, aligned with the
    edge-sharded layout's column blocks (parallel/spmm.py); every propagation
    layer is one reduce-scatter forward / all-gather backward, so per-device
    memory is O((|E| + n_nodes·d) / n_dev) — the capability that removes the
    reference's single-device HBM ceiling (full-graph propagation per batch,
    model.py:100-110).

    -> step(params, opt_state, rng) with params = {"embedding": sharded
    [n_cols_pad, d]}; returns (params, opt_state, loss). Loss matches the
    single-device LightGCN step on the same batch (fp reassociation aside).
    """
    from inductive_recommendation_tpu.parallel.spmm import _wrap

    spmm = _wrap(emat, mesh, axis, "scatter")

    def step(params, opt_state, fwd, bwd, smp, rng):
        rng_s, _ = jax.random.split(rng)
        users, pos, neg = sample_bpr_batch(smp, rng_s, batch_size)

        def loss_fn(p):
            x = p["embedding"]
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(axis, None))
            )
            acc, h = x, x
            for _ in range(n_layers):
                h = spmm(fwd, bwd, None, h)
                acc = acc + h
            rep = acc / (n_layers + 1)
            u_r = rep[users]
            p_r = rep[n_users + pos]
            n_r = rep[n_users + neg[:, 0]]
            # L2 on the ego embeddings (model.py:114-117)
            l2 = (
                jnp.sum(x[users] ** 2, 1)
                + jnp.sum(x[n_users + pos] ** 2, 1)
                + jnp.sum(x[n_users + neg[:, 0]] ** 2, 1)
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, emat.fwd, emat.bwd, sampler, rng)

    return run


def make_sharded_igcn_step(
    model, optimizer, sampler, aux_sampler, batch_size, l2_reg, aux_reg, mesh
):
    """Sharded FULL IGCN training step: main BPR over the inductive rep +
    aux BPR on the row-sharded core embedding table weighted by w.

    The embedding table is sharded over 'model'; the feature-matrix SpMM
    gathers against it, which XLA turns into all-to-all/all-gather
    collectives; data-parallel gradients psum over 'data'.
    """

    def constrain_batch(x):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))

    user_dim = model.user_dim

    def step(params, opt_state, buffers, smp, aux_smp, rng):
        rng_s, rng_a, rng_m = jax.random.split(rng, 3)
        users, pos, neg = sample_bpr_batch(smp, rng_s, batch_size)
        a_users, a_pos, a_neg = sample_bpr_batch(aux_smp, rng_a, batch_size)
        users, pos = constrain_batch(users), constrain_batch(pos)
        a_users, a_pos = constrain_batch(a_users), constrain_batch(a_pos)

        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg[:, 0], rng=rng_m, training=True, buffers=buffers
            )[:4]
            bpr = L.bpr_loss(u_r, p_r, n_r)
            emb, w = p["embedding"], p["w"]
            au = emb[a_users]
            ap = emb[user_dim + a_pos]
            an = emb[user_dim + a_neg[:, 0]]
            pos_s = jnp.sum(au * ap * w[None, :], axis=1)
            neg_s = jnp.sum(au * an * w[None, :], axis=1)
            aux_loss = jnp.mean(jax.nn.softplus(neg_s - pos_s))
            return bpr + l2_reg * l2.mean() + aux_reg * aux_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, model.buffers, sampler, aux_sampler, rng)

    return run
