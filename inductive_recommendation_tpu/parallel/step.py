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
