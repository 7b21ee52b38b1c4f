"""Device-side BPR negative sampling.

The reference samples on the host inside 6 DataLoader worker processes
(dataset.py:119-131 + trainer.py:407): uniform-random *user* resampling, a
uniform positive from that user's train items, and rejection-sampled
negatives. Here the whole batch is drawn on device by one jitted function —
no host workers, no per-batch H2D traffic, and the sampler composes into the
same jit as the train step.

Divergence (documented): the reference's rejection loop is unbounded; XLA
needs static shapes, so we use ``n_tries`` fixed resampling rounds and keep
the last candidate if all rounds hit positives. For the neg_ratio=1,
|pos(u)| << n_items regimes here the residual false-negative probability is
(deg/n_items)^n_tries ~ 1e-20 — unmeasurable in training.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.data.dataset import pad_user_lists


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pos_sorted", "deg", "valid_users"],
    meta_fields=["n_items", "max_deg"],
)
@dataclasses.dataclass(frozen=True)
class SamplerState:
    """Static per-dataset tensors the sampler needs.

    pos_sorted: [n_users, max_deg] sorted train items, padded with n_items
    deg:        [n_users] train degree
    valid_users:[n_valid] users with deg > 0 (reference resamples until it
                hits one, dataset.py:120-122; sampling uniformly from this
                list is the closed form of that loop)
    """

    pos_sorted: jnp.ndarray
    deg: jnp.ndarray
    valid_users: jnp.ndarray
    n_items: int
    max_deg: int


def build_sampler_state(train_data, n_items) -> SamplerState:
    padded, lengths = pad_user_lists(train_data, n_items, sort=True)
    valid = np.nonzero(lengths > 0)[0].astype(np.int32)
    return SamplerState(
        pos_sorted=jnp.asarray(padded),
        deg=jnp.asarray(lengths),
        valid_users=jnp.asarray(valid),
        n_items=int(n_items),
        max_deg=int(padded.shape[1]),
    )


def _is_member(state: SamplerState, users: jnp.ndarray, cands: jnp.ndarray):
    """Vectorized membership test: cands[b] in train(users[b])?

    Rows are sorted and padded with the n_items sentinel, so a binary search
    per row suffices (vmapped searchsorted).
    """
    rows = state.pos_sorted[users]  # [B, max_deg]
    pos = jax.vmap(jnp.searchsorted)(rows, cands)
    pos = jnp.clip(pos, 0, state.max_deg - 1)
    return jnp.take_along_axis(rows, pos[:, None], axis=1)[:, 0] == cands


def sample_bpr_batch(
    state: SamplerState,
    rng: jax.Array,
    batch_size: int,
    neg_ratio: int = 1,
    n_tries: int = 16,
):
    """Draw (users, pos_items, neg_items[batch, neg_ratio]) on device.

    Semantics match dataset.py:119-131: users uniform over non-empty users,
    positive uniform over the user's train items (shared across the
    neg_ratio copies), negatives rejection-sampled per copy.
    """
    rng_u, rng_p, rng_n = jax.random.split(rng, 3)
    uidx = jax.random.randint(rng_u, (batch_size,), 0, state.valid_users.shape[0])
    users = state.valid_users[uidx]
    pos_slot = jax.random.randint(rng_p, (batch_size,), 0, 1 << 30) % state.deg[users]
    pos_items = jnp.take_along_axis(
        state.pos_sorted[users], pos_slot[:, None], axis=1
    )[:, 0]

    flat_users = jnp.repeat(users, neg_ratio)

    def try_round(carry, rng_t):
        neg, done = carry
        cand = jax.random.randint(
            rng_t, (batch_size * neg_ratio,), 0, state.n_items
        ).astype(neg.dtype)
        member = _is_member(state, flat_users, cand)
        take = jnp.logical_and(~done, ~member)
        neg = jnp.where(take, cand, neg)
        # also overwrite still-undone slots with the latest candidate as a
        # fallback so the final value is at least uniform (bias documented)
        neg = jnp.where(jnp.logical_and(~done, member), cand, neg)
        done = jnp.logical_or(done, ~member)
        return (neg, done), None

    init_neg = jnp.zeros((batch_size * neg_ratio,), dtype=pos_items.dtype)
    (neg, _), _ = jax.lax.scan(
        try_round,
        (init_neg, jnp.zeros((batch_size * neg_ratio,), dtype=bool)),
        jax.random.split(rng_n, n_tries),
    )
    neg_items = neg.reshape(batch_size, neg_ratio)
    return users, pos_items, neg_items
