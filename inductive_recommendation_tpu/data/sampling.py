"""Device-side BPR negative sampling.

The reference samples on the host inside 6 DataLoader worker processes
(dataset.py:119-131 + trainer.py:407): uniform-random *user* resampling, a
uniform positive from that user's train items, and rejection-sampled
negatives. Here the whole batch is drawn on device by one jitted function —
no host workers, no per-batch H2D traffic, and the sampler composes into the
same jit as the train step.

Data structure: a CSR-style flat layout, O(|E|) memory —
- ``items_flat``: train items grouped by user, each user's slice sorted
- ``offsets``/``deg``: per-user slice bounds
- membership of (u, i) is a fixed-iteration binary search inside u's slice
  (vectorized over the batch; 32 iterations covers any |E| < 2^32). This
  avoids both padded per-user rows (O(n_users * max_degree) memory on
  power-law graphs) and 64-bit flat keys (int64 is unavailable without
  jax_enable_x64 and would silently truncate for large catalogs).

Negative sampling is EXACT (no rejection): a rank is drawn uniformly over
the user's non-positive items and mapped through the sorted positives by a
fixed-iteration binary search — the same distribution the reference's
unbounded rejection loop converges to, with a ~log2(max_degree) gather
chain and zero false negatives.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["items_flat", "offsets", "deg", "valid_users"],
    meta_fields=["n_items", "max_degree"],
)
@dataclasses.dataclass(frozen=True)
class SamplerState:
    """Static per-dataset tensors the sampler needs (see module docstring).

    valid_users: users with deg > 0; the reference resamples until it hits
    one (dataset.py:120-122) — uniform choice from this list is the closed
    form of that loop.
    """

    items_flat: jnp.ndarray  # [E] int32, per-user slices sorted
    offsets: jnp.ndarray  # [n_users + 1] int32
    deg: jnp.ndarray  # [n_users] int32
    valid_users: jnp.ndarray  # [n_valid] int32
    n_items: int
    max_degree: int


def build_sampler_state(train_data, n_items) -> SamplerState:
    # per-user UNIQUE sorted items: the complement rank mapping requires
    # strictly increasing positives (a duplicated item makes P[j] - j
    # non-monotone, silently skewing negatives and never sampling some
    # items). Duplicates can reach here through external train.txt files —
    # the framework's own pipelines dedup earlier.
    rows = [
        np.unique(np.asarray(l, dtype=np.int64))
        if len(l)
        else np.zeros((0,), np.int64)
        for l in train_data
    ]
    lengths = np.fromiter((len(r) for r in rows), dtype=np.int64, count=len(rows))
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    if offsets[-1] > 0:
        items_flat = np.concatenate([r for r in rows if len(r)])
    else:
        items_flat = np.zeros((0,), dtype=np.int64)
    valid = np.nonzero(lengths > 0)[0].astype(np.int32)
    return SamplerState(
        items_flat=jnp.asarray(items_flat, dtype=jnp.int32),
        offsets=jnp.asarray(offsets, dtype=jnp.int32),
        deg=jnp.asarray(lengths, dtype=jnp.int32),
        valid_users=jnp.asarray(valid),
        n_items=int(n_items),
        max_degree=int(lengths.max(initial=1)),
    )


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
    neg_ratio copies), negatives uniform over the user's NON-positive items
    (exact complement sampling — see module docstring).
    """
    del n_tries  # kept for API compatibility; complement sampling is exact
    rng_u, rng_p, rng_n = jax.random.split(rng, 3)
    uidx = jax.random.randint(rng_u, (batch_size,), 0, state.valid_users.shape[0])
    users = state.valid_users[uidx]
    pos_slot = jax.random.randint(rng_p, (batch_size,), 0, 1 << 30) % state.deg[users]
    pos_items = state.items_flat[state.offsets[users] + pos_slot]

    # EXACT complement sampling: draw a rank r uniform over the user's
    # non-positive items and map it through the sorted positives — the item
    # x with r non-positives before it satisfies x - #{P < x} == r, found by
    # binary search over j in [0, deg] with invariant P[j] - j <= r.
    # This is the reference's unbounded rejection loop's exact distribution
    # (uniform over non-positives) with a fixed ~log2(max_deg) gather chain.
    flat_users = jnp.repeat(users, neg_ratio)  # [B * neg_ratio]
    deg = state.deg[flat_users]
    off = state.offsets[flat_users]
    n_neg_space = jnp.maximum(state.n_items - deg, 1)
    r = jax.random.randint(
        rng_n, (batch_size * neg_ratio,), 0, 1 << 30
    ) % n_neg_space
    E = state.items_flat.shape[0]
    # search range is [0, deg[u]]; fixed iteration count covers the max degree
    max_deg = 1 if E == 0 else int(np.ceil(np.log2(max(2, state.max_degree)))) + 1

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        p_mid = state.items_flat[jnp.clip(off + mid, 0, max(E - 1, 0))]
        # guard mid < hi: once converged (lo == hi), mid indexes one PAST the
        # user's slice (the next user's items) — comparing against it pushed
        # lo to deg+1, shifting every rank past the last positive by +1 and
        # emitting ids up to n_items (out of catalog)
        go_right = jnp.logical_and(p_mid - mid <= r, mid < hi)
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, max_deg, body, (jnp.zeros_like(deg), deg)
    )
    lo = jnp.minimum(lo, deg)  # belt and braces: lo in [0, deg] by invariant
    # a user holding the ENTIRE catalog has no true negative (the reference's
    # rejection loop would never terminate); the r + lo map would emit the
    # out-of-catalog id n_items — clamp into the catalog instead
    neg = jnp.minimum(r + lo, state.n_items - 1).astype(pos_items.dtype)
    neg_items = neg.reshape(batch_size, neg_ratio)
    return users, pos_items, neg_items
