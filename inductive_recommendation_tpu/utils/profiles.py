"""Dense user-profile rows built on device from padded interaction lists."""

from __future__ import annotations

import jax.numpy as jnp


def dense_profiles(padded_items: jnp.ndarray, users: jnp.ndarray, n_items: int):
    """[B, n_items] multi-hot profiles for a user batch.

    ``padded_items`` is [n_users, L] padded with the sentinel ``n_items``;
    the scatter writes through an extra column that is then dropped, so
    padding is harmless (same trick as the evaluator's -inf masking).
    """
    rows = padded_items[users]  # [B, L]
    B = rows.shape[0]
    out = jnp.zeros((B, n_items + 1), dtype=jnp.float32)
    out = out.at[jnp.arange(B)[:, None], rows].set(1.0)
    return out[:, :n_items]
