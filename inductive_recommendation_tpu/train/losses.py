"""Loss functions.

- BPR: softplus(neg - pos) (trainer.py:278, 422)
- BCE: softplus(-logit) on positives / softplus(logit) on negatives
  (trainer.py:592-599)
- InfoNCE: unpaired-negatives contrastive loss matching the
  ``info-nce-pytorch`` package the reference imports (model.py:14,
  InfoNCE(negative_mode='unpaired'), temperature 0.1): all embeddings are
  L2-normalized, logits = [q.p, q.N^T] / t, cross-entropy at label 0
- multinomial log-likelihood for MultiVAE (trainer.py:630-634)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softplus(x):
    return jax.nn.softplus(x)


def bpr_loss(users_r, pos_r, neg_r):
    """Mean softplus(neg_score - pos_score)."""
    pos_scores = jnp.sum(users_r * pos_r, axis=1)
    neg_scores = jnp.sum(users_r * neg_r, axis=1)
    return jnp.mean(softplus(neg_scores - pos_scores))


def _l2n(x, eps=1e-12):
    # clamp under the sqrt: grad of ||x|| at x=0 is NaN, and all-zero rows
    # occur legitimately (e.g. users isolated by an edge-drop view)
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def info_nce(query, positive_key, negative_keys, temperature: float = 0.1):
    """Per-sample InfoNCE with unpaired negatives (info-nce-pytorch
    semantics: normalize, positive logit sum(q*p), negatives q @ N^T,
    cross-entropy with the positive at index 0). Returns [B] losses; the
    trainers take .mean() as the reference does (trainer.py:289)."""
    q = _l2n(query)
    p = _l2n(positive_key)
    n = _l2n(negative_keys)
    pos_logit = jnp.sum(q * p, axis=-1, keepdims=True)  # [B, 1]
    neg_logits = q @ n.T  # [B, M]
    logits = jnp.concatenate([pos_logit, neg_logits], axis=1) / temperature
    return -jax.nn.log_softmax(logits, axis=1)[:, 0]


def bce_losses(pos_logits, neg_logits):
    """Concatenated softplus BCE terms (trainer.py:592-599)."""
    return jnp.concatenate([softplus(-pos_logits), softplus(neg_logits)], axis=0)


def multinomial_ll_loss(scores, profiles):
    """-sum(profile * log_softmax(scores)) averaged over users
    (trainer.py:630-634)."""
    log_probs = jax.nn.log_softmax(scores, axis=1)
    return -jnp.sum(profiles * log_probs, axis=1).mean()
