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


def multinomial_ll_loss(scores, profiles, valid=None):
    """-sum(profile * log_softmax(scores)) averaged over users
    (trainer.py:630-634). ``valid``: optional [B] 0/1 weights for padded
    batch rows (mean over valid rows only)."""
    log_probs = jax.nn.log_softmax(scores, axis=1)
    ml = -jnp.sum(profiles * log_probs, axis=1)
    if valid is None:
        return ml.mean()
    return jnp.sum(ml * valid) / jnp.maximum(valid.sum(), 1.0)


def aux_bpr_w(emb, w, a_users, a_pos, a_neg, user_dim):
    """IGCN-family auxiliary BPR on raw core embedding rows scored with the
    per-dim weight vector ``w`` (trainer.py:542-549) — the one
    implementation shared by the IGCN/DOSE trainers and the sharded steps."""
    au = emb[a_users]
    ap = emb[user_dim + a_pos]
    an = emb[user_dim + a_neg]
    pos_s = jnp.sum(au * ap * w[None, :], axis=1)
    neg_s = jnp.sum(au * an * w[None, :], axis=1)
    return jnp.mean(softplus(neg_s - pos_s))
