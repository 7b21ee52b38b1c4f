"""Functional model protocol.

Models are *static* objects (graph buffers, hyperparameters) with pure
methods over parameter pytrees:

    model = SomeModel(config, dataset)
    params = model.init_params(jax.random.key(0))
    u_r, p_r, n_r, l2 = model.bpr_forward(params, users, pos, neg,
                                          rng=step_rng, training=True)
    state = model.make_scoring_state(params)   # e.g. the full propagated rep
    scores = model.score(state, users)         # [B, n_items]

This replaces the reference's nn.Module classes (model.py:35-53) with
init/apply-style functions that compose directly into jitted train steps.
Graph buffers captured in closures are jit constants; parameters flow as
pytree arguments so optimizers and checkpointing see only trainables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class BasicModel:
    """Base: name/shape bookkeeping + default scoring (model.py:35-53).

    ``self.buffers`` holds the model's static device arrays (adjacency,
    feature matrices, ...). Methods accept them as an explicit argument so
    trainers/evaluators can pass them INTO jitted functions — large buffers
    must be jit *arguments*, not closure constants (closure constants get
    baked into the compiled payload, which both bloats executables and
    breaks remote-compile size limits). ``buffers=None`` falls back to
    ``self.buffers`` for convenience in eager/small contexts.
    """

    trainable = True

    def __init__(self, model_config, dataset):
        self.config = dict(model_config)
        self.name = model_config["name"]
        self.dataset = dataset
        self.n_users = dataset.n_users
        self.n_items = dataset.n_items
        self.buffers = {}
        # row-shardable tables round up to a multiple of this (mesh 'model'
        # axis size); padding rows are never indexed, so they only cost
        # memory and keep NamedSharding's divisibility requirement satisfied
        self.table_align = int(model_config.get("table_align", 1))

    def _align_rows(self, n: int) -> int:
        a = max(self.table_align, 1)
        return -(-n // a) * a

    def trace_signature(self):
        """Hashable snapshot of any mutable python state the model's traced
        functions read (jit-cache key component). Models whose forward
        depends on a python attribute (e.g. NeuMF's ``arch`` phase) MUST
        override this — otherwise a cached trace keeps the old behavior."""
        return None

    def _buf(self, buffers):
        return self.buffers if buffers is None else buffers

    # -- parameters ----------------------------------------------------------
    def init_params(self, rng):
        raise NotImplementedError

    # -- representations -----------------------------------------------------
    def get_rep(self, params, rng=None, training=False, buffers=None):
        """Full [(n_users + n_items), d] representation matrix."""
        raise NotImplementedError

    # -- training forward ----------------------------------------------------
    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        """-> (users_r, pos_r, neg_r, l2_norm_sq[, extras...])."""
        raise NotImplementedError

    # -- scoring (evaluation path) ------------------------------------------
    def make_scoring_state(self, params, buffers=None):
        """Computed once per eval; default: the full representation.
        Must be jit-safe with (params, buffers) as arguments."""
        return self.get_rep(params, training=False, buffers=buffers)

    def score(self, state, users):
        """[B, n_items] scores; default dot product against item reps
        (model.py:122-127)."""
        rep = state
        users_r = rep[users]
        items_r = rep[self.n_users :]
        return users_r @ items_r.T

    # -- checkpoint payload --------------------------------------------------
    def checkpoint_aux(self):
        """Extra non-parameter state to persist (IGCN family overrides:
        user_map/item_map/alpha, model.py:4208-4220)."""
        return {}

    def restore_aux(self, aux):
        pass


def l2_sq_rows(*tensors):
    """Per-sample sum of squared L2 norms, the reference's reg payload
    (model.py:69-70 et al.)."""
    total = 0.0
    for t in tensors:
        total = total + jnp.sum(t * t, axis=-1)
    return total


def normal_init(rng, shape, std=0.1):
    return jax.random.normal(rng, shape, dtype=jnp.float32) * std


def kaiming_uniform_init(rng, shape):
    """torch.nn.init.kaiming_uniform_ with default a=sqrt(5)-free semantics:
    U(-bound, bound), bound = sqrt(6 / fan_in) (gain=sqrt(2), as used for
    embeddings/linear weights at model.py:28-32)."""
    fan_in = shape[-1] if len(shape) == 1 else shape[1] if len(shape) == 2 else shape[-1]
    bound = jnp.sqrt(6.0 / fan_in)
    return jax.random.uniform(rng, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def init_linear(rng, in_features, out_features):
    """Linear layer params matching init_one_layer (model.py:28-32):
    kaiming-uniform weight, zero bias. Stored as (w [in, out], b [out]) so
    application is x @ w + b."""
    w = kaiming_uniform_init(rng, (out_features, in_features)).T
    return {"w": w, "b": jnp.zeros((out_features,), dtype=jnp.float32)}


def apply_linear(p, x):
    return x @ p["w"] + p["b"]
