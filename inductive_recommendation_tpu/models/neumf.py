"""NeuMF (reference model.py:4411-4467): GMF + MLP towers with the
'gmf' -> 'mlp' -> 'neumf' pretrain-architecture switch (driven by
BCETrainer's 3-phase schedule, trainer.py:575-586)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.models.base import (
    BasicModel,
    kaiming_uniform_init,
    init_linear,
)


class NeuMF(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.embedding_size = model_config["embedding_size"]
        self.layer_sizes = list(model_config["layer_sizes"])
        self.arch = "gmf"

    def checkpoint_aux(self):
        # the pretrain phase is model state: a full-state resume past a phase
        # boundary must land in the saved arch, not restart as 'gmf' (the
        # BCETrainer switches fire only on exact boundary epochs)
        return {"arch": self.arch}

    def restore_aux(self, aux):
        if aux and "arch" in aux:
            self.arch = str(aux["arch"])

    def init_params(self, rng):
        keys = jax.random.split(rng, 5 + len(self.layer_sizes))
        half = self.layer_sizes[0] // 2
        n_u = self._align_rows(self.n_users)  # mesh-divisible (rows > n never indexed)
        n_i = self._align_rows(self.n_items)
        params = {
            "mf_user_embedding": kaiming_uniform_init(
                keys[0], (n_u, self.embedding_size)
            ),
            "mf_item_embedding": kaiming_uniform_init(
                keys[1], (n_i, self.embedding_size)
            ),
            "mlp_user_embedding": kaiming_uniform_init(keys[2], (n_u, half)),
            "mlp_item_embedding": kaiming_uniform_init(keys[3], (n_i, half)),
            "mlp_layers": [
                init_linear(keys[5 + i], self.layer_sizes[i], self.layer_sizes[i + 1])
                for i in range(len(self.layer_sizes) - 1)
            ],
            # ones-initialized fusion layer, no bias (model.py:4439)
            "output_w": jnp.ones(
                (self.layer_sizes[-1] + self.embedding_size,), jnp.float32
            ),
        }
        return params

    def init_mlp_layers(self, params, rng):
        """Re-randomize MLP weights + reset fusion to ones (model.py:4435-4439;
        called when entering the 'neumf' phase, trainer.py:586)."""
        keys = jax.random.split(rng, len(self.layer_sizes))
        new = dict(params)
        new["mlp_layers"] = [
            init_linear(keys[i], self.layer_sizes[i], self.layer_sizes[i + 1])
            for i in range(len(self.layer_sizes) - 1)
        ]
        new["output_w"] = jnp.ones_like(params["output_w"])
        return new

    def trace_signature(self):
        # score()/bce_forward read self.arch at TRACE time; the evaluator's
        # jit cache must not reuse a previous phase's trace (BCETrainer's
        # gmf -> mlp -> neumf schedule, trainer.py:575-588)
        return self.arch

    def bce_forward(self, params, users, items, arch=None):
        """-> (logits, l2_norm_sq) per model.py:4441-4460."""
        arch = arch or self.arch
        mf_vec = params["mf_user_embedding"][users] * params["mf_item_embedding"][items]
        mlp_vec = jnp.concatenate(
            [params["mlp_user_embedding"][users], params["mlp_item_embedding"][items]],
            axis=1,
        )
        for layer in params["mlp_layers"]:
            mlp_vec = jax.nn.leaky_relu(
                mlp_vec @ layer["w"] + layer["b"], negative_slope=0.01
            )
        if arch == "gmf":
            vec = jnp.concatenate([mf_vec, jnp.zeros_like(mlp_vec)], axis=1)
        elif arch == "mlp":
            vec = jnp.concatenate([jnp.zeros_like(mf_vec), mlp_vec], axis=1)
        else:
            vec = jnp.concatenate([mf_vec, mlp_vec], axis=1)
        scored = vec * params["output_w"][None, :]
        l2 = jnp.sum(scored**2, axis=1)
        return jnp.sum(scored, axis=1), l2

    def make_scoring_state(self, params, buffers=None):
        return params

    def score(self, state, users, item_block: int = 8192):
        """All-items scoring via item blocks (the reference flattens the full
        B x n_items grid at once, model.py:4462-4466; blocking bounds memory)."""
        params = state
        arch = self.arch
        n_items = self.n_items
        n_blocks = -(-n_items // item_block)
        pad = n_blocks * item_block - n_items
        item_ids = jnp.arange(n_items + pad) % n_items
        blocks = item_ids.reshape(n_blocks, item_block)
        B = users.shape[0]

        def score_block(items_b):
            u = jnp.repeat(users, item_block)
            it = jnp.tile(items_b, B)
            logits, _ = self.bce_forward(params, u, it, arch=arch)
            return logits.reshape(B, item_block)

        out = jax.lax.map(score_block, blocks)  # [n_blocks, B, item_block]
        out = jnp.moveaxis(out, 0, 1).reshape(B, n_blocks * item_block)
        return out[:, :n_items]
