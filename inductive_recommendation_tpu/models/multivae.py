"""MultiVAE (reference model.py:4348-4408): variational autoencoder over
L2-normalized user interaction profiles.

Profiles are built on device from padded interaction lists; the reference's
sparse-tensor edge dropout (model.py:4382 via NGCF.dropout_sp_mat) is plain
dropout on the dense profile rows — dropping a zero is a no-op, so the two
are distributionally identical.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.data.dataset import device_padded_from_lists
from inductive_recommendation_tpu.models.base import (
    BasicModel,
    apply_linear,
    init_linear,
)
from inductive_recommendation_tpu.utils.profiles import dense_profiles


class MultiVAE(BasicModel):
    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.dropout = model_config["dropout"]
        layer_sizes = list(model_config["layer_sizes"])
        self.e_layer_sizes = [self.n_items] + layer_sizes
        self.d_layer_sizes = self.e_layer_sizes[::-1]
        self.mid_size = self.e_layer_sizes[-1]
        self.e_layer_sizes[-1] = self.mid_size * 2  # mean ++ log_var

        # built ON DEVICE from O(E) components — never upload an
        # O(n_users * max_degree) padded matrix over the ~MB/s H2D path
        deg = np.fromiter(
            (len(l) for l in dataset.train_data),
            dtype=np.int64,
            count=len(dataset.train_data),
        )
        self.buffers = {
            "train_padded": device_padded_from_lists(
                dataset.train_data, self.n_items
            ),
            "inv_norm": jnp.asarray(
                (1.0 / np.sqrt(np.maximum(deg, 1))).astype(np.float32)
            ),
        }

    def init_params(self, rng):
        n_e = len(self.e_layer_sizes) - 1
        n_d = len(self.d_layer_sizes) - 1
        keys = jax.random.split(rng, n_e + n_d)
        return {
            "encoder": [
                init_linear(keys[i], self.e_layer_sizes[i], self.e_layer_sizes[i + 1])
                for i in range(n_e)
            ],
            "decoder": [
                init_linear(
                    keys[n_e + i], self.d_layer_sizes[i], self.d_layer_sizes[i + 1]
                )
                for i in range(n_d)
            ],
        }

    def _profiles(self, buffers, users, normalized=True):
        p = dense_profiles(buffers["train_padded"], users, self.n_items)
        if normalized:
            p = p * buffers["inv_norm"][users][:, None]
        return p

    def ml_forward(self, params, users, rng=None, training=False, buffers=None):
        """-> (scores, kl, l2_norm_sq) per model.py:4377-4401."""
        b = self._buf(buffers)
        h = self._profiles(b, users, normalized=True)
        if training and rng is not None and self.dropout > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.uniform(sub, h.shape) >= self.dropout
            h = jnp.where(keep, h / (1.0 - self.dropout), 0.0)

        l2 = jnp.zeros((1,), jnp.float32)
        h = apply_linear(params["encoder"][0], h)
        l2 = l2 + jnp.sum(params["encoder"][0]["w"] ** 2)
        for layer in params["encoder"][1:]:
            h = apply_linear(layer, jnp.tanh(h))
            l2 = l2 + jnp.sum(layer["w"] ** 2)

        mean = h[:, : self.mid_size]
        log_var = h[:, -self.mid_size :]
        std = jnp.exp(0.5 * log_var)
        # NOTE: this is the REFERENCE's exact KL payload (model.py:4392) —
        # 2*KL(N(mu,sigma)||N(0,1)) + D, i.e. it omits the textbook 0.5
        # factor and the -1 term; reproduced for config/loss parity
        kl = jnp.sum(-log_var + jnp.exp(log_var) + mean**2, axis=1)
        if training and rng is not None:
            eps = jax.random.normal(rng, mean.shape)
        else:
            eps = jnp.zeros_like(mean)
        h = mean + (1.0 if training else 0.0) * eps * std

        for layer in params["decoder"][:-1]:
            h = jnp.tanh(apply_linear(layer, h))
            l2 = l2 + jnp.sum(layer["w"] ** 2)
        scores = apply_linear(params["decoder"][-1], h)
        l2 = l2 + jnp.sum(params["decoder"][-1]["w"] ** 2)
        return scores, kl, l2

    def make_scoring_state(self, params, buffers=None):
        return (params, self._buf(buffers))

    def score(self, state, users):
        params, buffers = state
        scores, _, _ = self.ml_forward(params, users, training=False, buffers=buffers)
        return scores
