"""Popularity baseline (reference model.py:4091-4104): score = item degree."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from inductive_recommendation_tpu.models.base import BasicModel


class Popularity(BasicModel):
    trainable = False

    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        train_array = np.asarray(dataset.train_array).reshape(-1, 2)
        degree = np.bincount(
            train_array[:, 1], minlength=self.n_items
        ).astype(np.float32)
        self.buffers = {"item_degree": jnp.asarray(degree)}

    def init_params(self, rng):
        return {}

    def make_scoring_state(self, params, buffers=None):
        return self._buf(buffers)["item_degree"]

    def score(self, state, users):
        return jnp.broadcast_to(state[None, :], (users.shape[0], self.n_items))
