"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax initializes its backends (conftest imports precede test
modules, so env vars set here take effect).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# this image's sitecustomize force-registers the axon TPU plugin and
# overrides JAX_PLATFORMS; the config update below wins as long as no
# backend has been initialized yet (conftest runs first).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly marked slow is the fast per-commit gate:
    `pytest -m fast` (< 2 min) == `pytest -m "not slow"`."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_graph(rng):
    """A small random bipartite interaction set."""
    n_users, n_items = 40, 60
    n_edges = 300
    users = rng.integers(0, n_users, n_edges)
    items = rng.integers(0, n_items, n_edges)
    train_array = np.unique(np.stack([users, items], axis=1), axis=0)
    return train_array, n_users, n_items
