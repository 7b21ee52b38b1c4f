"""Tracing / timing utilities.

The reference's observability is wall-clock prints around epochs
(trainer.py:70-90); here:

- ``trace(logdir)``: a jax.profiler trace context (open the result in
  TensorBoard or Perfetto) for kernel-level timelines;
- ``StepTimer``: wall-clock step statistics with forced device sync — on
  tunneled remote backends ``block_until_ready`` alone does not synchronize,
  so the timer fetches a scalar;
- ``nan_check``: pytree NaN/Inf audit for debugging diverging runs
  (jit-free, use outside the hot loop).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            jnp.asarray(sync_value).block_until_ready()
            float(jnp.sum(jnp.asarray(sync_value)))
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self):
        return 1e3 * float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50_ms(self):
        return 1e3 * float(np.median(self.times)) if self.times else float("nan")


def nan_check(tree, name="tree"):
    """Return a list of paths with non-finite values (empty = clean)."""
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad
