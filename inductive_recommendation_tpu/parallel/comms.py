"""Collective-communication accounting for the sharded paths.

Real multi-host hardware is unavailable in this environment (SURVEY §2.7's
>=0.8 scaling-efficiency target is a hardware measurement), so the scaling
story is made checkable the way it CAN be checked: count every collective a
jitted step issues and the bytes it moves, straight from the traced jaxpr
(toolchain-independent — the SPMD partitioner cannot add collectives the
program didn't ask for through these primitives), and assert the designed
communication complexity. The ICI-bound step-time model built on these
counts is published in BASELINE.md.

Ring-model bytes per device per collective (the standard cost model —
"How to Scale Your Model" ch. sharding):

- ``psum_scatter`` (reduce-scatter): (S-1)/S x input bytes
- ``all_gather``:                    (S-1)/S x output bytes
- ``psum`` (all-reduce):           2 (S-1)/S x input bytes
- ``all_to_all``:                    (S-1)/S x input bytes
- ``ppermute``:                      1.0     x input bytes
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

# jaxpr primitive names (lax.psum_scatter traces as 'reduce_scatter')
COLLECTIVES = ("psum", "reduce_scatter", "all_gather", "all_to_all", "ppermute")

# ring-model per-device traffic factor as a function of (S, in_b, out_b)
_RING_FACTORS = {
    "reduce_scatter": lambda S, i, o: (S - 1) / S * i,
    "all_gather": lambda S, i, o: (S - 1) / S * o,
    "psum": lambda S, i, o: 2.0 * (S - 1) / S * i,
    "all_to_all": lambda S, i, o: (S - 1) / S * i,
    "ppermute": lambda S, i, o: float(i),
}


@dataclasses.dataclass
class CollectiveStats:
    """Per-primitive call records over one traced program (per-device
    shapes). ``calls[prim]`` holds one (axis_size, in_bytes, out_bytes)
    per call site; the aggregate dicts derive from it."""

    calls: dict  # prim -> list[(S, in_bytes, out_bytes)]

    @property
    def counts(self) -> dict:
        return {p: len(c) for p, c in self.calls.items()}

    @property
    def in_bytes(self) -> dict:
        return {p: sum(i for _, i, _ in c) for p, c in self.calls.items()}

    @property
    def out_bytes(self) -> dict:
        return {p: sum(o for _, _, o in c) for p, c in self.calls.items()}

    @property
    def axis_sizes(self) -> dict:
        return {p: [s for s, _, _ in c] for p, c in self.calls.items()}

    def total_count(self) -> int:
        return sum(len(c) for c in self.calls.values())

    def ici_bytes_per_device(self) -> float:
        """Ring-model bytes each device moves over ICI per execution —
        costed PER CALL with that call's own collective-axis size (one
        program may mix axes, e.g. 'model' reduce-scatters + a 'data'
        gradient psum)."""
        total = 0.0
        for prim, calls in self.calls.items():
            for S, i, o in calls:
                total += _RING_FACTORS[prim](S, i, o)
        return total

    def predicted_step_seconds(
        self, compute_seconds_s1: float, n_shards: int, ici_gbps: float = 45.0
    ) -> float:
        """ICI-bound model: perfectly-split compute + ring collective time.
        ``ici_gbps``: per-link unidirectional bandwidth (v5e: ~45 GB/s)."""
        comm = self.ici_bytes_per_device() / (ici_gbps * 1e9)
        return compute_seconds_s1 / n_shards + comm


def _nbytes(avals) -> int:
    total = 0
    for a in avals:
        if hasattr(a, "shape") and hasattr(a, "dtype"):
            total += int(np.prod(a.shape, dtype=np.int64)) * a.dtype.itemsize
    return total


def _walk(jaxpr, stats, axis_env):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in stats.calls:
            in_b = _nbytes([v.aval for v in eqn.invars if hasattr(v, "aval")])
            out_b = _nbytes([v.aval for v in eqn.outvars])
            axes = eqn.params.get("axes", eqn.params.get("axis_name", ()))
            if not isinstance(axes, (tuple, list)):
                axes = (axes,)
            size = 1
            for ax in axes:
                size *= axis_env.get(ax, 1)
            stats.calls[name].append((size, in_b, out_b))
        # recurse into every sub-jaxpr (shard_map bodies, custom_vjp calls,
        # scan/cond branches, ...)
        sub_env = dict(axis_env)
        mesh = eqn.params.get("mesh")
        if mesh is not None and hasattr(mesh, "shape"):
            sub_env.update(dict(mesh.shape))
        for v in eqn.params.values():
            for sub in _sub_jaxprs(v):
                _walk(sub, stats, sub_env)


def _sub_jaxprs(v):
    if hasattr(v, "eqns"):  # a raw Jaxpr
        yield v
    elif hasattr(v, "jaxpr") and hasattr(getattr(v, "jaxpr"), "eqns"):  # Closed
        yield v.jaxpr
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _sub_jaxprs(x)


def collective_stats(fn, *args, **kwargs) -> CollectiveStats:
    """Trace ``fn`` and account every collective primitive it issues.

    Shapes inside shard_map bodies are PER-DEVICE, so the byte totals are
    per-device traffic operands."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    stats = CollectiveStats(calls={p: [] for p in COLLECTIVES})
    _walk(jaxpr.jaxpr, stats, {})
    return stats
