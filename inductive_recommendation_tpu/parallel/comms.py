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
    """Per-primitive totals over one traced program (per-device shapes)."""

    counts: dict  # prim -> number of calls
    in_bytes: dict  # prim -> total input bytes (per device)
    out_bytes: dict  # prim -> total output bytes (per device)
    axis_sizes: dict  # prim -> list of collective axis sizes

    def total_count(self) -> int:
        return sum(self.counts.values())

    def ici_bytes_per_device(self) -> float:
        """Ring-model bytes each device moves over ICI per execution."""
        total = 0.0
        for prim, n in self.counts.items():
            if n == 0:
                continue
            sizes = self.axis_sizes[prim]
            S = max(sizes) if sizes else 1
            total += _RING_FACTORS[prim](S, self.in_bytes[prim], self.out_bytes[prim])
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
        if name in stats.counts:
            stats.counts[name] += 1
            stats.in_bytes[name] += _nbytes(
                [v.aval for v in eqn.invars if hasattr(v, "aval")]
            )
            stats.out_bytes[name] += _nbytes([v.aval for v in eqn.outvars])
            axes = eqn.params.get("axes", eqn.params.get("axis_name", ()))
            if not isinstance(axes, (tuple, list)):
                axes = (axes,)
            size = 1
            for ax in axes:
                size *= axis_env.get(ax, 1)
            stats.axis_sizes[name].append(size)
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
    stats = CollectiveStats(
        counts={p: 0 for p in COLLECTIVES},
        in_bytes={p: 0 for p in COLLECTIVES},
        out_bytes={p: 0 for p in COLLECTIVES},
        axis_sizes={p: [] for p in COLLECTIVES},
    )
    _walk(jaxpr.jaxpr, stats, {})
    return stats
