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


# ---------------------------------------------------------------------------
# Compiled-HLO byte audit
#
# The traced-jaxpr accounting above sees only the collectives the program
# ASKED for; the SPMD partitioner adds more (batch-gradient all-reduces,
# replication reductions it implements its own way) and may merge or split
# them. The audit below reads the POST-PARTITIONING compiled module text, so
# every byte the program will actually put on the wire is counted — this is
# what grounds the BASELINE.md hybrid-efficiency table's bytes term
# (benchmarks/comms_model.py) and is asserted in tests/test_comms_model.py.
# ---------------------------------------------------------------------------

import re as _re

_HLO_COLLECTIVE = _re.compile(
    r"= ((?:\([^)]*\))|\S+) "
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\("
)
_HLO_SHAPE = _re.compile(r"(f64|f32|bf16|f16|s64|s32|s16|s8|u64|u32|u16|u8|pred)\[([\d,]*)\]")
_HLO_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

# ring-model per-device wire bytes from the instruction's RESULT bytes
# (all-gather result is the gathered operand; reduce-scatter's operand is
# g x its result; all-reduce is in-place; a permute sends its block once)
_HLO_RING = {
    "all-gather": lambda g, r: (g - 1) / g * r,
    "reduce-scatter": lambda g, r: float((g - 1) * r),
    "all-reduce": lambda g, r: 2.0 * (g - 1) / g * r,
    "all-to-all": lambda g, r: (g - 1) / g * r,
    "collective-permute": lambda g, r: float(r),
}


@dataclasses.dataclass
class HloCollective:
    kind: str  # all-reduce | all-gather | reduce-scatter | collective-permute
    axis: str  # 'model' | 'data' | 'free' | 'mixed'
    group_size: int
    result_bytes: int
    wire_bytes: float  # ring-model per-device bytes on the wire
    shapes: list  # one (dims tuple, bytes) per result shape (tuples split)


def _hlo_result_shapes(rtype: str):
    out = []
    for dt, dims in _HLO_SHAPE.findall(rtype):
        shape = tuple(int(x) for x in dims.split(",") if x)
        size = 1
        for x in shape:
            size *= x
        out.append((shape, size * _HLO_DTYPE_BYTES[dt]))
    return out


def _hlo_group_ids(line: str):
    """First replica group of the instruction, handling both the literal
    ``replica_groups={{0,1},{2,3}}`` and the iota
    ``replica_groups=[4,2]<=[2,4]T(1,0)`` syntaxes."""
    m = _re.search(r"replica_groups=\{\{(.*?)\}\}", line)
    if m:
        return [int(x) for x in m.group(1).split("},{")[0].split(",")]
    m = _re.search(
        r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?", line
    )
    if m:
        n_groups, g_size = int(m.group(1)), int(m.group(2))
        dims = [int(x) for x in m.group(3).split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group(4):
            ids = ids.transpose([int(x) for x in m.group(4).split(",")])
        return ids.reshape(n_groups, g_size)[0].tolist()
    m = _re.search(r"source_target_pairs=\{\{(.*?)\}\}", line)
    if m:  # collective-permute: classify by its first source/target pair
        return [int(x) for x in m.group(1).split("},{")[0].split(",")]
    return None


def _classify_axis(ids, n_model: int):
    """On a (data, model) mesh laid out id = data_idx * n_model + model_idx:
    a group whose members share the data index runs over 'model' and vice
    versa; singleton groups are free."""
    if not ids or len(ids) == 1:
        return "free"
    if len({i // n_model for i in ids}) == 1:
        return "model"
    if len({i % n_model for i in ids}) == 1:
        return "data"
    return "mixed"


def compiled_collective_report(hlo_text: str, n_model: int):
    """Every collective instruction in a compiled (SPMD-partitioned) module
    -> :class:`HloCollective` records with ring-model per-device wire bytes.

    ``n_model``: the mesh's model-axis size (mesh built by ``make_mesh``,
    device id = data_idx * n_model + model_idx)."""
    out = []
    for line in hlo_text.splitlines():
        m = _HLO_COLLECTIVE.search(line)
        if not m:
            continue
        rtype, kind = m.groups()
        ids = _hlo_group_ids(line)
        g = len(ids) if ids else 1
        axis = _classify_axis(ids, n_model)
        shapes = _hlo_result_shapes(rtype)
        rbytes = sum(b for _, b in shapes)
        out.append(
            HloCollective(
                kind=kind,
                axis=axis,
                group_size=g,
                result_bytes=rbytes,
                wire_bytes=_HLO_RING[kind](max(g, 1), rbytes) if g > 1 else 0.0,
                shapes=shapes,
            )
        )
    return out


def wire_summary(report):
    """Aggregate a :func:`compiled_collective_report` into
    {(kind, axis): (count, result_bytes, wire_bytes)}."""
    agg = {}
    for r in report:
        c, rb, wb = agg.get((r.kind, r.axis), (0, 0, 0.0))
        agg[(r.kind, r.axis)] = (c + 1, rb + r.result_bytes, wb + r.wire_bytes)
    return agg
