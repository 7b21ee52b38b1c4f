"""Speed-of-light accounting for the hot kernels.

The north-star asks for "%SoL" style counters (BASELINE.md). For the
gather-bound SpMM the relevant roofline is HBM traffic:

    bytes >= nnz * (row_bytes(x) + idx + val) + out_bytes + x_read_once

Random 256-512B row reads do not reach sequential-stream bandwidth on any
HBM part, so two ratios are reported: vs the sequential peak (true SoL) and
vs a measured random-gather ceiling.
"""

from __future__ import annotations

import dataclasses

# v5e (v5litepod) HBM peak; override per generation as needed
DEFAULT_HBM_GBPS = 819.0
# Measured random-row-gather TRANSACTION ceiling on v5e: ~366M rows/s, flat
# in row width up to 512B (measured 2026-08: a d=128 f32 gather of 1.85M
# rows takes ~5.05 ms whether indices are random or sorted — see CLAUDE.md
# pack-2 note and benchmarks/spmm_bench.py). This is the calibrated ceiling
# for anything gather-bound; the earlier 135 GB/s byte-rate form put the
# "ceiling" BELOW the measured bucketed SpMM (113.7% SoL in r2's detail
# artifact), so the transaction-rate form replaces it. If a kernel ever
# exceeds 100% of this, re-measure the constant (benchmarks/spmm_bench.py)
# rather than shipping a >100% figure.
RANDOM_GATHER_ROWS_PER_S = 366e6


@dataclasses.dataclass
class SpmmCost:
    nnz: int
    padded_nnz: int
    d: int
    dtype_bytes: int = 4

    @property
    def gather_bytes(self) -> int:
        # gathers move lane-padded rows: min 128 lanes
        lane_d = max(self.d, 128)
        return self.padded_nnz * lane_d * self.dtype_bytes

    @property
    def useful_bytes(self) -> int:
        return self.nnz * self.d * self.dtype_bytes

    @property
    def index_bytes(self) -> int:
        return self.padded_nnz * 8  # idx + val

    def sol_seconds(self, gbps: float = DEFAULT_HBM_GBPS) -> float:
        return (self.useful_bytes + self.index_bytes) / (gbps * 1e9)

    def achievable_seconds(self, gbps: float = DEFAULT_HBM_GBPS) -> float:
        """True upper bound for the gather-bound SpMM: the slower of the
        measured random-gather transaction rate (one operand-row gather per
        padded nnz) and the streaming floor for the moved bytes."""
        transactions = self.padded_nnz / RANDOM_GATHER_ROWS_PER_S
        stream = (self.gather_bytes + self.index_bytes) / (gbps * 1e9)
        return max(transactions, stream)

    def report(self, measured_seconds: float) -> dict:
        return {
            "nnz": self.nnz,
            "padded_nnz": self.padded_nnz,
            "measured_ms": measured_seconds * 1e3,
            "sol_ms_sequential": self.sol_seconds() * 1e3,
            "sol_ms_random_gather": self.achievable_seconds() * 1e3,
            "pct_sol_sequential": 100.0 * self.sol_seconds() / measured_seconds,
            "pct_sol_random_gather": 100.0
            * self.achievable_seconds()
            / measured_seconds,
        }


def spmm_cost(mat, d: int, dtype_bytes: int = 4) -> SpmmCost:
    """Cost model for a BucketedSpMM forward."""
    padded = sum(b.idx.shape[0] * b.idx.shape[1] for b in mat.fwd.buckets)
    return SpmmCost(nnz=mat.nnz, padded_nnz=padded, d=d, dtype_bytes=dtype_bytes)


@dataclasses.dataclass
class GatherCost:
    """Random row gather (embedding lookup / SpMM operand fetch): the floor
    is max(transaction rate, stream bandwidth)."""

    n_rows: int
    d: int
    dtype_bytes: int = 4

    def sol_seconds(self, gbps: float = DEFAULT_HBM_GBPS) -> float:
        stream = self.n_rows * self.d * self.dtype_bytes / (gbps * 1e9)
        transactions = self.n_rows / RANDOM_GATHER_ROWS_PER_S
        return max(stream, transactions)

    def report(self, measured_seconds: float) -> dict:
        return {
            "n_rows": self.n_rows,
            "measured_ms": measured_seconds * 1e3,
            "sol_ms": self.sol_seconds() * 1e3,
            "pct_sol": 100.0 * self.sol_seconds() / measured_seconds,
        }


@dataclasses.dataclass
class TopkCost:
    """Exact top-k over [rows, n] scores: the floor is one HBM read of the
    score matrix (the k results are negligible writeback)."""

    rows: int
    n: int
    k: int
    dtype_bytes: int = 4

    def sol_seconds(self, gbps: float = DEFAULT_HBM_GBPS) -> float:
        read = self.rows * self.n * self.dtype_bytes
        write = self.rows * self.k * (self.dtype_bytes + 4)
        return (read + write) / (gbps * 1e9)

    def report(self, measured_seconds: float) -> dict:
        return {
            "rows": self.rows,
            "n": self.n,
            "k": self.k,
            "measured_ms": measured_seconds * 1e3,
            "sol_ms": self.sol_seconds() * 1e3,
            "pct_sol": 100.0 * self.sol_seconds() / measured_seconds,
        }


# v5e ICI: 2D torus, ~45 GB/s one-way per link per direction; override for
# other generations/topologies
DEFAULT_ICI_GBPS_PER_LINK = 45.0


@dataclasses.dataclass
class AllToAllCost:
    """All-to-all of ``bytes_per_device`` over an ``n_devices`` ring/torus
    axis (the sharded-embedding lookup/grad-scatter collective). Each device
    sends (n-1)/n of its payload; a bidirectional ring moves it in n/2 hops
    overlapped, so the wall-clock floor is bytes * (n-1)/n / (2 * link_bw)."""

    bytes_per_device: int
    n_devices: int
    links: int = 2  # bidirectional ring along one torus axis

    def sol_seconds(self, gbps: float = DEFAULT_ICI_GBPS_PER_LINK) -> float:
        if self.n_devices <= 1:
            return 0.0
        off_device = self.bytes_per_device * (self.n_devices - 1) / self.n_devices
        return off_device / (self.links * gbps * 1e9)

    def report(self, measured_seconds: float) -> dict:
        sol = self.sol_seconds()
        return {
            "bytes_per_device": self.bytes_per_device,
            "n_devices": self.n_devices,
            "measured_ms": measured_seconds * 1e3,
            "sol_ms": sol * 1e3,
            "pct_sol": (100.0 * sol / measured_seconds) if measured_seconds else 0.0,
        }
