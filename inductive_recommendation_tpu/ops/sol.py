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
# measured ceiling for random row gathers at 512B rows on v5e (see
# benchmarks/spmm_bench.py measurements; d=128 f32 reaches ~135 GB/s)
RANDOM_GATHER_GBPS = 135.0


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

    def achievable_seconds(self, gbps: float = RANDOM_GATHER_GBPS) -> float:
        return (self.gather_bytes + self.index_bytes) / (gbps * 1e9)

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
