"""Experimental Pallas ELL SpMM kernel (forward).

Status, measured honestly: on the current Mosaic toolchain a *generic* HBM
row-gather is not expressible in-kernel (tpu.dynamic_gather only supports
take_along_axis-shaped index patterns, and its lowering shuffles within a
single vreg — "Multiple source vregs along gather dimension" is rejected, so
a VMEM-resident table can be at most 8 f32 sublanes tall; verified on this
toolchain 2026-08, which rules out any VMEM-resident gather-table SpMM
design), so this kernel fetches neighbor rows with per-row async DMAs — functionally correct (verified in interpreter
mode; a minimal one-level DMA-gather variant compiles and runs on v5e) but
inherently orders of magnitude below XLA's hardware gather, and the nested
per-slot DMA loop exceeds the remote Mosaic compiler's budget at real
sizes. The production SpMM is the bucketed gather path in
``ops/bucketed_spmm.py``, which measures 80.6% of the calibrated
random-gather TRANSACTION ceiling on v5e (the one SoL constant,
``ops/sol.py::RANDOM_GATHER_ROWS_PER_S``; the remaining gap is the bucket
layout's padded slots — BENCH_DETAIL_r04, benchmarks/spmm_bench.py). (A fused Pallas attention tile
kernel was also built and TPU-verified, then REMOVED after measuring 1.54x
slower than the jnp composition at Gowalla scale — evidence trail in the
ops/attention_spmm.py docstring; do not rebuild without a different layout
idea.) This module exists for the ``impl='pallas'`` escape hatch and as
the scaffold for a future Mosaic with vector gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inductive_recommendation_tpu.graph.sparse import SparseELL


def _kernel(idx_ref, val_ref, x_hbm, out_ref, rows_scratch, sem):
    # idx_ref lives in SMEM (scalar loads drive DMA addresses); val_ref in
    # VMEM is only ever read as whole rows (vector loads)
    T, K = idx_ref.shape

    def row_body(r, _):
        def slot_body(s, _):
            col = idx_ref[r, s]
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(col, 1), :], rows_scratch.at[pl.ds(s, 1), :], sem
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, K, slot_body, 0)
        out_ref[r, :] = jnp.sum(val_ref[r, :][:, None] * rows_scratch[:], axis=0)
        return 0

    jax.lax.fori_loop(0, T, row_body, 0)


def spmm_ell_pallas(adj: SparseELL, x: jnp.ndarray, tile_rows: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """out[r] = sum_k val[r,k] * x[idx[r,k]] — Pallas DMA-gather kernel."""
    n_rows, k = adj.idx.shape
    d = x.shape[1]
    pad = (-n_rows) % tile_rows
    idx = jnp.pad(adj.idx, ((0, pad), (0, 0)))
    val = jnp.pad(adj.val, ((0, pad), (0, 0)))
    grid = (idx.shape[0] // tile_rows,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_rows, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((k, d), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, val, x)
    return out[:n_rows]
