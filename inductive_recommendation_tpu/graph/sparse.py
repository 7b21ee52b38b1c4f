"""Static-shape sparse matrix containers for TPU.

XLA traces every jitted program once with fixed shapes, so the containers here
are *padded*: an edge list always has a compile-time-constant length, and
padding entries carry ``val == 0`` so they contribute nothing to any SpMM.
This is the TPU-native replacement for the reference's dynamically-sized
``torch.sparse.FloatTensor`` + DGL graphs (reference: utils.py:33-39,
model.py:100-110) and is what makes per-epoch graph regeneration (DOSE/SGL
families) recompile-free: new edges are written into the same-shaped buffers.

Two layouts:

- ``SparseCOO``: row/col/val triplets sorted by row. Feeds the
  gather + segment-sum SpMM (``ops/spmm.py``) — XLA's best path for
  power-law graphs whose per-tile density is far too low for MXU tiles.
- ``SparseELL``: degree-bucket-padded per-row neighbor lists. Feeds the
  Pallas row-blocked SpMM kernel and the jnp take/einsum variant.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row", "col", "val"],
    meta_fields=["n_rows", "n_cols"],
)
@dataclasses.dataclass(frozen=True)
class SparseCOO:
    """Padded COO sparse matrix; rows sorted ascending, padding has val=0.

    Padding entries use ``row = col = 0`` so gathers stay in-bounds; their
    zero value makes them no-ops in sums.
    """

    row: jnp.ndarray  # [nnz_pad] int32
    col: jnp.ndarray  # [nnz_pad] int32
    val: jnp.ndarray  # [nnz_pad] float32 (0.0 on padding)
    n_rows: int
    n_cols: int

    @property
    def nnz_pad(self) -> int:
        return self.row.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def transpose(self) -> "SparseCOO":
        order = jnp.argsort(self.col, stable=True)
        return SparseCOO(
            row=self.col[order],
            col=self.row[order],
            val=self.val[order],
            n_rows=self.n_cols,
            n_cols=self.n_rows,
        )

    def to_dense(self) -> jnp.ndarray:
        dense = jnp.zeros((self.n_rows, self.n_cols), dtype=self.val.dtype)
        return dense.at[self.row, self.col].add(self.val)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["idx", "val"],
    meta_fields=["n_cols"],
)
@dataclasses.dataclass(frozen=True)
class SparseELL:
    """Row-padded (ELLPACK) sparse matrix: fixed max-degree per row.

    ``idx[i, k]`` is the column of row i's k-th nonzero (0 where padded) and
    ``val[i, k]`` its value (0.0 where padded).
    """

    idx: jnp.ndarray  # [n_rows, k_max] int32
    val: jnp.ndarray  # [n_rows, k_max] float32
    n_cols: int

    @property
    def n_rows(self) -> int:
        return self.idx.shape[0]

    @property
    def k_max(self) -> int:
        return self.idx.shape[1]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


def coo_from_edges(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape,
    nnz_pad: int | None = None,
    coalesce: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: sort edges by (row, col), optionally sum duplicates, pad.

    Returns numpy (row, col, val) of length ``nnz_pad`` (defaults to nnz).
    Counterpart of the reference's ``.coalesce()`` (utils.py:38).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    n_rows, n_cols = shape
    keys = rows * n_cols + cols
    order = np.argsort(keys, kind="stable")
    rows, cols, vals, keys = rows[order], cols[order], vals[order], keys[order]
    if coalesce and len(keys):
        uniq, inverse = np.unique(keys, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(summed, inverse, vals)
        rows = (uniq // n_cols).astype(np.int64)
        cols = (uniq % n_cols).astype(np.int64)
        vals = summed.astype(np.float32)
    nnz = len(rows)
    if nnz_pad is None:
        nnz_pad = nnz
    if nnz > nnz_pad:
        raise ValueError(f"nnz {nnz} exceeds padding budget {nnz_pad}")
    out_row = np.zeros(nnz_pad, dtype=np.int32)
    out_col = np.zeros(nnz_pad, dtype=np.int32)
    out_val = np.zeros(nnz_pad, dtype=np.float32)
    out_row[:nnz] = rows
    out_col[:nnz] = cols
    out_val[:nnz] = vals
    # keep the buffer globally sorted by row: padding rows are 0, so move
    # padding to the front slot-stable by re-sorting (cheap, host-side)
    order = np.argsort(out_row, kind="stable")
    return out_row[order], out_col[order], out_val[order]


def coo_to_device(
    row: np.ndarray, col: np.ndarray, val: np.ndarray, shape
) -> SparseCOO:
    return SparseCOO(
        row=jnp.asarray(row, dtype=jnp.int32),
        col=jnp.asarray(col, dtype=jnp.int32),
        val=jnp.asarray(val, dtype=jnp.float32),
        n_rows=int(shape[0]),
        n_cols=int(shape[1]),
    )


def ell_from_coo(
    row: np.ndarray,
    col: np.ndarray,
    val: np.ndarray,
    shape,
    k_max: int | None = None,
    lane_pad: int = 8,
) -> SparseELL:
    """Host-side COO → ELL conversion (rows padded to k_max, multiple of
    ``lane_pad`` for TPU-friendly tiling)."""
    n_rows, n_cols = shape
    row = np.asarray(row)
    col = np.asarray(col)
    val = np.asarray(val, dtype=np.float32)
    nz = val != 0.0
    row, col, val = row[nz], col[nz], val[nz]
    counts = np.bincount(row, minlength=n_rows)
    max_deg = int(counts.max()) if len(counts) else 0
    if k_max is None:
        k_max = max_deg
    k_max = max(lane_pad, -(-max(k_max, 1) // lane_pad) * lane_pad)
    if max_deg > k_max:
        raise ValueError(f"max degree {max_deg} exceeds k_max {k_max}")
    order = np.argsort(row, kind="stable")
    row, col, val = row[order], col[order], val[order]
    slot = np.arange(len(row)) - np.concatenate([[0], np.cumsum(counts)[:-1]])[row]
    idx = np.zeros((n_rows, k_max), dtype=np.int32)
    ell_val = np.zeros((n_rows, k_max), dtype=np.float32)
    idx[row, slot] = col
    ell_val[row, slot] = val
    return SparseELL(
        idx=jnp.asarray(idx), val=jnp.asarray(ell_val), n_cols=int(n_cols)
    )
