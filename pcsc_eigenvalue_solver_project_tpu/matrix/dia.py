"""DIA (diagonal) sparse format — the TPU-native layout for banded operators.

The reference's Eigen CSC storage (matrix.hpp:39-44) makes SpMV a
gather-per-entry; on TPU gathers through HBM are the bottleneck (measured
~0.1-0.9 Gnnz/s via XLA gather). For banded matrices — the realistic
large-sparse regime and the one the distributed halo exchange targets —
storing the diagonals densely turns SpMV into pure shifted
multiply-accumulates: zero gathers, unit-stride reads, one pass over the
data. The Pallas kernel in ``ops/pallas/dia_spmv.py`` fuses the whole band
into a single VPU pass (XLA alone leaves ~100 unfused shift/mul/add
kernels inside solver loops).

Convention (row-indexed): ``data[d, i] = A[i, i + offsets[d]]`` with zeros
where the index leaves the matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import canonical_dtype
from .protocol import AbstractMatrix
from .sparse import SparseCSR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseDIA(AbstractMatrix):
    """Banded matrix stored by diagonals. ``offsets`` is static."""

    data: jax.Array  # (k, n) — data[d, i] = A[i, i + offsets[d]]
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_csr(m: SparseCSR) -> "SparseDIA":
        """Host-side conversion; any (row, col) populates its diagonal."""
        n, nc = m.shape
        if n != nc:
            raise ValueError("SparseDIA.from_csr: matrix must be square")
        rows = np.asarray(m.rows)
        cols = np.asarray(m.indices)
        vals = np.asarray(m.data)
        diffs = cols.astype(np.int64) - rows.astype(np.int64)
        offs = np.unique(diffs)
        data = np.zeros((len(offs), n), dtype=m.dtype)
        d_ids = np.searchsorted(offs, diffs)
        data[d_ids, rows] = vals
        return SparseDIA(data=jnp.asarray(data),
                         offsets=tuple(int(o) for o in offs), shape=(n, n))

    @staticmethod
    def from_diagonals(diagonals, offsets, n, dtype=None) -> "SparseDIA":
        """Build from per-diagonal arrays (row-indexed, length n each)."""
        if dtype is not None:
            dtype = canonical_dtype(dtype)
        data = np.zeros((len(offsets), n), dtype=dtype)
        for d, diag in enumerate(diagonals):
            data[d] = np.asarray(diag, dtype=dtype)
            off = offsets[d]
            if off > 0:
                data[d, n - off:] = 0
            elif off < 0:
                data[d, :-off] = 0
        return SparseDIA(data=jnp.asarray(data), offsets=tuple(int(o) for o in offsets),
                         shape=(n, n))

    # --- queries ---
    @property
    def dtype(self):
        return np.dtype(self.data.dtype)

    @property
    def is_dense(self) -> bool:
        return False

    @property
    def bandwidth(self) -> int:
        return max(abs(o) for o in self.offsets) if self.offsets else 0

    @property
    def nnz(self) -> int:
        return int(np.count_nonzero(np.asarray(self.data)))

    # --- compute ---
    def matvec(self, x):
        from ..ops.pallas.dia_spmv import dia_matvec
        return dia_matvec(self.data, self.offsets, x)

    def matvec_xla(self, x):
        """Reference jnp path (used for parity tests and as fallback)."""
        n = self.shape[0]
        y = jnp.zeros_like(x)
        for d, off in enumerate(self.offsets):
            if off >= 0:
                seg = jnp.pad(x[off:], (0, off))
            else:
                seg = jnp.pad(x[:off], (-off, 0))
            y = y + self.data[d] * seg
        return y

    def rmatvec(self, x):
        # A^H: diagonal at offset o becomes offset -o, shifted by o
        n = self.shape[0]
        y = jnp.zeros_like(x)
        for d, off in enumerate(self.offsets):
            c = jnp.conj(self.data[d]) * x
            if off >= 0:
                seg = jnp.pad(c[: n - off], (off, 0)) if off else c
            else:
                seg = jnp.pad(c[-off:], (0, -off))
            y = y + seg
        return y

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros((self.shape[0],), self.dtype)

    def to_dense(self):
        n = self.shape[0]
        out = jnp.zeros((n, n), self.dtype)
        i = jnp.arange(n)
        for d, off in enumerate(self.offsets):
            valid = (i + off >= 0) & (i + off < n)
            out = out.at[i, jnp.clip(i + off, 0, n - 1)].add(
                jnp.where(valid, self.data[d], 0))
        return out

    def as_csr(self):
        raise TypeError("SparseDIA: stored matrix is not sparse CSR (convert explicitly)")
