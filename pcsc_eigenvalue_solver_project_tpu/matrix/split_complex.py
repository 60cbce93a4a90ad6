"""Split-plane complex banded operator — complex eigenproblems ON TPU.

The TPU backend here exposes no complex dtypes (c64 multiplies raise
Unimplemented), so the reference's complex capabilities (its demo runs in
``complex<double>``, main.cpp:42) get a TPU-native representation instead
of an emulated dtype: a banded operator stored as re/im diagonal planes
``(2, k, n)`` whose vectors are ``(2, n)`` real arrays. SpMV runs through
the fused split-plane Pallas kernel (ops/pallas/dia_spmv.py), and
``solvers.power.power_method_split_complex`` runs the reference power
iteration entirely in planes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.dia_spmv import dia_matvec_planes
from .dia import SparseDIA


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplitComplexDIA:
    """Complex banded matrix as real diagonal planes (2, k, n)."""

    planes: jax.Array  # (2, k, n) real
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_complex_dia(m: SparseDIA, *, precision=np.float32) -> "SplitComplexDIA":
        data = np.asarray(m.data)
        planes = np.stack([data.real, data.imag]).astype(precision)
        return SplitComplexDIA(planes=jnp.asarray(planes), offsets=m.offsets,
                               shape=m.shape)

    @staticmethod
    def from_csr(m, *, precision=np.float32) -> "SplitComplexDIA":
        return SplitComplexDIA.from_complex_dia(SparseDIA.from_csr(m),
                                                precision=precision)

    @property
    def dtype(self):
        return np.dtype(self.planes.dtype)

    @property
    def is_dense(self) -> bool:
        return False

    @property
    def nnz(self) -> int:
        p = np.asarray(self.planes)
        return int(np.count_nonzero((p[0] != 0) | (p[1] != 0)))

    def matvec(self, x_planes, *, force=None):
        """(2, n) real planes -> (2, n) real planes."""
        return dia_matvec_planes(self.planes, self.offsets, x_planes, force=force)

    def to_complex_dense(self) -> np.ndarray:
        """Host-side dense complex materialisation (tests/oracles)."""
        p = np.asarray(self.planes)
        n = self.shape[0]
        out = np.zeros((n, n), np.complex128)
        i = np.arange(n)
        for d, off in enumerate(self.offsets):
            valid = (i + off >= 0) & (i + off < n)
            out[i[valid], i[valid] + off] = p[0, d, valid] + 1j * p[1, d, valid]
        return out
