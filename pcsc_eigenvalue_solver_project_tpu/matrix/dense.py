"""Dense matrix type.

Replaces the dense arm of ``EigSol::Matrix`` (``Matrix::Dense<Scalar>`` =
``Eigen::Matrix<S, Dynamic, Dynamic>``; /root/reference/src/matrix/
matrix.hpp:39-44,70-76). Construction paths mirror the reference:

- from any 2-D array (matrix.hpp:70-76),
- from a flat row-major sequence plus (rows, cols) with a size-mismatch
  ``ValueError`` (matrix.hpp:109-116, throw at 213-215).

JAX arrays are immutable, which supersedes the reference's deliberate
non-copyability (matrix.hpp:47-59) — there is nothing to protect against.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import canonical_dtype
from ..ops.matvec import dense_matvec, dense_rmatvec
from .protocol import AbstractMatrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseMatrix(AbstractMatrix):
    """A dense matrix backed by a single 2-D jnp array."""

    array: jax.Array

    def __post_init__(self):
        if hasattr(self.array, "ndim") and self.array.ndim != 2:
            raise ValueError(f"DenseMatrix: expected a 2-D array, got ndim={self.array.ndim}")

    # --- constructors ---
    @staticmethod
    def from_array(a, dtype=None) -> "DenseMatrix":
        if dtype is not None:
            dtype = canonical_dtype(dtype)
        probe = np.dtype(dtype) if dtype is not None else \
            np.asarray(a).dtype if not hasattr(a, "dtype") else np.dtype(a.dtype)
        # An f64 probe only yields an actual f64 array when x64 is on;
        # with x64 off jnp.asarray downcasts to f32, which the accelerator
        # takes fine — pinning it to CPU would silently move all dense
        # compute off-chip for the common default-numpy-array case.
        f64_real = (probe.kind == "f" and probe.itemsize == 8
                    and jax.config.jax_enable_x64)
        if probe.kind == "c" or f64_real:
            # complex and f64 arrays live on the CPU device when the
            # accelerator backend supports neither (axon: complex ops raise
            # Unimplemented, f64 ops hang); TPU compute paths use split
            # re/im planes and f32 instead
            from ..core.dtypes import complex_safe_device
            with complex_safe_device():
                arr = jnp.asarray(np.asarray(a), dtype=dtype)
        else:
            arr = jnp.asarray(a, dtype=dtype)
        if arr.ndim != 2:
            raise ValueError(f"DenseMatrix: expected a 2-D array, got ndim={arr.ndim}")
        canonical_dtype(arr.dtype)
        return DenseMatrix(arr)

    @staticmethod
    def from_flat(values, rows: int, cols: int, dtype=None) -> "DenseMatrix":
        """Row-major flat construction; size mismatch raises (matrix.hpp:213-215)."""
        vals = np.asarray(values, dtype=dtype)
        if vals.size != rows * cols:
            raise ValueError(
                f"DenseMatrix: data size ({vals.size}) does not match "
                f"rows*cols ({rows}*{cols}={rows * cols})")
        return DenseMatrix.from_array(vals.reshape(rows, cols), dtype=dtype)

    # --- queries ---
    @property
    def shape(self):
        return tuple(self.array.shape)

    @property
    def dtype(self):
        return np.dtype(self.array.dtype)

    @property
    def is_dense(self) -> bool:
        return True

    # --- compute ---
    def matvec(self, x):
        return dense_matvec(self.array, x)

    def rmatvec(self, x):
        return dense_rmatvec(self.array, x)

    def diagonal(self):
        return jnp.diagonal(self.array)

    def to_dense(self):
        return self.array

    # --- checked access ---
    def as_dense(self):
        return self.array
