"""Householder QR decomposition.

Reference parity (/root/reference/src/qr_method/qr_decompose.hpp:25-132):
``A = Q R`` for any m x n dense matrix via Householder reflectors with the
complex phase-correct sign, skip rules for already-eliminated columns, and
accumulation of the full m x m unitary Q. Empty input raises (:38-40); the
wrapper is dense-only (:110-112) and returns ``(Q, R)``.

Same TPU-native structure as the Hessenberg reduction: ``lax.fori_loop``
over columns with full-size masked reflectors so every update is an MXU
outer product at fixed shape. ``jnp.linalg.qr`` (XLA's blocked QR) is used
by the accelerated eigenvalue path; this routine exists for exact
reference-behavior parity and for the (Q, R) public API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtypes import check_scalar_type, real_dtype_of
from ..matrix.protocol import AbstractMatrix


@jax.jit
def qr_decompose_dense(a: jax.Array):
    """Householder QR of an m x n dense matrix; returns (Q, R)."""
    m, n = a.shape
    if m == 0 or n == 0:
        raise ValueError("qr_decompose_dense: empty matrix")
    dtype = a.dtype
    rdt = jnp.dtype(real_dtype_of(dtype))
    row_idx = jnp.arange(m)
    col_idx = jnp.arange(n)
    kmax = min(m, n)

    def body(k, carry):
        Q, R = carry
        col = R[:, k]
        x = jnp.where(row_idx >= k, col, jnp.zeros((), dtype))
        norm_x = jnp.linalg.norm(x).astype(rdt)
        tail_zero = jnp.linalg.norm(jnp.where(row_idx >= k + 1, col, jnp.zeros((), dtype))) == 0

        x0 = col[k]
        sign = jnp.where(x0 != 0, x0 / jnp.abs(x0).astype(dtype), jnp.ones((), dtype))
        alpha = -sign * norm_x.astype(dtype)

        v = x.at[k].add(-alpha)
        vnorm = jnp.linalg.norm(v).astype(rdt)
        degenerate = vnorm == 0
        v = v / jnp.where(degenerate, jnp.ones((), rdt), vnorm).astype(dtype)

        # R(k:, k:) -= 2 v (v^H R)  (qr_decompose.hpp:77-79)
        w = jnp.conj(v) @ R
        w = jnp.where(col_idx >= k, w, jnp.zeros((), dtype))
        R1 = R - 2.0 * jnp.outer(v, w)
        # Q(:, k:) -= 2 (Q v) v^H  (qr_decompose.hpp:82-84)
        u = Q @ v
        Q1 = Q - 2.0 * jnp.outer(u, jnp.conj(v))

        skip = jnp.logical_or(tail_zero, degenerate)
        return (jnp.where(skip, Q, Q1), jnp.where(skip, R, R1))

    Q0 = jnp.eye(m, dtype=dtype)
    Q, R = jax.lax.fori_loop(0, kmax, body, (Q0, a))
    return Q, R


def qr_decompose(M: AbstractMatrix, *, dtype=None):
    """Wrapper with the reference's dense-only and scalar-type guards.

    TPU-resident for square f32/c64 inputs via the Pallas kernel
    (ops/pallas/qr_kernels.py); rectangular, f64/c128, and CPU runs keep
    the XLA column loop."""
    from .qr_eigenvalues import _dense_qr_device, _use_pallas_qr
    if not M.is_dense:
        raise ValueError("qr_decompose: only dense matrices are supported")
    if dtype is not None:
        check_scalar_type(M.dtype, dtype, "qr_decompose")
    import numpy as np
    a = np.asarray(M.as_dense())
    m, n = a.shape
    if (jax.default_backend() != "cpu" and m == n and m > 0
            and _use_pallas_qr(m, M.dtype)):
        from ..ops.pallas.qr_kernels import qr_decompose_planes
        if np.iscomplexobj(a):
            planes = np.stack([a.real, a.imag]).astype(np.float32)
            R, Q = qr_decompose_planes(jnp.asarray(planes), m)
            R, Q = np.asarray(R), np.asarray(Q)
            with _dense_qr_device():
                return (jnp.asarray((Q[0] + 1j * Q[1]).astype(np.complex64)),
                        jnp.asarray((R[0] + 1j * R[1]).astype(np.complex64)))
        R, Q = qr_decompose_planes(jnp.asarray(a.astype(np.float32)[None]), m)
        return Q[0], R[0]
    with _dense_qr_device():
        return qr_decompose_dense(jnp.asarray(a))
