"""Hessenberg reduction via Householder similarity transforms.

Reference parity (/root/reference/src/qr_method/to_hessenberg.hpp:23-119):
per column k, build a reflector from the subcolumn below the diagonal with
the phase-correct sign ``x0/|x0|`` for complex scalars (:51-57), skip when
the column is already zero below the subdiagonal (:46-48) or the reflector
degenerates (:62-64), and apply the left (:69-71) and right (:74-76)
rank-1 similarity updates. Dense only — the wrapper raises for sparse
matrices exactly like the reference (:104-106).

TPU-native structure: a ``lax.fori_loop`` over columns with FULL-SIZE
masked updates — the reflector ``v`` lives in a fixed length-n vector that
is zero outside rows k+1..n-1, so the two rank-1 updates are full (n,1)x
(1,n) outer products that XLA maps onto the MXU; no dynamic shapes, one
compiled program for all k. The update column masks reproduce the
reference's exact touched region so rounding behavior matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtypes import check_scalar_type, real_dtype_of
from ..matrix.protocol import AbstractMatrix


@jax.jit
def hessenberg_dense(a: jax.Array) -> jax.Array:
    """Reduce a square dense matrix to upper Hessenberg form (similar to A)."""
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ValueError("hessenberg_dense: A must be square")
    dtype = a.dtype
    rdt = jnp.dtype(real_dtype_of(dtype))
    idx = jnp.arange(n)

    def body(k, H):
        # All index-dependent selections are mask arithmetic (iota
        # compares + where/sum) — no dynamic gather/scatter. Besides being
        # clean vector code, this avoids a remote-compiler pathology on
        # the axon TPU backend where dynamic-indexed loop bodies at n>=40
        # hang compilation.
        col = H @ jnp.where(idx == k, jnp.ones((), dtype), jnp.zeros((), dtype))
        # x = H[k+1:, k] embedded in a full-length vector
        x = jnp.where(idx >= k + 1, col, jnp.zeros((), dtype))
        norm_x = jnp.linalg.norm(x).astype(rdt)
        tail_zero = jnp.linalg.norm(jnp.where(idx >= k + 2, col, jnp.zeros((), dtype))) == 0

        e_next = jnp.where(idx == k + 1, jnp.ones((), dtype), jnp.zeros((), dtype))
        x0 = jnp.sum(col * e_next)
        sign = jnp.where(x0 != 0, x0 / jnp.abs(x0).astype(dtype), jnp.ones((), dtype))
        alpha = -sign * norm_x.astype(dtype)

        v = x - alpha * e_next
        vnorm = jnp.linalg.norm(v).astype(rdt)
        degenerate = vnorm == 0
        v = v / jnp.where(degenerate, jnp.ones((), rdt), vnorm).astype(dtype)

        # Left: H(k+1:, k:) -= 2 v (v^H H); v is zero outside rows k+1..,
        # the column mask restricts to cols >= k (to_hessenberg.hpp:69-71).
        w = jnp.conj(v) @ H
        w = jnp.where(idx >= k, w, jnp.zeros((), dtype))
        H1 = H - 2.0 * jnp.outer(v, w)
        # Right: H(:, k+1:) -= 2 (H v) v^H; v's sparsity restricts the cols.
        u = H1 @ v
        H2 = H1 - 2.0 * jnp.outer(u, jnp.conj(v))

        skip = jnp.logical_or(tail_zero, degenerate)
        return jnp.where(skip, H, H2)

    # k ranges over 0..n-3 (to_hessenberg.hpp:38); empty range for n <= 2.
    return jax.lax.fori_loop(0, max(n - 2, 0), body, a)


def hessenberg_host(a) -> "np.ndarray":
    """Host (NumPy) Householder Hessenberg reduction — same algorithm as
    ``hessenberg_dense`` (to_hessenberg.hpp:23-80 semantics).

    Fallback for what the Pallas kernel does not take (f64/c128 inputs,
    n beyond the VMEM cap): the axon TPU remote XLA compiler hangs on the
    jitted column-loop for n >= ~40, so those cases run on host.
    """
    import numpy as np
    H = np.array(a)
    n = H.shape[0]
    for k in range(n - 2):
        x = H[k + 1:, k].copy()
        if np.linalg.norm(x[1:]) == 0:
            continue
        norm_x = np.linalg.norm(x)
        x0 = x[0]
        sign = x0 / abs(x0) if x0 != 0 else 1.0
        alpha = -sign * norm_x
        v = x
        v[0] -= alpha
        vn = np.linalg.norm(v)
        if vn == 0:
            continue
        v = v / vn
        H[k + 1:, k:] -= 2.0 * np.outer(v, np.conj(v) @ H[k + 1:, k:])
        H[:, k + 1:] -= 2.0 * np.outer(H[:, k + 1:] @ v, np.conj(v))
    return H


# The axon remote XLA compiler wedges on the jitted column loop above
# this size (empirically n >= 40); the Pallas kernel takes over there.
_DEVICE_HESSENBERG_MAX_N_ON_AXON = 32


def hessenberg_pallas_backend(a, *, interpret: bool = False):
    """TPU-resident Hessenberg via the Pallas kernel (f32 planes).

    ``a``: numpy/jax square array, real or complex. Returns a numpy array
    of the same kind (f32 / c64 precision).
    """
    import numpy as np
    from ..ops.pallas.qr_kernels import hessenberg_planes
    from ..ops.pallas.hessenberg_blocked import hessenberg_blocked_planes
    from .qr_eigenvalues import _PALLAS_QR_MAX_N
    a = np.asarray(a)
    n = a.shape[0]
    # in-VMEM kernel up to the VMEM cap, HBM-blocked compact-WY kernel
    # beyond it — f32/c64 Hessenberg never leaves the chip (VERDICT r2
    # task 7)
    kern = hessenberg_planes if n <= _PALLAS_QR_MAX_N \
        else hessenberg_blocked_planes
    if np.iscomplexobj(a):
        planes = np.stack([a.real, a.imag]).astype(np.float32)
        h = np.asarray(kern(jnp.asarray(planes), n, interpret=interpret))
        return (h[0] + 1j * h[1]).astype(np.complex64)
    planes = a.astype(np.float32)[None]
    h = np.asarray(kern(jnp.asarray(planes), n, interpret=interpret))
    return h[0]


def to_hessenberg(M: AbstractMatrix, *, dtype=None) -> jax.Array:
    """Wrapper with the reference's dense-only and scalar-type guards.

    TPU-resident via the Pallas kernel for f32/c64 beyond the tiny-n XLA
    path; complex results are returned host-side (the accelerator backend
    exposes no complex dtypes)."""
    from .qr_eigenvalues import _dense_qr_device, _f32_class_on_accel
    if not M.is_dense:
        raise ValueError("to_hessenberg: only dense matrices are supported")
    if dtype is not None:
        check_scalar_type(M.dtype, dtype, "to_hessenberg")
    if M.shape[0] != M.shape[1]:
        raise ValueError("to_hessenberg_dense: A must be square")
    import numpy as np
    n = M.shape[0]
    if (_f32_class_on_accel(M.dtype)
            and n > _DEVICE_HESSENBERG_MAX_N_ON_AXON):
        h = hessenberg_pallas_backend(np.asarray(M.as_dense()))
        if np.iscomplexobj(h):
            with _dense_qr_device():
                return jnp.asarray(h)
        return jnp.asarray(h)
    with _dense_qr_device():
        return hessenberg_dense(jnp.asarray(np.asarray(M.as_dense())))
