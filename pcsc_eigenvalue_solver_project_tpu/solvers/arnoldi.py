"""Arnoldi iteration — top-k eigenvalues of large (sparse) operators.

The reference's QR solver is dense-only O(n^3) (qr_eigenvalues.hpp:40-108)
and its power method finds one eigenvalue; nothing in it can spectrum-solve
a large sparse operator. This is the TPU-native superset capability the
BASELINE 1M-row "distributed power iteration + QR" config calls for: build
an m-dimensional Krylov basis with the (possibly distributed) SpMV as the
only O(n) operation, project to an m x m Hessenberg matrix on device, and
run the accelerated shifted-QR solver (qr_eigenvalues.py) on that small
projection. Everything — modified Gram-Schmidt, the Hessenberg assembly,
and the small QR solve — stays inside one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import check_scalar_type, complex_dtype_of, real_dtype_of
from ..core.options import SolverOptions
from ..core.results import QRResult
from ..matrix.protocol import AbstractMatrix, require_nonempty, require_square
from ..utils.prng import default_key, random_unit_vector
from .qr_eigenvalues import _qr_eigenvalues_accel


def arnoldi_decomposition(matvec, x0: jax.Array, m: int, *, vdot=jnp.vdot,
                          norm=jnp.linalg.norm):
    """Krylov factorisation ``A V_m = V_{m+1} H`` via modified Gram-Schmidt.

    Returns ``(V, H, breakdown_at)`` with V (m+1, n), H (m+1, m);
    ``breakdown_at`` is the step index where the subspace became invariant
    (m if none). Fixed shapes; masked updates after breakdown.
    """
    dtype = x0.dtype
    rdt = jnp.dtype(real_dtype_of(dtype))

    # vector axes may be multi-dimensional (e.g. the interleaved (R, 128)
    # layout); the basis leads with the Krylov index
    V0 = jnp.zeros((m + 1,) + x0.shape, dtype).at[0].set(
        x0 / norm(x0).astype(dtype))
    H0 = jnp.zeros((m + 1, m), dtype)

    def outer(j, carry):
        V, H, brk = carry
        w = matvec(V[j])

        def mgs(i, wc):
            w_, hcol = wc
            active = i <= j
            hij = jnp.where(active, vdot(V[i], w_), jnp.zeros((), dtype))
            w_ = w_ - hij * V[i]
            return (w_, hcol.at[i].set(hij))

        w, hcol = jax.lax.fori_loop(0, m, mgs, (w, jnp.zeros((m + 1,), dtype)))
        hjj = norm(w).astype(rdt)
        breakdown = hjj == 0
        safe = jnp.where(breakdown, jnp.ones((), rdt), hjj).astype(dtype)
        hcol = hcol.at[j + 1].set(hjj.astype(dtype))

        still = jnp.logical_not(brk < j + 1)  # no earlier breakdown
        V = jnp.where(jnp.logical_and(still, jnp.logical_not(breakdown)),
                      V.at[j + 1].set(w / safe), V)
        H = jnp.where(still, H.at[:, j].set(hcol), H)
        brk = jnp.where(jnp.logical_and(still, breakdown),
                        jnp.minimum(brk, j + 1), brk)
        return (V, H, brk)

    V, H, brk = jax.lax.fori_loop(0, m, outer,
                                  (V0, H0, jnp.asarray(m + 1, jnp.int32)))
    return V, H, jnp.minimum(brk, m)


@partial(jax.jit, static_argnames=("m",))
def _arnoldi_basis(M: AbstractMatrix, x0: jax.Array, m: int):
    return arnoldi_decomposition(M.matvec, x0, m)


def _arnoldi_eigs(M: AbstractMatrix, x0: jax.Array, m: int, k: int,
                  qr_tol: jax.Array, qr_max: jax.Array):
    # basis build on the accelerator (SpMV-dominated); the small m x m
    # projection solve on whichever device runs dense QR (see
    # qr_eigenvalues._dense_qr_device — CPU on the axon backend)
    from .qr_eigenvalues import _dense_qr_device
    V, H, brk = _arnoldi_basis(M, x0, m)
    with _dense_qr_device():
        Hm = jnp.asarray(np.asarray(H[:m, :m])).astype(
            jnp.dtype(complex_dtype_of(H.dtype)))
        qr = _qr_eigenvalues_accel(Hm, qr_max, qr_tol)
        order = jnp.argsort(-jnp.abs(qr.eigenvalues))
        ritz = qr.eigenvalues[order][:k]
    return ritz, qr.converged, qr.iterations, V, H


def arnoldi_eigenvalues(M: AbstractMatrix, k: int = 6, *, m: int | None = None,
                        opts: SolverOptions = SolverOptions(), dtype=None,
                        key=None, x0=None) -> QRResult:
    """Top-``k`` eigenvalues (by magnitude) via an m-step Arnoldi projection.

    ``m`` defaults to ``min(max(2k + 10, 20), n)``. Returns a ``QRResult``
    whose ``eigenvalues`` are the k dominant Ritz values (complex dtype),
    ``iterations`` the QR sweeps spent on the projection, and ``converged``
    the small-solve convergence flag.
    """
    if dtype is not None:
        check_scalar_type(M.dtype, dtype, "arnoldi_eigenvalues")
    require_square(M, "arnoldi_eigenvalues")
    require_nonempty(M, "arnoldi_eigenvalues")
    n = M.shape[0]
    if k < 1:
        raise ValueError("arnoldi_eigenvalues: k must be >= 1")
    if m is None:
        m = min(max(2 * k + 10, 20), n)
    m = min(m, n)
    if k > m:
        raise ValueError(f"arnoldi_eigenvalues: k ({k}) must be <= m ({m})")
    if x0 is None:
        x0 = random_unit_vector(key if key is not None else default_key(), n, M.dtype)
    else:
        x0 = jnp.asarray(x0, M.dtype)

    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ritz, converged, iterations, _, _ = _arnoldi_eigs(
        M, x0, m, k, jnp.asarray(opts.tolerance, ftype),
        jnp.asarray(opts.max_iterations, jnp.int32))
    return QRResult(eigenvalues=ritz, iterations=iterations, converged=converged)
