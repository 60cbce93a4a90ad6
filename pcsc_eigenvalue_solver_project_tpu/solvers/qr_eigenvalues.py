"""QR eigenvalue iteration.

Two modes (``QROptions.mode``):

``"parity"`` — the reference algorithm exactly
(/root/reference/src/qr_method/qr_eigenvalues.hpp:40-108): Hessenberg
reduction, then unshifted sweeps ``H = Q R; H := R Q`` using the FULL
Householder QR each sweep, stopping when
``max_i |H(i, i-1)| <= tol * (1 + ||H||_F)`` (:77-93). Iteration-count
semantics preserved: ``iterations == iter+1`` at the converging sweep and
``max_iterations + 1`` on non-convergence (:69,104); n == 0 returns an
empty converged result (:55-57).

``"accelerated"`` — the TPU-first superset the survey calls for: Givens
rotations exploiting the Hessenberg structure (O(n^2) per sweep instead of
the reference's O(n^3) re-decomposition), Wilkinson shifts, and deflation
with a device-resident active-window counter. The whole solve is ONE
``lax.while_loop`` under jit — fixed shapes, dynamic inner loop bounds
shrink the per-sweep work as the window deflates, zero host round-trips.
Runs in complex arithmetic so conjugate pairs of real matrices converge
(the reference's real unshifted iteration cannot separate them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtypes import check_scalar_type, complex_dtype_of, real_dtype_of
from ..core.options import QROptions, SolverOptions
from ..core.results import QRResult
from ..matrix.protocol import AbstractMatrix
from .hessenberg import hessenberg_dense
from .qr import qr_decompose_dense


# ---------------------------------------------------------------------------
# parity mode
# ---------------------------------------------------------------------------

@jax.jit
def _qr_eigenvalues_parity(a: jax.Array, max_iterations: jax.Array,
                           tol: jax.Array) -> QRResult:
    n = a.shape[0]
    dtype = a.dtype
    rdt = jnp.dtype(real_dtype_of(dtype))

    if n == 0:
        return QRResult(eigenvalues=jnp.zeros((0,), dtype),
                        iterations=jnp.zeros((), jnp.int32),
                        converged=jnp.asarray(True))

    H0 = hessenberg_dense(a)

    def cond(c):
        H, it, converged = c
        return jnp.logical_and(it < max_iterations, jnp.logical_not(converged))

    def body(c):
        H, it, _ = c
        Q, R = qr_decompose_dense(H)
        H = R @ Q  # (qr_eigenvalues.hpp:74)
        if n > 1:
            max_subdiag = jnp.max(jnp.abs(jnp.diagonal(H, offset=-1)))
        else:
            max_subdiag = jnp.zeros((), rdt)
        thresh = tol.astype(rdt) * (1.0 + jnp.linalg.norm(H).astype(rdt))
        return (H, it + 1, max_subdiag <= thresh)

    H, it, converged = jax.lax.while_loop(cond, body, (H0, jnp.zeros((), jnp.int32),
                                                       jnp.asarray(False)))
    # reference reports iter+1: converging sweep i (0-based) -> i+1 == it;
    # non-convergence -> max_iterations + 1 (qr_eigenvalues.hpp:69,104).
    iterations = jnp.where(converged, it, it + 1)
    return QRResult(eigenvalues=jnp.diagonal(H), iterations=iterations,
                    converged=converged)


# ---------------------------------------------------------------------------
# accelerated mode: Givens sweeps + Wilkinson shift + deflation, on device
# ---------------------------------------------------------------------------

def _givens_sweep(H: jax.Array, hi: jax.Array, shift: jax.Array):
    """One shifted QR sweep on the active window H[:hi, :hi] via Givens.

    Computes ``H - shift I = Q R`` with n-1 Givens rotations (only the
    Hessenberg subdiagonal needs elimination), then ``R Q + shift I``.
    Rotations are only formed for k < hi-1 (traced loop bound), so the
    per-sweep cost shrinks as the window deflates.
    """
    n = H.shape[0]
    dtype = H.dtype
    diag_mask = jnp.arange(n) < hi
    H = H - jnp.diag(jnp.where(diag_mask, shift, jnp.zeros((), dtype)))

    g00_0 = jnp.ones((max(n - 1, 1),), dtype)
    g01_0 = jnp.zeros((max(n - 1, 1),), dtype)

    def left_body(k, carry):
        Hc, g00s, g01s = carry
        a = Hc[k, k]
        b = Hc[k + 1, k]
        r = jnp.sqrt(jnp.abs(a) ** 2 + jnp.abs(b) ** 2)
        zero = r == 0
        rs = jnp.where(zero, jnp.ones((), r.dtype), r).astype(dtype)
        g00 = jnp.where(zero, jnp.ones((), dtype), jnp.conj(a) / rs)
        g01 = jnp.where(zero, jnp.zeros((), dtype), jnp.conj(b) / rs)
        row_k = Hc[k, :]
        row_k1 = Hc[k + 1, :]
        Hc = Hc.at[k, :].set(g00 * row_k + g01 * row_k1)
        Hc = Hc.at[k + 1, :].set(-jnp.conj(g01) * row_k + jnp.conj(g00) * row_k1)
        return Hc, g00s.at[k].set(g00), g01s.at[k].set(g01)

    H, g00s, g01s = jax.lax.fori_loop(0, hi - 1, left_body, (H, g00_0, g01_0))

    def right_body(k, Hc):
        ck = Hc[:, k]
        ck1 = Hc[:, k + 1]
        Hc = Hc.at[:, k].set(jnp.conj(g00s[k]) * ck + jnp.conj(g01s[k]) * ck1)
        Hc = Hc.at[:, k + 1].set(-g01s[k] * ck + g00s[k] * ck1)
        return Hc

    H = jax.lax.fori_loop(0, hi - 1, right_body, H)
    return H + jnp.diag(jnp.where(diag_mask, shift, jnp.zeros((), dtype)))


def _wilkinson_shift(H: jax.Array, hi: jax.Array) -> jax.Array:
    """Eigenvalue of the trailing active 2x2 closest to its bottom entry."""
    a = H[hi - 2, hi - 2]
    b = H[hi - 2, hi - 1]
    c = H[hi - 1, hi - 2]
    d = H[hi - 1, hi - 1]
    delta = (a - d) / 2.0
    sq = jnp.sqrt(delta * delta + b * c)  # complex sqrt
    mu_plus = d + delta + sq
    mu_minus = d + delta - sq
    return jnp.where(jnp.abs(mu_plus - d) < jnp.abs(mu_minus - d), mu_plus, mu_minus)


@jax.jit
def _qr_eigenvalues_accel(a: jax.Array, max_sweeps: jax.Array,
                          tol: jax.Array) -> QRResult:
    n = a.shape[0]
    dtype = a.dtype  # complex by construction
    rdt = jnp.dtype(real_dtype_of(dtype))

    if n == 0:
        return QRResult(eigenvalues=jnp.zeros((0,), dtype),
                        iterations=jnp.zeros((), jnp.int32),
                        converged=jnp.asarray(True))
    if n == 1:
        return QRResult(eigenvalues=jnp.diagonal(a),
                        iterations=jnp.zeros((), jnp.int32),
                        converged=jnp.asarray(True))

    H0 = hessenberg_dense(a)
    tol = tol.astype(rdt)

    def deflate(state):
        H, hi = state

        def d_cond(hh):
            hi_ = hh
            sub = jnp.abs(H[hi_ - 1, hi_ - 2])
            scale = jnp.abs(H[hi_ - 2, hi_ - 2]) + jnp.abs(H[hi_ - 1, hi_ - 1])
            small = sub <= tol * jnp.maximum(scale, jnp.ones((), rdt))
            return jnp.logical_and(hi_ > 1, small)

        return jax.lax.while_loop(d_cond, lambda hh: hh - 1, hi)

    def cond(c):
        H, hi, sweeps = c
        return jnp.logical_and(hi > 1, sweeps < max_sweeps)

    def body(c):
        H, hi, sweeps = c
        shift = _wilkinson_shift(H, hi)
        H = _givens_sweep(H, hi, shift)
        hi = deflate((H, hi))
        return H, hi, sweeps + 1

    hi0 = deflate((H0, jnp.asarray(n, jnp.int32)))
    H, hi, sweeps = jax.lax.while_loop(
        cond, body, (H0, hi0, jnp.zeros((), jnp.int32)))
    return QRResult(eigenvalues=jnp.diagonal(H), iterations=sweeps,
                    converged=hi <= 1)


# ---------------------------------------------------------------------------
# public wrapper
# ---------------------------------------------------------------------------

def qr_eigenvalues(M: AbstractMatrix, opts: SolverOptions = QROptions(), *,
                   dtype=None) -> QRResult:
    """All eigenvalues of a dense square matrix via QR iteration.

    Dense-only like the reference (qr_eigenvalues.hpp:131-133); ``dtype``
    asserts the stored scalar type (TypeError on mismatch, :135-138).
    """
    if not M.is_dense:
        raise ValueError("qr_eigenvalues: only dense matrices are supported")
    if dtype is not None:
        check_scalar_type(M.dtype, dtype, "qr_eigenvalues")
    if M.shape[0] != M.shape[1]:
        raise ValueError("qr_eigenvalues_dense: A must be square")

    mode = opts.mode if isinstance(opts, QROptions) else "parity"
    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    max_it = jnp.asarray(opts.max_iterations, jnp.int32)
    a = M.as_dense()
    if mode == "parity":
        return _qr_eigenvalues_parity(a, max_it, jnp.asarray(opts.tolerance, ftype))
    # accelerated: complex arithmetic so real matrices with conjugate
    # eigenvalue pairs converge.
    dtol = opts.deflation_tolerance if isinstance(opts, QROptions) and \
        opts.deflation_tolerance is not None else opts.tolerance
    a = a.astype(jnp.dtype(complex_dtype_of(a.dtype)))
    return _qr_eigenvalues_accel(a, max_it, jnp.asarray(dtol, ftype))
