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


# ---------------------------------------------------------------------------
# Krylov-Schur restarting (nonsymmetric thick restart)
# ---------------------------------------------------------------------------

def arnoldi_extend(matvec, W_init: jax.Array, l: int, m: int, *,
                   norm=jnp.linalg.norm, project=None):
    """Extend a Krylov-Schur basis: rows ``0..l`` of ``W_init``
    ((m+1, *vec_shape)) hold the retained (contracted) basis plus the
    residual vector at row ``l``; steps ``l..m-1`` run the Arnoldi
    recurrence with a FULL classical-Gram-Schmidt pass (which also
    removes the restart coupling at the seam, so the generalized
    Hessenberg needs no special-casing). Returns ``(W, H, brk)`` with
    ``H`` (m+1, m): columns ``j >= l`` are the projection coefficients,
    ``H[j+1, j]`` the new subdiagonal norm. Nonsymmetric analogue of
    ``lanczos.lanczos_extend`` (VERDICT r3 task 7)."""
    from .lanczos import _default_project
    if project is None:
        project = _default_project
    dtype = W_init.dtype
    rdt = jnp.dtype(real_dtype_of(dtype))
    H0 = jnp.zeros((m + 1, m), dtype)

    def outer(j, carry):
        W, H, brk = carry
        w = matvec(W[j])
        c = project(W, w)                      # (m+1,) coefficients
        w = w - jnp.tensordot(c, W, axes=[[0], [0]])
        b = norm(w).astype(rdt)
        scale = jnp.maximum(jnp.max(jnp.abs(c)).astype(rdt),
                            jnp.asarray(1e-30, rdt))
        breakdown = b <= 100 * jnp.finfo(rdt).eps * scale
        safe = jnp.where(breakdown, jnp.ones((), rdt), b).astype(dtype)
        hcol = c.at[j + 1].set(b.astype(dtype))

        still = jnp.logical_not(brk < j + 1)
        W = jnp.where(jnp.logical_and(still, jnp.logical_not(breakdown)),
                      W.at[j + 1].set(w / safe), W)
        H = jnp.where(still, H.at[:, j].set(hcol), H)
        brk = jnp.where(jnp.logical_and(still, breakdown),
                        jnp.minimum(brk, j + 1), brk)
        return (W, H, brk)

    W, H, brk = jax.lax.fori_loop(
        l, m, outer, (W_init, H0, jnp.asarray(m + 1, jnp.int32)))
    return W, H, jnp.minimum(brk, m)


@partial(jax.jit, static_argnames=("l", "m"))
def _arnoldi_extend_basis(M: AbstractMatrix, W_init: jax.Array, l: int,
                          m: int):
    return arnoldi_extend(M.matvec, W_init, l, m)


def _ks_contract(Hm: np.ndarray, beta: float, k: int, l_target: int,
                 tol: float):
    """Host-side Krylov-Schur restart math on the small projected matrix.

    Returns ``(wanted, resid, converged, Q_l, S_new, b_new)``:
    the k wanted Ritz values (largest magnitude), their residual
    estimates ``|beta * s_last|``, the convergence flag, and — when not
    converged — the ordered-Schur contraction: orthonormal ``Q_l``
    (steps, l_eff) with the wanted invariant subspace leading,
    ``S_new = Q^H Hm Q`` (quasi-)triangular, and the transformed
    residual coupling row ``b_new = beta * Q[last, :]``. Real input
    keeps everything real (conjugate pairs stay paired in the real
    Schur form), so the device basis contraction stays f32."""
    import scipy.linalg as sla
    steps = Hm.shape[0]
    w, X = np.linalg.eig(Hm)
    order = np.argsort(-np.abs(w))
    sel_k = order[:k]
    resid = np.abs(beta * X[-1, sel_k])
    converged = bool(np.all(resid <= tol * (1.0 + np.abs(w[sel_k])))
                     or beta == 0.0)
    if converged:
        return w[sel_k], resid, True, None, None, None
    l_target = min(l_target, steps - 1)
    thr = np.sort(np.abs(w))[::-1][min(l_target, steps) - 1]
    is_real = not np.iscomplexobj(Hm)
    if is_real:
        T, Z, sdim = sla.schur(
            Hm, output="real",
            sort=lambda re, im: np.hypot(re, im) >= thr * (1 - 1e-12))
    else:
        T, Z, sdim = sla.schur(
            Hm, output="complex",
            sort=lambda lam: np.abs(lam) >= thr * (1 - 1e-12))
    l_eff = int(min(max(sdim, 1), steps - 1))
    if is_real and T[l_eff, l_eff - 1] != 0.0:
        # The clamp landed inside a real-Schur 2x2 conjugate block (ties
        # in |lambda| can make scipy select sdim == steps).  Cutting
        # there would discard the coupling T[l_eff, l_eff-1] and corrupt
        # the Krylov relation A V_l = V_l S + v b^T, so move the cut to
        # a block boundary: retreat one column, or — when the block is
        # the leading 2x2 (l_eff == 1) — grow to include it (2 <=
        # steps - 1 because steps >= k + 2 >= 3).
        l_eff = l_eff - 1 if l_eff >= 2 else l_eff + 1
    Q_l = Z[:, :l_eff]
    S_new = T[:l_eff, :l_eff]
    b_new = beta * Z[steps - 1, :l_eff]
    return w[sel_k], resid, False, Q_l, S_new, b_new


def krylov_schur_eigenvalues(M: AbstractMatrix, k: int = 6, *,
                             m: int | None = None, restarts: int = 60,
                             opts: SolverOptions = SolverOptions(),
                             dtype=None, key=None, x0=None) -> QRResult:
    """Top-``k`` eigenvalues (largest magnitude) of a general operator by
    Krylov-Schur restarted Arnoldi — the nonsymmetric analogue of
    ``lanczos_thick_restart`` (ARPACK-class behavior on clustered
    spectra where a single fixed-m projection stagnates).

    Each cycle: extend the basis to ``m`` (device, one jit; the SpMV is
    the only O(n) op), compute the ordered Schur form of the small
    projected matrix on host, contract to the leading wanted invariant
    subspace, and restart. ``iterations`` reports total matvecs.
    Generalizes the spectrum problem of the reference's sparse power
    iteration (/root/reference/src/power_method/power_method.hpp:69).
    """
    if dtype is not None:
        check_scalar_type(M.dtype, dtype, "krylov_schur_eigenvalues")
    require_square(M, "krylov_schur_eigenvalues")
    require_nonempty(M, "krylov_schur_eigenvalues")
    n = M.shape[0]
    if k < 1:
        raise ValueError("krylov_schur_eigenvalues: k must be >= 1")
    if restarts < 1:
        raise ValueError("krylov_schur_eigenvalues: restarts must be >= 1")
    if m is None:
        m = min(max(3 * k + 10, 20), n)
    m = min(m, n)
    if k + 2 > m:
        raise ValueError(f"krylov_schur_eigenvalues: m ({m}) too small "
                         f"for k ({k}); need m >= k + 2")
    l_target = min(2 * k, m - 2)
    if x0 is None:
        x0 = random_unit_vector(key if key is not None else default_key(),
                                n, M.dtype)
    else:
        x0 = jnp.asarray(x0, M.dtype)

    tol = float(opts.tolerance)
    V, H, brk = _arnoldi_basis(M, x0, m)
    steps = min(int(np.asarray(brk)), m)
    total_mv = steps
    Hnp = np.asarray(H)
    Hm = Hnp[:steps, :steps]
    beta = float(np.abs(Hnp[steps, steps - 1])) if steps == m else 0.0

    wanted = resid = None
    for _ in range(restarts):
        wanted, resid, conv, Q_l, S_new, b_new = _ks_contract(
            Hm, beta, k, l_target, tol)
        if conv:
            return QRResult(eigenvalues=jnp.asarray(wanted),
                            iterations=jnp.asarray(total_mv, jnp.int32),
                            converged=jnp.asarray(True))
        l_eff = Q_l.shape[1]
        Qd = jnp.asarray(np.ascontiguousarray(Q_l), V.dtype)
        Y = jnp.tensordot(Qd, V[:steps], axes=[[0], [0]])
        W0 = jnp.zeros((m + 1,) + V.shape[1:], V.dtype)
        W0 = W0.at[:l_eff].set(Y).at[l_eff].set(V[steps])
        V, H2, brk2 = _arnoldi_extend_basis(M, W0, l_eff, m)
        steps2 = min(int(np.asarray(brk2)), m)
        total_mv += max(steps2 - l_eff, 0)
        H2np = np.asarray(H2)
        cdt = S_new.dtype
        Hm = np.zeros((steps2, steps2), cdt)
        Hm[:, l_eff:] = H2np[:steps2, l_eff:steps2].astype(cdt)
        Hm[:l_eff, :l_eff] = S_new
        Hm[l_eff, :l_eff] = b_new
        beta = float(np.abs(H2np[steps2, steps2 - 1])) if steps2 == m \
            else 0.0
        steps = steps2

    return QRResult(eigenvalues=jnp.asarray(wanted),
                    iterations=jnp.asarray(total_mv, jnp.int32),
                    converged=jnp.asarray(False))
