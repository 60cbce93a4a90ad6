"""Blocked triangular eigenvector back-substitution kernel (interpret).

VERDICT r3 task 3: the compute_vectors path's last host-numpy piece
(triangular back-substitution) now runs on device
(ops/pallas/trisolve_vec.py). Generalizes the reference's
eigenvalues-only output (qr_eigenvalues.hpp:97-100).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu.ops.pallas.trisolve_vec import (
    triangular_eigenvectors_planes)


def _residual(T, Y):
    lam = np.diagonal(T).astype(np.complex128)
    nrm = np.maximum(np.linalg.norm(Y, axis=0), 1e-30)
    Yn = Y / nrm
    R = T.astype(np.complex128) @ Yn - Yn * lam[None, :]
    return np.abs(R).max()


@pytest.mark.parametrize("n", [33, 129, 250])
def test_trisolve_complex_residual(n):
    rng = np.random.default_rng(n)
    T = np.triu(rng.standard_normal((n, n))
                + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    T += np.diag(np.linspace(1.0, 3.0, n))
    planes = jnp.asarray(np.stack([T.real, T.imag]).astype(np.float32))
    eps = np.finfo(np.float32).eps * float(np.abs(T).max())
    Y = np.asarray(triangular_eigenvectors_planes(planes, n, eps,
                                                  interpret=True))
    Yc = (Y[0] + 1j * Y[1]).astype(np.complex128)
    assert np.abs(np.tril(Yc, -1)).max() == 0.0   # strictly upper + diag
    # diag entries are the per-column scale: 1 or _R^k for columns the
    # adaptive overflow rescaling touched — always positive real
    dg = np.diagonal(Yc)
    assert (dg.real > 0).all() and np.abs(dg.imag).max() == 0.0
    # relative residual tolerant of the f32 recurrence's growth on a
    # random triangular operand (real Schur factors behave much better)
    assert _residual(T, Yc) < 5e-3


def test_trisolve_realistic_schur_factor():
    """Schur factor of a random matrix (what the pipeline actually
    feeds): residual at f32-eps scale, like the host f64 version."""
    n = 180
    rng = np.random.default_rng(0)
    A = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))) / np.sqrt(2 * n)
    w, Vec = np.linalg.eig(A)
    Q, _ = np.linalg.qr(Vec)
    T = np.triu(Q.conj().T @ A @ Q).astype(np.complex64)
    planes = jnp.asarray(np.stack([T.real, T.imag]).astype(np.float32))
    eps = np.finfo(np.float32).eps * float(np.abs(T).max())
    Y = np.asarray(triangular_eigenvectors_planes(planes, n, eps,
                                                  interpret=True))
    Yc = (Y[0] + 1j * Y[1]).astype(np.complex128)
    assert _residual(T, Yc) < 5e-6


def test_trisolve_repeated_eigenvalues_clamped():
    """Repeated diagonal entries hit the eps clamp and still produce
    finite, normalizable columns (the LAPACK perturbation trick)."""
    n = 40
    rng = np.random.default_rng(2)
    T = np.triu(0.1 * rng.standard_normal((n, n)), 1).astype(np.complex64)
    T += np.eye(n, dtype=np.complex64) * 2.0    # all eigenvalues equal
    planes = jnp.asarray(np.stack([T.real, T.imag]).astype(np.float32))
    eps = np.finfo(np.float32).eps * 2.0
    Y = np.asarray(triangular_eigenvectors_planes(planes, n, eps,
                                                  interpret=True))
    assert np.isfinite(Y).all()   # adaptive rescaling: no f32 overflow
    Yc = Y[0] + 1j * Y[1]
    assert (np.linalg.norm(Yc, axis=0) > 0.0).all()
