"""Pallas dense-QR kernels (ops/pallas/qr_kernels.py) vs XLA and numpy.

Runs the kernel logic in interpreter mode on CPU (same program that runs
compiled on the TPU). Oracles: the XLA ``hessenberg_dense`` implementation
and ``numpy.linalg.eigvals`` with assignment matching (conjugate-pair
ordering is not stable across implementations).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
    hessenberg_planes, qr_eigenvalues_pallas, qr_hessenberg_eig_planes)
from pcsc_eigenvalue_solver_project_tpu.solvers.hessenberg import (
    hessenberg_dense, hessenberg_pallas_backend)


def _match_err(expected, got):
    from scipy.optimize import linear_sum_assignment
    C = np.abs(np.asarray(expected)[:, None] - np.asarray(got)[None, :])
    r, c = linear_sum_assignment(C)
    return C[r, c].max() / max(np.abs(expected).max(), 1.0)


class TestHessenbergKernel:
    @pytest.mark.parametrize("n", [2, 5, 16, 33])
    def test_matches_xla_real(self, n):
        rng = np.random.default_rng(n)
        a = rng.standard_normal((n, n)).astype(np.float32)
        ref = np.asarray(hessenberg_dense(jnp.asarray(a)))
        got = np.asarray(hessenberg_planes(jnp.asarray(a[None]), n,
                                           interpret=True))[0]
        np.testing.assert_allclose(got, ref, atol=5e-5 * max(n, 1))

    @pytest.mark.parametrize("n", [5, 16])
    def test_matches_xla_complex(self, n):
        rng = np.random.default_rng(n)
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))).astype(np.complex64)
        ref = np.asarray(hessenberg_dense(jnp.asarray(a)))
        planes = np.stack([a.real, a.imag]).astype(np.float32)
        h = np.asarray(hessenberg_planes(jnp.asarray(planes), n,
                                         interpret=True))
        got = h[0] + 1j * h[1]
        np.testing.assert_allclose(got, ref, atol=5e-5 * max(n, 1))

    def test_backend_helper_roundtrip(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((9, 9)).astype(np.float32)
        h = hessenberg_pallas_backend(a, interpret=True)
        assert h.dtype == np.float32
        assert np.abs(np.tril(h, -2)).max() < 1e-5
        err = _match_err(np.linalg.eigvals(a.astype(np.complex128)),
                         np.linalg.eigvals(h.astype(np.complex128)))
        assert err < 1e-5

    def test_skips_already_hessenberg(self):
        # an already-Hessenberg matrix passes through unchanged (the
        # tail-zero skip, to_hessenberg.hpp:46-48)
        rng = np.random.default_rng(1)
        a = np.triu(rng.standard_normal((8, 8)), -1).astype(np.float32)
        got = np.asarray(hessenberg_planes(jnp.asarray(a[None]), 8,
                                           interpret=True))[0]
        np.testing.assert_allclose(got, a, atol=1e-6)


class TestQREigKernel:
    @pytest.mark.parametrize("n", [2, 5, 16])
    def test_real_spectrum(self, n):
        rng = np.random.default_rng(n)
        a = rng.standard_normal((n, n)).astype(np.float32)
        eigs, sweeps, conv = qr_eigenvalues_pallas(a, 60 * n, 1e-6,
                                                   interpret=True)
        assert conv
        assert _match_err(np.linalg.eigvals(a.astype(np.complex128)),
                          eigs) < 5e-5

    @pytest.mark.parametrize("n", [5, 16])
    def test_complex_spectrum(self, n):
        rng = np.random.default_rng(100 + n)
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))).astype(np.complex64)
        eigs, sweeps, conv = qr_eigenvalues_pallas(a, 60 * n, 1e-6,
                                                   interpret=True)
        assert conv
        assert _match_err(np.linalg.eigvals(a.astype(np.complex128)),
                          eigs) < 5e-5

    def test_symmetric_exact(self):
        # symmetric: all-real spectrum, tight agreement
        rng = np.random.default_rng(7)
        b = rng.standard_normal((12, 12)).astype(np.float32)
        a = (b + b.T) / 2
        eigs, _, conv = qr_eigenvalues_pallas(a, 600, 1e-6, interpret=True)
        assert conv
        assert np.abs(eigs.imag).max() < 1e-4
        got = np.sort(eigs.real)
        want = np.sort(np.linalg.eigvalsh(a.astype(np.float64)))
        np.testing.assert_allclose(got, want, atol=2e-5 * 12)

    def test_hessenberg_input_direct(self):
        # feed an already-Hessenberg matrix straight to the eig kernel
        rng = np.random.default_rng(3)
        h = np.triu(rng.standard_normal((10, 10)), -1).astype(np.float32)
        planes = jnp.asarray(np.stack([h, np.zeros_like(h)]))
        eig, sweeps, hi = qr_hessenberg_eig_planes(planes, 10, 600, 1e-6,
                                                   interpret=True)
        assert int(hi) <= 1
        e = np.asarray(eig)
        assert _match_err(np.linalg.eigvals(h.astype(np.complex128)),
                          (e[0] + 1j * e[1])[:10]) < 5e-5

    def test_respects_max_sweeps(self):
        rng = np.random.default_rng(5)
        a = rng.standard_normal((8, 8)).astype(np.float32)
        eigs, sweeps, conv = qr_eigenvalues_pallas(a, 2, 1e-12,
                                                   interpret=True)
        assert sweeps == 2
        assert not conv


class TestQRDecomposeKernel:
    def test_real_qr(self):
        rng = np.random.default_rng(0)
        n = 10
        a = rng.standard_normal((n, n)).astype(np.float32)
        from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
            qr_decompose_planes)
        R, Q = qr_decompose_planes(jnp.asarray(a[None]), n, interpret=True)
        R, Q = np.asarray(R)[0], np.asarray(Q)[0]
        np.testing.assert_allclose(Q @ R, a, atol=5e-6 * n)
        np.testing.assert_allclose(Q.T @ Q, np.eye(n), atol=5e-6 * n)
        assert np.abs(np.tril(R, -1)).max() < 5e-6 * n

    def test_complex_qr(self):
        rng = np.random.default_rng(1)
        n = 8
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))).astype(np.complex64)
        from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
            qr_decompose_planes)
        planes = np.stack([a.real, a.imag]).astype(np.float32)
        Rp, Qp = qr_decompose_planes(jnp.asarray(planes), n, interpret=True)
        Rc = np.asarray(Rp)[0] + 1j * np.asarray(Rp)[1]
        Qc = np.asarray(Qp)[0] + 1j * np.asarray(Qp)[1]
        np.testing.assert_allclose(Qc @ Rc, a, atol=5e-6 * n)
        np.testing.assert_allclose(Qc.conj().T @ Qc, np.eye(n), atol=5e-6 * n)


class TestQRParityKernel:
    def test_symmetric_converges(self):
        from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
            qr_parity_pallas)
        rng = np.random.default_rng(0)
        d = 0.8 ** np.arange(8)
        Qo, _ = np.linalg.qr(rng.standard_normal((8, 8)))
        sym = ((Qo * d) @ Qo.T).astype(np.float32)
        eigs, it, conv, maxsub = qr_parity_pallas(sym, 2000, 1e-5,
                                                  interpret=True)
        assert conv
        np.testing.assert_allclose(np.sort(eigs.real), np.sort(d), atol=1e-4)

    def test_nonconvergence_reports_max_plus_one(self):
        # reference quirk: iterations == max_iterations + 1 on
        # non-convergence (qr_eigenvalues.hpp:69,104)
        from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
            qr_parity_pallas)
        rng = np.random.default_rng(2)
        a = rng.standard_normal((6, 6)).astype(np.float32)
        eigs, it, conv, maxsub = qr_parity_pallas(a, 3, 1e-12, interpret=True)
        assert not conv
        assert it == 4

    def test_complex_planes(self):
        from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
            qr_parity_pallas)
        rng = np.random.default_rng(3)
        n = 6
        a = (rng.standard_normal((n, n))
             + 1j * rng.standard_normal((n, n))).astype(np.complex64)
        eigs, it, conv, maxsub = qr_parity_pallas(a, 4000, 1e-5,
                                                  interpret=True)
        assert conv
        assert _match_err(np.linalg.eigvals(a.astype(np.complex128)),
                          eigs) < 1e-3


class TestEigenvectors:
    """compute_vectors superset: Schur accumulation + back-substitution."""

    @pytest.mark.parametrize("make", ["real", "cplx"])
    def test_xla_path_residual(self, make):
        import pcsc_eigenvalue_solver_project_tpu as es
        rng = np.random.default_rng(3)
        n = 30
        a = rng.standard_normal((n, n))
        if make == "cplx":
            a = a + 1j * rng.standard_normal((n, n))
        M = es.DenseMatrix.from_array(a)
        r = es.qr_eigenvalues(M, es.QROptions(
            mode="accelerated", compute_vectors=True, tolerance=1e-10,
            max_iterations=3000))
        assert bool(r.converged)
        V = np.asarray(r.eigenvectors)
        lam = np.asarray(r.eigenvalues)
        res = np.abs(a.astype(np.complex128) @ V - V * lam[None, :]).max()
        assert res < 1e-8
        # columns normalized
        np.testing.assert_allclose(np.linalg.norm(V, axis=0), 1.0, rtol=1e-6)

    def test_pallas_kernel_vectors_interpret(self):
        rng = np.random.default_rng(4)
        n = 18
        a = rng.standard_normal((n, n)).astype(np.float32)
        eigs, sweeps, conv, V = qr_eigenvalues_pallas(
            a, 2000, 1e-6, interpret=True, compute_vectors=True)
        assert conv
        res = np.abs(a.astype(np.complex128) @ V - V * eigs[None, :]).max()
        assert res < 5e-5

    def test_triangular_backsub_repeated_eigenvalue(self):
        from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
            triangular_eigenvectors)
        # repeated diagonal: the perturbed-pivot path must stay finite
        T = np.array([[2.0, 1.0, 0.5],
                      [0.0, 2.0, 1.0],
                      [0.0, 0.0, 3.0]], np.complex128)
        V = triangular_eigenvectors(T)
        assert np.all(np.isfinite(V))
        # the well-separated eigenvalue's vector is exact
        v3 = V[:, 2] / np.linalg.norm(V[:, 2])
        r = T @ v3 - 3.0 * v3
        assert np.abs(r).max() < 1e-12

    def test_parity_mode_rejects_vectors(self):
        import pcsc_eigenvalue_solver_project_tpu as es
        with pytest.raises(ValueError, match="compute_vectors"):
            es.QROptions(mode="parity", compute_vectors=True)
