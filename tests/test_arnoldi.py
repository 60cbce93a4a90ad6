"""Arnoldi solver tests: factorisation invariants and Ritz-value accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import (DenseMatrix, SolverOptions,
                                                SparseCSR)
from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_random
from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import (
    arnoldi_decomposition, arnoldi_eigenvalues)


class TestDecomposition:
    def test_arnoldi_relation_and_orthonormality(self):
        rng = np.random.default_rng(0)
        a = rng.random((40, 40))
        m = 15
        x0 = jnp.asarray(rng.random(40))
        V, H, brk = arnoldi_decomposition(lambda v: jnp.asarray(a) @ v, x0, m)
        V, H = np.asarray(V), np.asarray(H)
        # A V_m = V_{m+1} H
        np.testing.assert_allclose(a @ V[:m].T, V.T @ H, atol=1e-12)
        np.testing.assert_allclose(V @ V.conj().T, np.eye(m + 1), atol=1e-10)
        assert int(brk) == m

    def test_breakdown_detected(self):
        # e1 on a diagonal matrix: K_1 is invariant
        a = np.diag([3.0, 2.0, 1.0])
        V, H, brk = arnoldi_decomposition(lambda v: jnp.asarray(a) @ v,
                                          jnp.array([1.0, 0.0, 0.0]), 3)
        assert int(brk) == 1
        assert np.asarray(H)[0, 0] == 3.0

    def test_complex(self):
        rng = np.random.default_rng(1)
        a = rng.random((20, 20)) + 1j * rng.random((20, 20))
        x0 = jnp.asarray(rng.random(20) + 1j * rng.random(20))
        V, H, _ = arnoldi_decomposition(lambda v: jnp.asarray(a) @ v, x0, 10)
        V, H = np.asarray(V), np.asarray(H)
        np.testing.assert_allclose(a @ V[:10].T, V.T @ H, atol=1e-11)


class TestRitzValues:
    def test_well_separated_spectrum(self, key):
        d = np.concatenate([[100.0, 50.0, 25.0], np.linspace(0.1, 1.0, 37)])
        M = DenseMatrix.from_array(np.diag(d))
        res = arnoldi_eigenvalues(M, k=3, m=25, key=key)
        got = np.sort(np.asarray(res.eigenvalues).real)[::-1]
        np.testing.assert_allclose(got, [100.0, 50.0, 25.0], rtol=1e-8)

    def test_nonsymmetric_sparse(self, key):
        ms = banded_random(300, bandwidth=5, nnz_per_row=6, seed=3)
        res = arnoldi_eigenvalues(ms, k=3, m=60, key=key)
        exact = np.linalg.eigvals(np.asarray(ms.to_dense()))
        exact = exact[np.argsort(-np.abs(exact))][:3]
        got = np.asarray(res.eigenvalues)
        for e in exact:
            assert min(abs(got - e)) < 1e-5

    def test_exact_when_m_equals_n(self, key):
        rng = np.random.default_rng(5)
        a = rng.random((12, 12))
        res = arnoldi_eigenvalues(DenseMatrix.from_array(a), k=12, m=12, key=key)
        got = np.asarray(res.eigenvalues)
        exact = np.linalg.eigvals(a)
        for e in exact:
            assert min(abs(got - e)) < 1e-7

    def test_errors(self):
        M = DenseMatrix.from_array(np.ones((2, 3)))
        with pytest.raises(ValueError, match="square"):
            arnoldi_eigenvalues(M)
        M2 = DenseMatrix.from_array(np.eye(4))
        with pytest.raises(ValueError, match="k .4. must be <= m"):
            arnoldi_eigenvalues(M2, k=4, m=3)
        with pytest.raises(TypeError, match="scalar type mismatch"):
            arnoldi_eigenvalues(M2, k=1, dtype=np.complex128)


class TestKrylovSchur:
    """VERDICT r3 task 7: Krylov-Schur restarting — the nonsymmetric
    analogue of lanczos_thick_restart (ordered-Schur contraction between
    device basis extensions)."""

    def _clustered(self, n=400, seed=0):
        rng = np.random.default_rng(seed)
        d = np.concatenate([[5.0, 4.9995, 4.999],
                            rng.uniform(0, 4.9, n - 3)])
        Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
        return (Qo * d) @ Qo.T, np.sort(d)[::-1][:3]

    def test_fixed_m_stagnates_krylov_schur_converges(self, key):
        from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import (
            krylov_schur_eigenvalues)
        A, truth = self._clustered()
        M = DenseMatrix.from_array(A.astype(np.float64))
        opts = SolverOptions(tolerance=1e-8)
        fixed = arnoldi_eigenvalues(M, k=3, m=15, opts=opts, key=key)
        fe = np.abs(np.sort(np.asarray(fixed.eigenvalues.real))[::-1]
                    - truth).max()
        ks = krylov_schur_eigenvalues(M, k=3, m=15, opts=opts, key=key)
        ke = np.abs(np.sort(np.asarray(ks.eigenvalues.real))[::-1]
                    - truth).max()
        assert fe > 1e-3          # the single fixed-m projection fails
        assert bool(ks.converged)
        assert ke < 1e-7          # the restarted solver resolves it

    def test_krylov_schur_nonsymmetric_complex_pair(self, key):
        """Dominant complex-conjugate pair of a real operator: the real
        ordered Schur keeps the pair together, the device basis stays
        real."""
        from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import (
            krylov_schur_eigenvalues)
        rng = np.random.default_rng(5)
        n = 300
        blocks = np.zeros((n, n))
        blocks[0, 0] = blocks[1, 1] = 3.0
        blocks[0, 1], blocks[1, 0] = 2.0, -2.0     # eigs 3 +- 2i
        blocks[2:, 2:] = np.diag(rng.uniform(0, 2.5, n - 2))
        Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
        A = Qo @ blocks @ Qo.T
        M = DenseMatrix.from_array(A.astype(np.float64))
        ks = krylov_schur_eigenvalues(M, k=2, m=16,
                                      opts=SolverOptions(tolerance=1e-8),
                                      key=key)
        assert bool(ks.converged)
        got = np.sort_complex(np.asarray(ks.eigenvalues))
        want = np.sort_complex(np.array([3 + 2j, 3 - 2j]))
        assert np.abs(got - want).max() < 1e-6

    def test_krylov_schur_validation(self):
        from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import (
            krylov_schur_eigenvalues)
        with pytest.raises(ValueError):
            krylov_schur_eigenvalues(
                DenseMatrix.from_array(np.ones((2, 3))), k=1)
        with pytest.raises(ValueError):
            krylov_schur_eigenvalues(
                DenseMatrix.from_array(np.eye(8)), k=0)
        with pytest.raises(ValueError):
            krylov_schur_eigenvalues(
                DenseMatrix.from_array(np.eye(8)), k=5, m=6)


class TestKSContractBlockBoundary:
    """Round-4 advisor finding (ADVICE.md): the l_eff clamp in
    _ks_contract must never cut a real-Schur 2x2 conjugate block."""

    def test_equal_modulus_spectrum_keeps_blocks_whole(self):
        from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import (
            _ks_contract)
        # Block-diagonal rotation-like Hm: every eigenvalue has |lam| = 1,
        # so the sorted-Schur selector takes sdim == steps and the clamp
        # to steps-1 would previously land mid-block.
        m = 10
        Hm = np.zeros((m, m))
        for b in range(m // 2):
            c, s = np.cos(0.3 + b), np.sin(0.3 + b)
            Hm[2 * b:2 * b + 2, 2 * b:2 * b + 2] = [[c, -s], [s, c]]
        # strict lower-block coupling keeps the equal-modulus spectrum
        # (block-triangular) but gives every eigenvector support on the
        # last row, so the residuals are nonzero and the contraction runs
        rng = np.random.default_rng(3)
        for b in range(m // 2):
            Hm[2 * b + 2:, 2 * b:2 * b + 2] = 0.3 * rng.standard_normal(
                (m - 2 * b - 2, 2))
        wanted, resid, conv, Q_l, S_new, b_new = _ks_contract(
            Hm, beta=0.5, k=3, l_target=m - 1, tol=1e-14)
        assert not conv
        l_eff = Q_l.shape[1]
        # the cut must land on a block boundary: S_new quasi-triangular
        # and the discarded coupling zero
        assert l_eff % 2 == 0            # rotation blocks are 2x2
        sub = np.abs(np.diag(S_new, -1))
        # subdiagonal entries only inside 2x2 blocks (even positions)
        for i in range(l_eff - 1):
            if i % 2 == 1:
                assert sub[i] == 0.0
        # Krylov relation preserved: S_new = Q^T Hm Q exactly on the
        # retained subspace
        err = np.abs(Q_l.T @ Hm @ Q_l - S_new).max()
        assert err < 1e-12

    def test_leading_block_grows_instead_of_emptying(self):
        from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import (
            _ks_contract)
        # force l_target = 1 with a leading 2x2 block: retreat would give
        # l_eff = 0 (empty restart basis); the fix grows to 2 instead
        m = 6
        Hm = np.zeros((m, m))
        c, s = np.cos(0.4), np.sin(0.4)
        Hm[0:2, 0:2] = [[c, -s], [s, c]]
        Hm[2:, 2:] = np.diag([0.1, 0.05, 0.02, 0.01])
        # lower coupling: block-triangular (same spectrum), nonzero resid
        Hm[2:, 0:2] = 0.2 * np.random.default_rng(7).standard_normal((4, 2))
        wanted, resid, conv, Q_l, S_new, b_new = _ks_contract(
            Hm, beta=0.5, k=1, l_target=1, tol=1e-14)
        assert not conv
        l_eff = Q_l.shape[1]
        assert l_eff in (1, 2)
        if l_eff == 2:
            assert True  # grew over the block
        else:
            # a 1-column cut is only legal if it is NOT inside a block
            assert np.abs(Q_l.T @ Hm @ Q_l - S_new).max() < 1e-12

    def test_restarts_validation(self):
        import pytest
        from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import (
            krylov_schur_eigenvalues)
        from pcsc_eigenvalue_solver_project_tpu.matrix.dense import (
            DenseMatrix)
        with pytest.raises(ValueError):
            krylov_schur_eigenvalues(
                DenseMatrix.from_array(np.eye(8)), k=2, restarts=0)
