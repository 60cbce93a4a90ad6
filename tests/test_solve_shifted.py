"""Shifted linear-solve tests.

Mirrors /root/reference/test/solve_shifted_test.cpp: residual check
``||(A - shift I) x - b|| ~= 0``, dense identity analytic case, dense 2x2
vs a host LU reference, sparse identity, complex case, and all error paths
(non-square dense/sparse, size mismatch, scalar-type mismatch).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import DenseMatrix, SparseCSR, solve_shifted


def assert_residual(a, shift, x, b, tol=1e-10):
    # solve_shifted_test.cpp:14-23 analogue
    m = a - shift * np.eye(a.shape[0], dtype=a.dtype)
    assert np.linalg.norm(m @ x - b) <= tol


class TestDense:
    def test_identity_analytic(self):
        # solve_shifted_test.cpp:29-60: (I - 0.5 I) x = b -> x = 2 b
        b = np.array([1.0, 2.0, 3.0])
        x = np.asarray(solve_shifted(DenseMatrix.from_array(np.eye(3)), 0.5, b))
        np.testing.assert_allclose(x, 2 * b, rtol=1e-12)

    def test_2x2_vs_numpy_lu(self):
        # solve_shifted_test.cpp:65-98 (Eigen partialPivLu cross-check)
        a = np.array([[3.0, 1.0], [1.0, 2.0]])
        b = np.array([1.0, 0.0])
        shift = 0.7
        x = np.asarray(solve_shifted(DenseMatrix.from_array(a), shift, b))
        expected = np.linalg.solve(a - shift * np.eye(2), b)
        np.testing.assert_allclose(x, expected, rtol=1e-12)
        assert_residual(a, shift, x, b)

    def test_complex(self):
        # solve_shifted_test.cpp:142-176
        a = np.array([[2 + 1j, 1 - 1j], [0 + 2j, 3 + 0j]])
        b = np.array([1 + 0j, 2 - 1j])
        shift = 0.5 + 0.5j
        x = np.asarray(solve_shifted(
            DenseMatrix.from_array(a, dtype=np.complex128), shift, b))
        expected = np.linalg.solve(a - shift * np.eye(2), b)
        np.testing.assert_allclose(x, expected, rtol=1e-12)


class TestSparse:
    def test_identity(self):
        # solve_shifted_test.cpp:105-137 (SparseLU branch analogue)
        m = SparseCSR.from_coo([0, 1, 2], [0, 1, 2], [1.0, 1.0, 1.0], (3, 3))
        b = np.array([4.0, 5.0, 6.0])
        x = np.asarray(solve_shifted(m, 0.5, b))
        np.testing.assert_allclose(x, 2 * b, rtol=1e-10)

    def test_bicgstab_vs_dense(self):
        rng = np.random.default_rng(11)
        n = 20
        a = np.diag(rng.random(n) + 2.0)
        idx = rng.integers(0, n, size=(2, 30))
        a[idx[0], idx[1]] += 0.1 * rng.random(30)
        m = SparseCSR.from_dense(a)
        b = rng.random(n)
        shift = 0.3
        x = np.asarray(solve_shifted(m, shift, b, method="bicgstab"))
        expected = np.linalg.solve(a - shift * np.eye(n), b)
        np.testing.assert_allclose(x, expected, rtol=1e-6, atol=1e-8)

    def test_inserts_missing_diagonal(self):
        # solve_shifted.hpp:100-102: shift applies even where the diagonal
        # has no stored entry
        m = SparseCSR.from_coo([0, 1], [1, 0], [1.0, 1.0], (2, 2))
        b = np.array([1.0, 1.0])
        shift = 2.0
        x = np.asarray(solve_shifted(m, shift, b))
        a = np.array([[0.0, 1.0], [1.0, 0.0]])
        expected = np.linalg.solve(a - shift * np.eye(2), b)
        np.testing.assert_allclose(x, expected, rtol=1e-10)


class TestErrorPaths:
    def test_non_square_dense(self):
        # solve_shifted_test.cpp:181-202
        with pytest.raises(ValueError, match="square .dense case."):
            solve_shifted(DenseMatrix.from_array(np.ones((2, 3))), 0.0, np.ones(2))

    def test_non_square_sparse(self):
        # solve_shifted_test.cpp:204-223
        m = SparseCSR.from_coo([0], [0], [1.0], (2, 3))
        with pytest.raises(ValueError, match="square .sparse case."):
            solve_shifted(m, 0.0, np.ones(2))

    def test_size_mismatch(self):
        # solve_shifted_test.cpp:228-244
        with pytest.raises(ValueError, match="size mismatch"):
            solve_shifted(DenseMatrix.from_array(np.eye(3)), 0.0, np.ones(2))

    def test_scalar_type_mismatch(self):
        # solve_shifted_test.cpp:249-272
        with pytest.raises(TypeError, match="scalar type mismatch"):
            solve_shifted(DenseMatrix.from_array(np.eye(2)), 0.0, np.ones(2),
                          dtype=np.complex128)
