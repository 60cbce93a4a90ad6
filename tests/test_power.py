"""Power-method tests.

Mirrors /root/reference/test/power_method_test.cpp: eigenpair residual
check ``A x ~= lambda x``, dense diag(2,1) -> 2, sparse upper-triangular ->
3, non-square/zero-size errors, and the maxIterations=1 iteration-count
contract. Fixed PRNG keys let tolerances be tighter than the reference's
(its random init forces 1e-5/1e-6; see SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import (
    DenseMatrix, SolverOptions, SparseCSR, power_method)


def assert_eigenpair(M, res, rtol=1e-8):
    # power_method_test.cpp:16-33 analogue: elementwise A x ~= lambda x
    x = np.asarray(res.eigenvector)
    lam = complex(res.eigenvalue)
    ax = np.asarray(M.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(ax, lam * x, rtol=rtol, atol=rtol)
    np.testing.assert_allclose(np.linalg.norm(x), 1.0, rtol=1e-12)


class TestDense:
    def test_diag_2_1(self, key):
        # power_method_test.cpp:38-57
        M = DenseMatrix.from_array(np.diag([2.0, 1.0]))
        res = power_method(M, SolverOptions(tolerance=1e-12), key=key)
        assert bool(res.converged)
        np.testing.assert_allclose(complex(res.eigenvalue), 2.0, rtol=1e-8)
        assert_eigenpair(M, res, rtol=1e-5)

    def test_nonsymmetric(self, key):
        a = np.array([[2.0, 1.0], [1.0, 3.0]])
        M = DenseMatrix.from_array(a)
        res = power_method(M, SolverOptions(tolerance=1e-13), key=key)
        expected = max(np.linalg.eigvals(a), key=abs)
        np.testing.assert_allclose(complex(res.eigenvalue), expected, rtol=1e-8)

    def test_complex_dominant(self, key):
        a = np.diag([1 + 3j, 2 + 4j, 5 - 1j])
        M = DenseMatrix.from_array(a, dtype=np.complex128)
        res = power_method(M, SolverOptions(tolerance=1e-12), key=key)
        assert bool(res.converged)
        np.testing.assert_allclose(complex(res.eigenvalue), 5 - 1j, rtol=1e-6)


class TestSparse:
    def test_upper_triangular(self, key):
        # power_method_test.cpp:62-83: sparse dispatch, lambda = 3
        M = SparseCSR.from_coo([0, 0, 1, 2], [0, 1, 1, 2],
                               [3.0, 1.0, 1.0, 2.0], (3, 3))
        res = power_method(M, SolverOptions(tolerance=1e-12), key=key)
        assert bool(res.converged)
        np.testing.assert_allclose(complex(res.eigenvalue), 3.0, rtol=1e-6)

    def test_ell_format(self, key):
        M = SparseCSR.from_coo([0, 1, 2], [0, 1, 2], [5.0, 2.0, 1.0], (3, 3))
        res = power_method(M.to_ell(), SolverOptions(tolerance=1e-12), key=key)
        np.testing.assert_allclose(complex(res.eigenvalue), 5.0, rtol=1e-8)


class TestErrorPaths:
    def test_non_square(self):
        # power_method_test.cpp:88-98
        M = DenseMatrix.from_array(np.ones((2, 3)))
        with pytest.raises(ValueError, match="matrix must be square"):
            power_method(M)

    def test_zero_size(self):
        # power_method_test.cpp:124-134
        M = DenseMatrix.from_array(np.zeros((0, 0)))
        with pytest.raises(ValueError, match="zero size"):
            power_method(M)

    def test_scalar_type_mismatch(self):
        # power_method.hpp:137-139
        M = DenseMatrix.from_array(np.eye(2), dtype=np.float64)
        with pytest.raises(TypeError, match="scalar type mismatch"):
            power_method(M, dtype=np.complex128)


class TestIterationSemantics:
    def test_max_iterations_1(self, key):
        # power_method_test.cpp:103-119: reports count without converging
        M = DenseMatrix.from_array(np.diag([2.0, 1.0]))
        res = power_method(M, SolverOptions(max_iterations=1), key=key)
        assert int(res.iterations) == 1
        assert not bool(res.converged)

    def test_max_iterations_0(self, key):
        M = DenseMatrix.from_array(np.diag([2.0, 1.0]))
        res = power_method(M, SolverOptions(max_iterations=0), key=key)
        assert int(res.iterations) == 0
        assert not bool(res.converged)
        assert complex(res.eigenvalue) == 0.0

    def test_breakdown_on_nilpotent(self):
        # A = [[0,1],[0,0]], x0 = e1 -> A x0 = 0: breakdown exits with
        # converged=False after 1 iteration (power_method.hpp:73-76)
        M = DenseMatrix.from_array(np.array([[0.0, 1.0], [0.0, 0.0]]))
        res = power_method(M, x0=np.array([1.0, 0.0]))
        assert int(res.iterations) == 1
        assert not bool(res.converged)

    def test_deterministic_default_key(self):
        M = DenseMatrix.from_array(np.diag([3.0, 1.0]))
        r1 = power_method(M)
        r2 = power_method(M)
        assert complex(r1.eigenvalue) == complex(r2.eigenvalue)
        assert int(r1.iterations) == int(r2.iterations)


class TestJitEagerParity:
    def test_same_result_under_disable_jit(self, key):
        M = DenseMatrix.from_array(np.diag([2.0, 1.0]))
        res = power_method(M, SolverOptions(tolerance=1e-10), key=key)
        with jax.disable_jit():
            res2 = power_method(M, SolverOptions(tolerance=1e-10), key=key)
        np.testing.assert_allclose(complex(res.eigenvalue), complex(res2.eigenvalue),
                                   rtol=1e-12)
        assert int(res.iterations) == int(res2.iterations)
