"""Matrix-wrapper tests.

Mirrors /root/reference/test/matrix_wrapper_test.cpp: construction from
dense arrays, COO triplets, and flat row-major data; kind/dtype queries;
checked access raising on the wrong stored kind (the ``cast<T>()`` /
``std::bad_cast`` contract, matrix.hpp:160-183).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import DenseMatrix, SparseCSR, SparseELL


class TestDenseMatrix:
    def test_from_array(self):
        m = DenseMatrix.from_array([[1.0, 2.0], [3.0, 4.0]])
        assert m.shape == (2, 2)
        assert m.is_dense
        assert m.dtype == np.dtype(np.float64)

    def test_from_flat_row_major(self):
        # matrix_wrapper_test.cpp:74-87
        m = DenseMatrix.from_flat([1, 2, 3, 4, 5, 6], 2, 3, dtype=np.float64)
        np.testing.assert_array_equal(np.asarray(m.array),
                                      [[1, 2, 3], [4, 5, 6]])

    def test_from_flat_size_mismatch(self):
        # matrix.hpp:213-215 throw
        with pytest.raises(ValueError, match="does not match"):
            DenseMatrix.from_flat([1, 2, 3], 2, 2)

    def test_non_2d_rejected(self):
        with pytest.raises(ValueError):
            DenseMatrix.from_array([1.0, 2.0])

    def test_bad_dtype_rejected(self):
        with pytest.raises(TypeError):
            DenseMatrix.from_array([[1, 2]], dtype=np.int32)

    def test_wrong_kind_access(self):
        # cast<T>() bad_cast parity (matrix_wrapper_test.cpp:92-102)
        m = DenseMatrix.from_array([[1.0]])
        with pytest.raises(TypeError):
            m.as_csr()

    def test_matvec(self):
        m = DenseMatrix.from_array([[1.0, 2.0], [3.0, 4.0]])
        np.testing.assert_allclose(np.asarray(m.matvec(jnp.array([1.0, 1.0]))),
                                   [3.0, 7.0])

    def test_pytree_roundtrip(self):
        m = DenseMatrix.from_array([[1.0, 2.0], [3.0, 4.0]])
        leaves, treedef = jax.tree_util.tree_flatten(m)
        m2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert m2.shape == m.shape

    def test_complex(self):
        m = DenseMatrix.from_array(np.array([[1 + 2j]]), dtype=np.complex128)
        assert m.dtype == np.dtype(np.complex128)


class TestSparseCSR:
    def test_from_coo(self):
        m = SparseCSR.from_coo([0, 1, 0], [0, 1, 1], [1.0, 2.0, 3.0], (2, 2))
        assert not m.is_dense
        assert m.nnz == 3
        np.testing.assert_allclose(np.asarray(m.to_dense()),
                                   [[1.0, 3.0], [0.0, 2.0]])

    def test_out_of_range(self):
        with pytest.raises(ValueError, match="out of range"):
            SparseCSR.from_coo([0, 2], [0, 0], [1.0, 1.0], (2, 2))

    def test_duplicates_sum_or_raise(self):
        m = SparseCSR.from_coo([0, 0], [0, 0], [1.0, 2.0], (1, 1))
        np.testing.assert_allclose(np.asarray(m.to_dense()), [[3.0]])
        with pytest.raises(ValueError, match="duplicate"):
            SparseCSR.from_coo([0, 0], [0, 0], [1.0, 2.0], (1, 1),
                               sum_duplicates=False)

    def test_matvec_vs_dense(self):
        rng = np.random.default_rng(0)
        a = rng.random((6, 6)) * (rng.random((6, 6)) < 0.4)
        m = SparseCSR.from_dense(a)
        x = rng.random(6)
        np.testing.assert_allclose(np.asarray(m.matvec(jnp.asarray(x))), a @ x,
                                   rtol=1e-12)

    def test_rmatvec(self):
        rng = np.random.default_rng(1)
        a = (rng.random((5, 4)) + 1j * rng.random((5, 4))) * (rng.random((5, 4)) < 0.5)
        m = SparseCSR.from_dense(a, dtype=np.complex128)
        x = rng.random(5) + 1j * rng.random(5)
        np.testing.assert_allclose(np.asarray(m.rmatvec(jnp.asarray(x))),
                                   a.conj().T @ x, rtol=1e-12)

    def test_diagonal(self):
        a = np.array([[1.0, 2.0], [0.0, 0.0]])
        m = SparseCSR.from_dense(a)
        np.testing.assert_allclose(np.asarray(m.diagonal()), [1.0, 0.0])

    def test_wrong_kind_access(self):
        m = SparseCSR.from_coo([0], [0], [1.0], (1, 1))
        with pytest.raises(TypeError):
            m.as_dense()
        assert m.as_csr() is m

    def test_complex_coo(self):
        m = SparseCSR.from_coo([0, 1], [1, 0], [1 + 1j, 2 - 1j], (2, 2),
                               dtype=np.complex128)
        d = np.asarray(m.to_dense())
        assert d[0, 1] == 1 + 1j and d[1, 0] == 2 - 1j


class TestSparseELL:
    def test_roundtrip_and_matvec(self):
        rng = np.random.default_rng(2)
        a = rng.random((7, 7)) * (rng.random((7, 7)) < 0.3)
        a[0, 0] = 1.5  # ensure at least one entry
        csr = SparseCSR.from_dense(a)
        ell = csr.to_ell()
        np.testing.assert_allclose(np.asarray(ell.to_dense()), a, rtol=1e-12)
        x = rng.random(7)
        np.testing.assert_allclose(np.asarray(ell.matvec(jnp.asarray(x))), a @ x,
                                   rtol=1e-12)

    def test_diagonal(self):
        a = np.diag([1.0, 2.0, 3.0])
        ell = SparseCSR.from_dense(a).to_ell()
        np.testing.assert_allclose(np.asarray(ell.diagonal()), [1, 2, 3])
