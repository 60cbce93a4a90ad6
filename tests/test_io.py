"""Reader/writer tests — exact grammar and error-path parity.

Mirrors the format contract of file_matrix_reader.hpp:170-200 and exercises
every reference error case, plus round-trips through the writer and the two
shipped reference data files (data/A.txt dense 3x3 complex, data/B.txt
sparse 5x5 complex with 8 nnz).
"""

import os

import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import (
    DenseMatrix, SparseCSR, read_matrix_from_file, read_matrix_from_text,
    write_matrix_to_file)

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


class TestDenseParsing:
    def test_real(self):
        m = read_matrix_from_text("dense\n2 2\n1 2\n3 4\n", np.float64)
        assert isinstance(m, DenseMatrix)
        np.testing.assert_array_equal(np.asarray(m.array), [[1, 2], [3, 4]])

    def test_complex_pairs(self):
        m = read_matrix_from_text("dense\n1 2\n1 2 3 4\n", np.complex128)
        np.testing.assert_array_equal(np.asarray(m.array), [[1 + 2j, 3 + 4j]])

    def test_missing_entry(self):
        with pytest.raises(ValueError, match="Failed to read scalar entry in dense"):
            read_matrix_from_text("dense\n2 2\n1 2 3\n", np.float64)

    def test_missing_complex_half(self):
        with pytest.raises(ValueError, match="Failed to read complex entry in dense"):
            read_matrix_from_text("dense\n1 1\n1\n", np.complex128)

    def test_garbage_entry(self):
        with pytest.raises(ValueError, match="Failed to read scalar entry in dense"):
            read_matrix_from_text("dense\n1 1\nfoo\n", np.float64)


class TestSparseParsing:
    def test_real(self):
        m = read_matrix_from_text("sparse\n2 2\n2\n0 0 1.5\n1 1 2.5\n", np.float64)
        assert isinstance(m, SparseCSR)
        np.testing.assert_allclose(np.asarray(m.to_dense()), [[1.5, 0], [0, 2.5]])

    def test_complex(self):
        m = read_matrix_from_text("sparse\n2 2\n1\n0 1 3 -4\n", np.complex128)
        assert np.asarray(m.to_dense())[0, 1] == 3 - 4j

    def test_missing_nnz(self):
        with pytest.raises(ValueError, match="Cannot read number of non-zero"):
            read_matrix_from_text("sparse\n2 2\n", np.float64)

    def test_nonpositive_nnz(self):
        with pytest.raises(ValueError, match="must be positive in a sparse"):
            read_matrix_from_text("sparse\n2 2\n0\n", np.float64)

    def test_bad_indices(self):
        with pytest.raises(ValueError, match="indices in sparse"):
            read_matrix_from_text("sparse\n2 2\n1\nx y 1.0\n", np.float64)

    def test_out_of_range(self):
        with pytest.raises(ValueError, match="Sparse indices out of range"):
            read_matrix_from_text("sparse\n2 2\n1\n0 5 1.0\n", np.float64)

    def test_missing_value(self):
        with pytest.raises(ValueError, match="Failed to read scalar entry in sparse"):
            read_matrix_from_text("sparse\n2 2\n1\n0 0\n", np.float64)

    def test_duplicate_entry_rejected(self):
        # Eigen insert() rejects duplicates
        with pytest.raises(ValueError, match="duplicate"):
            read_matrix_from_text("sparse\n2 2\n2\n0 0 1\n0 0 2\n", np.float64)


class TestHeaderParsing:
    def test_empty(self):
        with pytest.raises(ValueError, match="Failed to read matrix storage type"):
            read_matrix_from_text("", np.float64)

    def test_unknown_storage(self):
        with pytest.raises(ValueError, match="Unknown storage type: diagonal"):
            read_matrix_from_text("diagonal\n2 2\n", np.float64)

    def test_missing_dims(self):
        with pytest.raises(ValueError, match="Failed to read matrix dimensions"):
            read_matrix_from_text("dense\n2\n", np.float64)

    def test_nonpositive_dims(self):
        with pytest.raises(ValueError, match="dimensions must be positive"):
            read_matrix_from_text("dense\n0 2\n", np.float64)
        with pytest.raises(ValueError, match="dimensions must be positive"):
            read_matrix_from_text("sparse\n3 -1\n1\n0 0 1\n", np.float64)

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError, match="Impossible to open the file"):
            read_matrix_from_file("/nonexistent/path.txt", np.float64)


class TestReferenceDataFiles:
    def test_a_txt(self):
        m = read_matrix_from_file(os.path.join(DATA, "A.txt"), np.complex128)
        assert isinstance(m, DenseMatrix) and m.shape == (3, 3)
        a = np.asarray(m.array)
        # data/A.txt: upper-triangular; diagonal = 1+3i, 2+4i, 5-1i
        np.testing.assert_allclose(np.diag(a), [1 + 3j, 2 + 4j, 5 - 1j])
        assert a[1, 0] == 0 and a[2, 0] == 0 and a[2, 1] == 0

    def test_b_txt(self):
        m = read_matrix_from_file(os.path.join(DATA, "B.txt"), np.complex128)
        assert isinstance(m, SparseCSR) and m.shape == (5, 5) and m.nnz == 8
        d = np.asarray(m.to_dense())
        assert d[0, 0] == 2 + 3j and d[2, 3] == -23 - 15j


class TestWriterRoundtrip:
    def test_dense_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        a = rng.random((4, 5))
        p = str(tmp_path / "d.txt")
        write_matrix_to_file(p, DenseMatrix.from_array(a))
        m = read_matrix_from_file(p, np.float64)
        np.testing.assert_allclose(np.asarray(m.array), a, rtol=0, atol=0)

    def test_sparse_complex_roundtrip(self, tmp_path):
        rng = np.random.default_rng(4)
        a = (rng.random((6, 6)) + 1j * rng.random((6, 6))) * (rng.random((6, 6)) < 0.3)
        src = SparseCSR.from_dense(a, dtype=np.complex128)
        p = str(tmp_path / "s.txt")
        write_matrix_to_file(p, src)
        m = read_matrix_from_file(p, np.complex128)
        np.testing.assert_allclose(np.asarray(m.to_dense()), a, rtol=0, atol=0)
