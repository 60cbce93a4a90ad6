"""Native C++ reader tests: build, parity with the Python tokenizer on
values and on every error message, plus the distributed row-block loader."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pcsc_eigenvalue_solver_project_tpu.io import native, reader
from pcsc_eigenvalue_solver_project_tpu.matrix.dense import DenseMatrix
from pcsc_eigenvalue_solver_project_tpu.io.distributed import read_sparse_row_block
from pcsc_eigenvalue_solver_project_tpu.io.writer import write_matrix_to_file
from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_random

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native reader not built")


@needs_native
class TestNativeParity:
    def test_reference_files(self):
        for f in ("A.txt", "B.txt"):
            p = os.path.join(DATA, f)
            mn = native.read_matrix_from_file(p, np.complex128)
            mp = reader.read_matrix_from_file(p, np.complex128, use_native=False)
            np.testing.assert_allclose(np.asarray(mn.to_dense()),
                                       np.asarray(mp.to_dense()))

    def test_roundtrip_real_sparse(self, tmp_path):
        m = banded_random(500, bandwidth=3, nnz_per_row=4, seed=0)
        p = str(tmp_path / "m.txt")
        write_matrix_to_file(p, m)
        mn = native.read_matrix_from_file(p, np.float64)
        np.testing.assert_allclose(np.asarray(mn.data), np.asarray(m.data))

    @pytest.mark.parametrize("text,msg", [
        ("dense\n2 2\n1 2 3", "Failed to read scalar entry in dense matrix"),
        ("dense\n1 1\n1", "Failed to read complex entry in dense matrix"),
        ("sparse\n2 2\n1\n0 9 1.0", "Sparse indices out of range"),
        ("sparse\n2 2\n0\n", "must be positive in a sparse matrix"),
        ("sparse\n2 2\n", "Cannot read number of non-zero entries"),
        ("sparse\n2 2\n1\nx y 1.0", "indices in sparse matrix"),
        ("diagonal\n2 2\n", "Unknown storage type: diagonal"),
        ("dense\n2\n", "Failed to read matrix dimensions"),
        ("dense\n0 2\n", "Matrix dimensions must be positive"),
        ("", "Failed to read matrix storage type"),
        ("dense\n1 1\nfoo", "Failed to read scalar entry in dense matrix"),
    ])
    def test_error_parity(self, tmp_path, text, msg):
        p = str(tmp_path / "bad.txt")
        with open(p, "w") as f:
            f.write(text)
        dtype = np.complex128 if "complex" in msg else np.float64
        with pytest.raises(ValueError, match=msg.replace("(", r"\(")):
            native.read_matrix_from_file(p, dtype)
        with pytest.raises(ValueError, match=msg.replace("(", r"\(")):
            reader.read_matrix_from_file(p, dtype, use_native=False)

    def test_default_path_uses_native(self):
        # the public reader routes through the native parser when available
        m = reader.read_matrix_from_file(os.path.join(DATA, "B.txt"), np.complex128)
        assert m.nnz == 8


class TestNativeSanitizers:
    def test_asan_suite(self):
        """The C++ reader under AddressSanitizer+UBSan (SURVEY §5: the
        native-code race/sanitizer story the reference lacks)."""
        import shutil
        import subprocess
        if shutil.which("g++") is None:
            pytest.skip("no g++")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(["make", "-C", os.path.join(root, "native"), "test-asan"],
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "ALL PASS" in r.stdout


class TestRowBlockLoader:
    def test_block_matches_full(self, tmp_path):
        m = banded_random(64, bandwidth=2, nnz_per_row=3, seed=4)
        p = str(tmp_path / "m.txt")
        write_matrix_to_file(p, m)
        rr, cc, vv, shape = read_sparse_row_block(p, np.float64, 16, 32)
        assert shape == (64, 64)
        assert ((rr >= 16) & (rr < 32)).all()
        full_rows = np.asarray(m.rows)
        in_block = (full_rows >= 16) & (full_rows < 32)
        assert len(rr) == in_block.sum()

    def test_rejects_dense(self, tmp_path):
        p = str(tmp_path / "d.txt")
        with open(p, "w") as f:
            f.write("dense\n1 1\n3.0\n")
        with pytest.raises(ValueError, match="expected a sparse file"):
            read_sparse_row_block(p, np.float64, 0, 1)


class TestNativeWriter:
    """Native writer: exact roundtrips through both readers, fallback
    parity with the Python writer."""

    def test_sparse_roundtrip_exact(self, tmp_path):
        from pcsc_eigenvalue_solver_project_tpu.io import native
        if not native.writer_available():
            pytest.skip("native writer unavailable")
        from pcsc_eigenvalue_solver_project_tpu.models.generators import (
            banded_random)
        m = banded_random(5000, bandwidth=4, nnz_per_row=5,
                          dtype=np.float64, seed=3)
        p = tmp_path / "m.txt"
        write_matrix_to_file(p, m)
        r = reader.read_matrix_from_file(p, np.float64)
        x = np.random.default_rng(0).standard_normal(5000)
        np.testing.assert_array_equal(np.asarray(m.matvec(jnp.asarray(x))),
                                      np.asarray(r.matvec(jnp.asarray(x))))

    def test_dense_complex_roundtrip_exact(self, tmp_path):
        from pcsc_eigenvalue_solver_project_tpu.io import native
        if not native.writer_available():
            pytest.skip("native writer unavailable")
        rng = np.random.default_rng(1)
        a = rng.standard_normal((17, 23)) + 1j * rng.standard_normal((17, 23))
        p = tmp_path / "d.txt"
        write_matrix_to_file(p, DenseMatrix.from_array(a))
        r = reader.read_matrix_from_file(p, np.complex128)
        np.testing.assert_array_equal(np.asarray(r.as_dense()), a)

    def test_native_output_matches_python_writer(self, tmp_path):
        from pcsc_eigenvalue_solver_project_tpu.io import native
        from pcsc_eigenvalue_solver_project_tpu.io import writer as w
        if not native.writer_available():
            pytest.skip("native writer unavailable")
        rng = np.random.default_rng(2)
        a = rng.standard_normal((6, 4))
        m = DenseMatrix.from_array(a)
        p_native = tmp_path / "n.txt"
        w._write_dense(p_native, m)  # native path (writer available)
        # force the python fallback by writing through the raw formatter
        p_py = tmp_path / "p.txt"
        cx = False
        with open(p_py, "w", encoding="utf-8") as f:
            f.write("dense\n")
            f.write(f"{a.shape[0]} {a.shape[1]}\n")
            for r_ in range(a.shape[0]):
                f.write(" ".join(w._fmt(a[r_, c], cx)
                                 for c in range(a.shape[1])) + "\n")
        assert p_native.read_text() == p_py.read_text()
