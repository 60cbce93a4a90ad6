"""Text matrix writer — emits the reference file format.

The reference has no writer; this exists for test-data generation and for
round-tripping the 100K/1M-row bench matrices. Output is readable by both
this framework's reader and the reference's
``readMatrixFromFile`` (/root/reference/src/reader/file_matrix_reader.hpp).
"""

from __future__ import annotations

import numpy as np

from ..core.dtypes import is_complex_dtype
from ..matrix.dense import DenseMatrix
from ..matrix.sparse import SparseCSR


def _fmt(v, complex_entries: bool) -> str:
    if complex_entries:
        return f"{v.real:.17g} {v.imag:.17g}"
    return f"{v:.17g}"


def write_matrix_to_file(filename, matrix) -> None:
    if isinstance(matrix, DenseMatrix):
        _write_dense(filename, matrix)
    elif isinstance(matrix, SparseCSR):
        _write_sparse(filename, matrix)
    else:
        raise TypeError(f"write_matrix_to_file: unsupported matrix type {type(matrix).__name__}")


def _write_dense(filename, m: DenseMatrix) -> None:
    a = np.asarray(m.array)
    cx = is_complex_dtype(a.dtype)
    try:
        from . import native
        if native.writer_available():
            native.write_dense(filename, a)
            return
    except ImportError:
        pass
    with open(filename, "w", encoding="utf-8") as f:
        f.write("dense\n")
        f.write(f"{a.shape[0]} {a.shape[1]}\n")
        for r in range(a.shape[0]):
            f.write(" ".join(_fmt(a[r, c], cx) for c in range(a.shape[1])) + "\n")


def _write_sparse(filename, m: SparseCSR) -> None:
    rows = np.asarray(m.rows)
    cols = np.asarray(m.indices)
    data = np.asarray(m.data)
    cx = is_complex_dtype(data.dtype)
    try:
        from . import native
        if native.writer_available():
            native.write_sparse(filename, m.shape, rows, cols, data)
            return
    except ImportError:
        pass
    with open(filename, "w", encoding="utf-8") as f:
        f.write("sparse\n")
        f.write(f"{m.shape[0]} {m.shape[1]}\n")
        f.write(f"{len(data)}\n")
        # vectorised row formatting (the 1M-row bench files)
        if cx:
            stacked = np.column_stack([rows, cols, data.real, data.imag])
            np.savetxt(f, stacked, fmt=["%d", "%d", "%.17g", "%.17g"])
        else:
            stacked = np.column_stack([rows, cols, data])
            np.savetxt(f, stacked, fmt=["%d", "%d", "%.17g"])
