"""ctypes bindings to the native C++ matrix parser (native/fast_reader.cpp).

Builds the shared library on first use (g++ via the Makefile) and caches
it; every failure — missing toolchain, failed compile, missing symbols —
falls back silently to the pure-Python tokenizer in reader.py, which
implements the identical grammar and error messages.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..core.dtypes import canonical_dtype, is_complex_dtype

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libfast_reader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO_PATH)
            lib.eigsol_read_header.restype = ctypes.c_int
            lib.eigsol_read_header.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long), ctypes.c_char_p, ctypes.c_int]
            lib.eigsol_read_dense.restype = ctypes.c_int
            lib.eigsol_read_dense.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_char_p, ctypes.c_int]
            lib.eigsol_read_sparse.restype = ctypes.c_int
            lib.eigsol_read_sparse.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.c_long,
                ctypes.c_long, ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_char_p, ctypes.c_int]
            # writer symbols (absent in a stale cached .so -> rebuild next
            # clean checkout; bindings stay optional)
            try:
                lib.eigsol_write_dense.restype = ctypes.c_int
                lib.eigsol_write_dense.argtypes = [
                    ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
                    ctypes.c_int]
                lib.eigsol_write_sparse.restype = ctypes.c_int
                lib.eigsol_write_sparse.argtypes = [
                    ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                    ctypes.c_long, ctypes.POINTER(ctypes.c_long),
                    ctypes.POINTER(ctypes.c_long),
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
                    ctypes.c_int]
                lib._has_writer = True
            except AttributeError:
                lib._has_writer = False
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


_ERRLEN = 512


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _lp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def read_matrix_from_file(filename, dtype):
    """Native-parse a matrix file; raises ValueError with reference-parity
    messages on malformed input. Returns DenseMatrix or SparseCSR."""
    from ..matrix.dense import DenseMatrix
    from ..matrix.sparse import SparseCSR

    lib = _load()
    if lib is None:
        raise ImportError("native reader unavailable")
    dtype = canonical_dtype(dtype)
    cx = is_complex_dtype(dtype)
    path = os.fspath(filename).encode()
    err = ctypes.create_string_buffer(_ERRLEN)
    storage = ctypes.c_int()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    nnz = ctypes.c_long()
    if lib.eigsol_read_header(path, ctypes.byref(storage), ctypes.byref(rows),
                              ctypes.byref(cols), ctypes.byref(nnz), err, _ERRLEN):
        raise ValueError(err.value.decode())

    if storage.value == 0:
        total = rows.value * cols.value
        re = np.empty(total, np.float64)
        im = np.empty(total, np.float64) if cx else np.empty(0, np.float64)
        if lib.eigsol_read_dense(path, int(cx), rows.value, cols.value,
                                 _dp(re), _dp(im), err, _ERRLEN):
            raise ValueError(err.value.decode())
        arr = (re + 1j * im) if cx else re
        return DenseMatrix.from_array(
            arr.reshape(rows.value, cols.value).astype(dtype), dtype=dtype)

    rr = np.empty(nnz.value, np.int64)
    cc = np.empty(nnz.value, np.int64)
    re = np.empty(nnz.value, np.float64)
    im = np.empty(nnz.value, np.float64) if cx else np.empty(0, np.float64)
    if lib.eigsol_read_sparse(path, int(cx), rows.value, cols.value, nnz.value,
                              _lp(rr), _lp(cc), _dp(re), _dp(im), err, _ERRLEN):
        raise ValueError(err.value.decode())
    vals = (re + 1j * im) if cx else re
    return SparseCSR.from_coo(rr, cc, vals.astype(dtype),
                              (rows.value, cols.value), dtype=dtype,
                              sum_duplicates=False)


def writer_available() -> bool:
    lib = _load()
    return lib is not None and getattr(lib, "_has_writer", False)


_NULL_DP = ctypes.POINTER(ctypes.c_double)()


def write_dense(filename, array: np.ndarray) -> None:
    """Native dense write (reference grammar); raises OSError on failure."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_writer", False):
        raise ImportError("native writer unavailable")
    a = np.ascontiguousarray(array)
    cx = is_complex_dtype(a.dtype)
    re = np.ascontiguousarray(a.real if cx else a, np.float64)
    im = np.ascontiguousarray(a.imag, np.float64) if cx else None
    err = ctypes.create_string_buffer(_ERRLEN)
    rc = lib.eigsol_write_dense(
        os.fspath(filename).encode(), a.shape[0], a.shape[1], _dp(re),
        _dp(im) if cx else _NULL_DP, err, _ERRLEN)
    if rc:
        raise OSError(err.value.decode())


def write_sparse(filename, shape, rows: np.ndarray, cols: np.ndarray,
                 data: np.ndarray) -> None:
    """Native sparse (COO triplet) write; raises OSError on failure."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_writer", False):
        raise ImportError("native writer unavailable")
    cx = is_complex_dtype(data.dtype)
    rr = np.ascontiguousarray(rows, np.int64)
    cc = np.ascontiguousarray(cols, np.int64)
    re = np.ascontiguousarray(data.real if cx else data, np.float64)
    im = np.ascontiguousarray(data.imag, np.float64) if cx else None
    err = ctypes.create_string_buffer(_ERRLEN)
    rc = lib.eigsol_write_sparse(
        os.fspath(filename).encode(), shape[0], shape[1], len(re), _lp(rr),
        _lp(cc), _dp(re), _dp(im) if cx else _NULL_DP, err, _ERRLEN)
    if rc:
        raise OSError(err.value.decode())
