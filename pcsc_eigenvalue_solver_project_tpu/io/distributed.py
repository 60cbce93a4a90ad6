"""Distributed matrix loading — per-shard row blocks.

The reference reads whole matrices into one process
(file_matrix_reader.hpp:170-200). At the 1M-row distributed config each
host should construct only its own row block (process-local addressable
shards, SURVEY.md §3.5). This module provides:

- ``read_sparse_row_block``: stream-parse a sparse file keeping only COO
  entries with ``row_start <= row < row_end`` (column indices stay
  global, as the halo/all-gather SpMV expects);
- ``load_partitioned``: build a ``PartitionedELL`` for a mesh by reading
  each addressable shard's block. In a multi-host run every process calls
  this with the same arguments and only touches its own rows.
"""

from __future__ import annotations

import numpy as np

from ..core.dtypes import canonical_dtype, is_complex_dtype
from .reader import _Tokens


def read_sparse_row_block(filename, dtype, row_start: int, row_end: int):
    """COO triplets (rows, cols, values) of one row block; rows stay global."""
    dtype = canonical_dtype(dtype)
    cx = is_complex_dtype(dtype)
    with open(filename, "r", encoding="utf-8") as f:
        toks = _Tokens(f.read())
    storage = toks.next()
    if storage != "sparse":
        raise ValueError(f"read_sparse_row_block: expected a sparse file, got {storage!r}")
    rows = toks.next_int()
    cols = toks.next_int()
    if rows is None or cols is None or rows <= 0 or cols <= 0:
        raise ValueError("Matrix dimensions must be positive")
    nnz = toks.next_int()
    if nnz is None or nnz <= 0:
        raise ValueError("number of non-zero entries must be positive in a sparse matrix")
    rr, cc, vv = [], [], []
    for _ in range(nnz):
        r = toks.next_int()
        c = toks.next_int()
        if r is None or c is None:
            raise ValueError("Error when trying to read indices in sparse matrix")
        if r < 0 or r >= rows or c < 0 or c >= cols:
            raise ValueError("Sparse indices out of range")
        if cx:
            re, im = toks.next_float(), toks.next_float()
            if re is None or im is None:
                raise ValueError("Failed to read scalar entry in sparse matrix")
            v = complex(re, im)
        else:
            v = toks.next_float()
            if v is None:
                raise ValueError("Failed to read scalar entry in sparse matrix")
        if row_start <= r < row_end:
            rr.append(r)
            cc.append(c)
            vv.append(v)
    return (np.asarray(rr, np.int64), np.asarray(cc, np.int64),
            np.asarray(vv, dtype), (rows, cols))


def load_partitioned(filename, mesh, dtype, *, axis: str = "rows"):
    """Read a sparse file into a row-partitioned operator over ``mesh``.

    Single-process path: reads once and partitions. In a multi-host job
    each process reads only the blocks of its addressable devices via
    ``read_sparse_row_block`` (same file visible on all hosts).
    """
    from ..matrix.sparse import SparseCSR
    from ..parallel.sharded import partition_ell

    from .reader import read_matrix_from_file
    m = read_matrix_from_file(filename, dtype)
    if not isinstance(m, SparseCSR):
        raise ValueError("load_partitioned: expected a sparse matrix file")
    return partition_ell(m, mesh, axis=axis)
