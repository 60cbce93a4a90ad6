"""Segment-pruned distributed GELL SpMV (parallel/gell_pruned.py).

SURVEY §2: "remote column segments of x fetched via all_gather /
collective_permute, overlapped with local-block compute" for the sparse
``A * x`` hot op (/root/reference/src/power_method/power_method.hpp:69).
Pins: sequential parity on an 8-device fake mesh, comm-scales-with-
footprint-not-n, zero comm for block-diagonal, and the distributed power
solve against the numpy dense oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pcsc_eigenvalue_solver_project_tpu.matrix.sparse import SparseCSR
from pcsc_eigenvalue_solver_project_tpu.core.options import SolverOptions
from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
from pcsc_eigenvalue_solver_project_tpu.parallel.gell_pruned import (
    distributed_gell_power_pruned, partition_gell_pruned, pruned_gell_matvec)


def _banded_plus_longrange(n, bw, n_far, rng, extra_segments=4):
    """Band of halfwidth bw plus n_far/row long-range entries confined to
    ``extra_segments`` fixed 128-column segments — a footprint that does
    NOT grow with n."""
    r_b = np.repeat(np.arange(n), 2 * bw + 1)
    c_b = (r_b + np.tile(np.arange(-bw, bw + 1), n)).clip(0, n - 1)
    far_cols = (rng.integers(0, extra_segments, n * n_far) * 128
                + rng.integers(0, 128, n * n_far)).clip(0, n - 1)
    r_f = np.repeat(np.arange(n), n_far)
    r = np.concatenate([r_b, r_f])
    c = np.concatenate([c_b, far_cols])
    v = rng.standard_normal(len(r)).astype(np.float32)
    key = r.astype(np.int64) * n + c
    _, uniq = np.unique(key, return_index=True)
    return r[uniq], c[uniq], v[uniq]


def _dense_of(r, c, v, n):
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (r, c), v)
    return a


class TestPrunedMatvec:
    def test_matches_sequential_random(self):
        rng = np.random.default_rng(0)
        n = 1100  # not a multiple of 8 * tile_rows: exercises padding
        r = rng.integers(0, n, 9000)
        c = rng.integers(0, n, 9000)
        v = rng.standard_normal(9000).astype(np.float32)
        csr = SparseCSR.from_coo(r, c, v, (n, n), dtype=np.float32)
        mesh = make_row_mesh(8)
        A = partition_gell_pruned(csr, mesh, tile_rows=128)
        x = rng.standard_normal(n).astype(np.float32)
        xp = np.zeros(A.n_padded, np.float32)
        xp[:n] = x
        xs = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P("rows")))
        y = np.asarray(jax.jit(
            lambda a, vv: pruned_gell_matvec(a, vv, mesh))(A, xs))[:n]
        ref = _dense_of(*csr_coo(csr), n) @ x.astype(np.float64)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_comm_scales_with_footprint_not_n(self):
        rng = np.random.default_rng(1)
        mesh = make_row_mesh(8)
        sizes = (4096, 16384)
        comm = []
        for n in sizes:
            r, c, v = _banded_plus_longrange(n, 8, 2, rng)
            csr = SparseCSR.from_coo(r, c, v, (n, n), dtype=np.float32)
            A = partition_gell_pruned(csr, mesh, tile_rows=128)
            comm.append(A.comm_bytes_per_matvec)
            # parity while we're here
            x = rng.standard_normal(n).astype(np.float32)
            xp = np.zeros(A.n_padded, np.float32)
            xp[:n] = x
            xs = jax.device_put(jnp.asarray(xp),
                                NamedSharding(mesh, P("rows")))
            y = np.asarray(pruned_gell_matvec(A, xs, mesh))[:n]
            ref = _dense_of(r, c, v, n) @ x.astype(np.float64)
            assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5
        # footprint per shard: band halo (1-2 segments) + <=4 far segments
        # -> comm must NOT grow linearly with n (all_gather would be
        # (S-1)/S * n * 4 bytes)
        allgather_small = 7 * sizes[0] // 8 * 4
        assert comm[0] <= allgather_small  # tiny n: at worst all_gather volume
        assert comm[1] <= comm[0] + 2 * 128 * 4  # at most boundary jitter
        # comm stays footprint-sized while all_gather grows with n — the
        # margin widens automatically (at n=1M it is ~200x); the hot
        # shard-0 block every shard needs costs one padded segment per
        # mesh distance, so the bar here is 3x, not the asymptotic ratio
        assert comm[1] < 7 * sizes[1] // 8 * 4 // 3

    def test_block_diagonal_no_comm(self):
        rng = np.random.default_rng(2)
        n, S = 2048, 8
        blk = n // S
        r = rng.integers(0, blk, 4000)
        s_of = rng.integers(0, S, 4000)
        c = s_of * blk + rng.integers(0, blk, 4000)
        rr = s_of * blk + r
        v = rng.standard_normal(4000).astype(np.float32)
        csr = SparseCSR.from_coo(rr, c, v, (n, n), dtype=np.float32)
        mesh = make_row_mesh(8)
        A = partition_gell_pruned(csr, mesh, tile_rows=128)
        assert A.comm_bytes_per_matvec == 0
        assert not A.has_remote
        x = rng.standard_normal(n).astype(np.float32)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
        y = np.asarray(pruned_gell_matvec(A, xs, mesh))[:n]
        ref = _dense_of(rr, c, v, n) @ x.astype(np.float64)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_power_matches_oracle(self):
        rng = np.random.default_rng(3)
        n = 2048
        r, c, v = _banded_plus_longrange(n, 4, 1, rng)
        # diagonal dominance -> well-separated dominant eigenvalue
        r = np.concatenate([r, np.arange(n)])
        c = np.concatenate([c, np.arange(n)])
        v = np.concatenate([v, np.full(n, 6.0, np.float32)])
        csr = SparseCSR.from_coo(r, c, v, (n, n), dtype=np.float32)
        mesh = make_row_mesh(8)
        A = partition_gell_pruned(csr, mesh, tile_rows=128)
        res = distributed_gell_power_pruned(
            A, mesh, SolverOptions(max_iterations=2000, tolerance=1e-10),
            x0=np.ones(n, np.float32))
        assert bool(res.converged)
        dense = _dense_of(r, c, v, n)
        ev = np.linalg.eigvals(dense)
        dom = ev[np.argmax(np.abs(ev))]
        assert abs(complex(res.eigenvalue) - dom) / abs(dom) < 1e-4


def csr_coo(csr):
    return np.asarray(csr.rows), np.asarray(csr.indices), np.asarray(csr.data)
