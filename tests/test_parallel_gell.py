"""Distributed packed gather-ELL SpMV tests (8-device CPU fake mesh).

The distributed scaling of the reference's general-sparse hot op
(power_method.hpp:69 with an arbitrary Eigen::SparseMatrix): each shard's
row block is an independent GELL pack; x is all-gathered. Also pins the
halo-path misuse guard: requesting exchange='halo' for an operator wider
than the +/-1-block window must raise, not silently clamp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pcsc_eigenvalue_solver_project_tpu import SolverOptions, SparseCSR, power_method
from pcsc_eigenvalue_solver_project_tpu.parallel.gell import (
    distributed_gell_matvec, partition_gell)
from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh, row_sharding
from pcsc_eigenvalue_solver_project_tpu.parallel.sharded import (
    distributed_matvec, partition_ell)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_row_mesh(8)


def _random_csr(rng, n, nnz, dtype=np.float32):
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz).astype(dtype)
    return SparseCSR.from_coo(r, c, v, (n, n)), r, c, v


class TestPartitionedGELL:
    def test_matches_sequential(self, mesh):
        rng = np.random.default_rng(0)
        n = 1100  # not a multiple of 8 * tile_rows: exercises padding
        csr, *_ = _random_csr(rng, n, 20_000)
        A = partition_gell(csr, mesh, tile_rows=128)
        assert A.n_padded % (8 * 128) == 0
        x = rng.standard_normal(n).astype(np.float32)
        xp = jnp.asarray(np.pad(x, (0, A.n_padded - n)))
        xp = jax.device_put(xp, row_sharding(mesh))
        y = jax.jit(lambda a, v: distributed_gell_matvec(a, v, mesh))(A, xp)
        ref = np.asarray(csr.matvec(jnp.asarray(x)))
        got = np.asarray(y)[:n]
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
        # padding rows produce zeros
        np.testing.assert_array_equal(np.asarray(y)[n:], 0.0)

    @pytest.mark.slow
    def test_spill_padding_harmless(self, mesh):
        # concentrate >128 unique entries in one lane bucket of shard 0's
        # first tile -> slot overflow -> uneven per-shard spills, padded tails
        rng = np.random.default_rng(1)
        n = 1024
        rr, cc = np.meshgrid(np.arange(128), 128 * np.arange(8), indexing="ij")
        r, c = rr.ravel(), cc.ravel()           # 1024 entries, all bucket l=0
        v = rng.standard_normal(r.size).astype(np.float32)
        csr = SparseCSR.from_coo(r, c, v, (n, n))
        A = partition_gell(csr, mesh, tile_rows=128)
        assert A.sp_rows.shape[1] > 0
        x = rng.standard_normal(n).astype(np.float32)
        xs = jax.device_put(jnp.asarray(x), row_sharding(mesh))
        y = distributed_gell_matvec(A, xs, mesh)
        np.testing.assert_allclose(np.asarray(y), np.asarray(csr.matvec(jnp.asarray(x))),
                                   rtol=2e-5, atol=1e-5)

    def test_power_method_matches_single_chip(self, mesh, key):
        from pcsc_eigenvalue_solver_project_tpu.parallel.gell import (
            distributed_gell_power_method)
        rng = np.random.default_rng(2)
        n = 512
        a = rng.standard_normal((n, n)).astype(np.float32) * 0.05
        a[np.diag_indices(n)] += np.linspace(1.0, 4.0, n, dtype=np.float32)
        a = (a + a.T) / 2
        csr = SparseCSR.from_dense(a)
        A = partition_gell(csr, mesh, tile_rows=128)
        opts = SolverOptions(tolerance=1e-6, max_iterations=2000)
        res_d = distributed_gell_power_method(A, mesh, opts, key=key)
        res_s = power_method(csr, opts, key=key)
        np.testing.assert_allclose(float(np.real(res_d.eigenvalue)),
                                   float(np.real(res_s.eigenvalue)), rtol=1e-4)
        assert bool(res_d.converged)

    def test_non_square_rejected(self, mesh):
        m = SparseCSR.from_coo([0], [1], [np.float32(1.0)], (2, 3))
        with pytest.raises(ValueError, match="square"):
            partition_gell(m, mesh)


class TestHaloGuard:
    def test_halo_misuse_raises(self, mesh):
        # a matrix with a far off-band entry: halo_ok is False; forcing the
        # halo path must fail loudly instead of returning clamped junk
        rng = np.random.default_rng(3)
        n = 256
        r = np.arange(n)
        c = (r + n // 2) % n  # column half the matrix away
        v = rng.standard_normal(n)
        m = SparseCSR.from_coo(r, c, v, (n, n))
        A = partition_ell(m, mesh)
        assert not A.halo_ok
        x = jax.device_put(jnp.asarray(rng.standard_normal(A.n_padded)),
                           row_sharding(mesh))
        with pytest.raises(ValueError, match="halo"):
            distributed_matvec(A, x, mesh, exchange="halo")
        # auto falls back to all_gather and is correct
        y = distributed_matvec(A, x, mesh, exchange="auto")
        ref = np.asarray(m.matvec(x[:n]))
        np.testing.assert_allclose(np.asarray(y)[:n], ref, rtol=1e-10)
