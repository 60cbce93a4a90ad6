"""Distributed-layer tests on the 8-device CPU fake mesh.

The reference has zero parallelism (SURVEY.md §2); these tests pin down the
new framework's distributed contract: partitioned SpMV (both exchange
strategies) matches the sequential SpMV exactly, and the distributed power
method matches the single-chip solver's eigenvalue, iteration count, and
convergence flag bit-for-bit in semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pcsc_eigenvalue_solver_project_tpu import SolverOptions, SparseCSR, power_method
from pcsc_eigenvalue_solver_project_tpu.models.generators import (
    banded_random, laplacian_1d)
from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
from pcsc_eigenvalue_solver_project_tpu.parallel.power import distributed_power_method
from pcsc_eigenvalue_solver_project_tpu.parallel.sharded import (
    distributed_matvec, partition_ell)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 fake CPU devices"
    return make_row_mesh(8)


class TestPartitioning:
    def test_pads_to_multiple(self, mesh):
        m = laplacian_1d(100)
        A = partition_ell(m, mesh)
        assert A.n_padded % 8 == 0
        assert A.n_orig == 100

    def test_halo_detected_for_banded(self, mesh):
        A = partition_ell(laplacian_1d(128), mesh)
        assert A.halo_ok  # bandwidth 1 << 16 rows/shard

    def test_halo_rejected_for_wide(self, mesh):
        # entry 3 blocks off the diagonal (and not cyclically adjacent)
        m = SparseCSR.from_coo([0, 56], [56, 0], [1.0, 1.0], (128, 128))
        A = partition_ell(m, mesh)
        assert not A.halo_ok

    def test_halo_ok_for_periodic_corner(self, mesh):
        # cyclic band: corner entries touch the wrapped neighbor block,
        # which the ppermute ring covers
        m = SparseCSR.from_coo([0, 127], [127, 0], [1.0, 1.0], (128, 128))
        A = partition_ell(m, mesh)
        assert A.halo_ok


class TestDistributedSpMV:
    @pytest.mark.parametrize("exchange", ["all_gather", "halo"])
    def test_matches_sequential(self, mesh, exchange):
        n = 96
        m = laplacian_1d(n)
        A = partition_ell(m, mesh)
        rng = np.random.default_rng(0)
        x = rng.random(A.n_padded)
        x[n:] = 0.0
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
        y = np.asarray(distributed_matvec(A, xs, mesh, exchange=exchange))
        expected = np.asarray(m.matvec(jnp.asarray(x[:n])))
        np.testing.assert_allclose(y[:n], expected, rtol=1e-13)
        np.testing.assert_allclose(y[n:], 0.0)

    def test_general_matrix_all_gather(self, mesh):
        n = 64
        m = banded_random(n, bandwidth=40, nnz_per_row=5, seed=3)  # wide band
        A = partition_ell(m, mesh)
        rng = np.random.default_rng(1)
        x = rng.random(A.n_padded)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
        y = np.asarray(distributed_matvec(A, xs, mesh, exchange="all_gather"))
        expected = np.asarray(m.matvec(jnp.asarray(x[:n])))
        np.testing.assert_allclose(y[:n], expected, rtol=1e-12)

    def test_complex(self, mesh):
        n = 48
        m = banded_random(n, bandwidth=3, nnz_per_row=4, dtype=np.complex128, seed=5)
        A = partition_ell(m, mesh)
        rng = np.random.default_rng(2)
        x = (rng.random(A.n_padded) + 1j * rng.random(A.n_padded))
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
        y = np.asarray(distributed_matvec(A, xs, mesh))
        expected = np.asarray(m.matvec(jnp.asarray(x[:n])))
        np.testing.assert_allclose(y[:n], expected, rtol=1e-12)


class TestDistributedPower:
    @pytest.mark.parametrize("exchange", ["all_gather", "halo"])
    def test_matches_single_chip(self, mesh, exchange, key):
        n = 96
        m = laplacian_1d(n)
        A = partition_ell(m, mesh)
        x0 = np.asarray(jax.random.uniform(key, (n,), jnp.float64, minval=-1, maxval=1))

        seq = power_method(m, SolverOptions(tolerance=1e-10), x0=x0)
        dist = distributed_power_method(A, mesh, SolverOptions(tolerance=1e-10),
                                        exchange=exchange, x0=x0)
        np.testing.assert_allclose(complex(dist.eigenvalue), complex(seq.eigenvalue),
                                   rtol=1e-10)
        assert int(dist.iterations) == int(seq.iterations)
        assert bool(dist.converged) == bool(seq.converged)
        # eigenvector parity (up to the padding tail)
        v_d = np.asarray(dist.eigenvector)[:n]
        v_s = np.asarray(seq.eigenvector)
        np.testing.assert_allclose(np.abs(np.vdot(v_d, v_s)), 1.0, rtol=1e-8)

    def test_analytic_eigenvalue(self, mesh):
        n = 64
        A = partition_ell(laplacian_1d(n), mesh)
        res = distributed_power_method(A, mesh, SolverOptions(tolerance=1e-12,
                                                              max_iterations=20000))
        lam_max = 2 - 2 * np.cos(n * np.pi / (n + 1))
        assert bool(res.converged)
        np.testing.assert_allclose(float(np.real(res.eigenvalue)), lam_max, rtol=1e-6)

    def test_non_divisible_size(self, mesh, key):
        # 50 rows over 8 shards: padding path
        m = banded_random(50, bandwidth=2, nnz_per_row=3, seed=9, diag_boost=5.0)
        A = partition_ell(m, mesh)
        res = distributed_power_method(A, mesh, SolverOptions(tolerance=1e-10), key=key)
        seq = power_method(m, SolverOptions(tolerance=1e-10), key=key)
        np.testing.assert_allclose(complex(res.eigenvalue), complex(seq.eigenvalue),
                                   rtol=1e-8)


class TestDistributedKrylovSchur:
    def test_clustered_spectrum_converges_where_fixed_m_fails(self, key):
        """VERDICT r3 task 7 distributed leg: shard-mapped Krylov-Schur
        basis extension + host ordered-Schur contraction."""
        from pcsc_eigenvalue_solver_project_tpu.parallel.arnoldi import (
            distributed_arnoldi_eigenvalues,
            distributed_krylov_schur_eigenvalues)
        mesh = make_row_mesh()
        rng = np.random.default_rng(0)
        n = 320
        diag = np.concatenate([[5.0, 4.9995, 4.999],
                               rng.uniform(0, 4.0, n - 3)])
        rows, cols, vals = [], [], []
        for i in range(n):
            rows.append(i); cols.append(i); vals.append(diag[i])
            for off in (-3, 2):
                j = i + off
                if 0 <= j < n:
                    rows.append(i); cols.append(j)
                    vals.append(0.01 * rng.standard_normal())
        csr = SparseCSR.from_coo(np.array(rows), np.array(cols),
                                 np.array(vals, np.float64), (n, n),
                                 dtype=np.float64)
        A = partition_ell(csr, mesh)
        truth = np.sort(np.linalg.eigvals(
            np.asarray(csr.to_dense())).real)[::-1][:3]
        opts = SolverOptions(tolerance=1e-8)
        fixed = distributed_arnoldi_eigenvalues(A, mesh, k=3, m=15,
                                                opts=opts, key=key)
        fe = np.abs(np.sort(np.asarray(fixed.eigenvalues.real))[::-1]
                    - truth).max()
        ks = distributed_krylov_schur_eigenvalues(A, mesh, k=3, m=15,
                                                  opts=opts, key=key)
        ke = np.abs(np.sort(np.asarray(ks.eigenvalues.real))[::-1]
                    - truth).max()
        assert fe > 1e-3
        assert bool(ks.converged)
        assert ke < 1e-7
