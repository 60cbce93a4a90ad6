"""Distributed Krylov + distributed shifted-inverse-power tests (fake mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import ShiftedSolverOptions, SparseCSR
from pcsc_eigenvalue_solver_project_tpu.models.generators import (
    banded_random, laplacian_1d)
from pcsc_eigenvalue_solver_project_tpu.parallel.krylov import bicgstab
from pcsc_eigenvalue_solver_project_tpu.parallel.inverse_power import (
    distributed_shifted_inverse_power)
from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
from pcsc_eigenvalue_solver_project_tpu.parallel.sharded import partition_ell
from pcsc_eigenvalue_solver_project_tpu.solvers.inverse_power import (
    shifted_inverse_power_method)


@pytest.fixture(scope="module")
def mesh():
    return make_row_mesh(8)


class TestBicgstab:
    def test_single_chip_solve(self):
        rng = np.random.default_rng(0)
        n = 40
        a = np.diag(rng.random(n) + 3.0)
        a += 0.1 * rng.random((n, n))
        b = rng.random(n)
        x, res, k = bicgstab(lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
                             vdot=jnp.vdot, norm=jnp.linalg.norm, tol=1e-12)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b),
                                   rtol=1e-8, atol=1e-10)
        assert float(res) <= 1e-10 * np.linalg.norm(b) + 1e-12

    def test_preconditioned(self):
        rng = np.random.default_rng(1)
        n = 50
        d = rng.random(n) * 100 + 1
        a = np.diag(d) + 0.01 * rng.random((n, n))
        b = rng.random(n)
        precond = lambda v: v / jnp.asarray(d)
        x, res, k_pre = bicgstab(lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
                                 vdot=jnp.vdot, norm=jnp.linalg.norm,
                                 precond=precond, tol=1e-12)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b),
                                   rtol=1e-7, atol=1e-9)

    def test_complex(self):
        rng = np.random.default_rng(2)
        n = 20
        a = np.diag(rng.random(n) + 2 + 1j) + 0.05 * (rng.random((n, n)) + 1j * rng.random((n, n)))
        b = rng.random(n) + 1j * rng.random(n)
        x, res, _ = bicgstab(lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
                             vdot=jnp.vdot, norm=jnp.linalg.norm, tol=1e-12)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b),
                                   rtol=1e-7, atol=1e-9)


class TestDistributedInversePower:
    @pytest.mark.parametrize("exchange", ["all_gather", "halo"])
    def test_matches_single_chip(self, mesh, exchange, key):
        n = 96
        m = laplacian_1d(n)
        A = partition_ell(m, mesh)
        x0 = np.asarray(jax.random.uniform(key, (n,), jnp.float64, minval=-1, maxval=1))
        opts = ShiftedSolverOptions(shift=0.7, tolerance=1e-10,
                                    inner_method="bicgstab", inner_tolerance=1e-13)
        seq = shifted_inverse_power_method(m, opts, x0=x0)
        dist = distributed_shifted_inverse_power(A, mesh, opts, exchange=exchange,
                                                 x0=x0)
        assert bool(dist.converged)
        np.testing.assert_allclose(complex(dist.eigenvalue), complex(seq.eigenvalue),
                                   rtol=1e-7)

    def test_targets_nearest_eigenvalue(self, mesh, key):
        # laplacian_1d spectrum: 2 - 2cos(k pi / (n+1)); pick an interior one
        n = 64
        A = partition_ell(laplacian_1d(n), mesh)
        eigs = 2 - 2 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
        target = eigs[20]
        opts = ShiftedSolverOptions(shift=float(target) + 1e-3, tolerance=1e-12,
                                    inner_tolerance=1e-13)
        res = distributed_shifted_inverse_power(A, mesh, opts, key=key)
        assert bool(res.converged)
        np.testing.assert_allclose(float(np.real(res.eigenvalue)), target, rtol=1e-7)

    def test_padding_rows_not_excited(self, mesh, key):
        # 50 rows over 8 shards: padded operator has spurious zero
        # eigenvalues; with zero-initialised pads they must stay dark even
        # when the shift is near zero
        m = banded_random(50, bandwidth=2, nnz_per_row=3, seed=9, diag_boost=4.0)
        A = partition_ell(m, mesh)
        opts = ShiftedSolverOptions(shift=0.05, tolerance=1e-10,
                                    inner_tolerance=1e-13)
        res = distributed_shifted_inverse_power(A, mesh, opts, key=key)
        v = np.asarray(res.eigenvector)
        assert np.abs(v[50:]).max() == 0.0
        # eigenvalue must belong to the true spectrum, not be ~0 spurious
        eigs = np.linalg.eigvals(np.asarray(m.to_dense()))
        assert min(abs(eigs - complex(res.eigenvalue))) < 1e-5
