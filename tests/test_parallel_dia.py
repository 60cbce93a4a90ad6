"""Distributed DIA (banded halo) operator tests on the fake mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pcsc_eigenvalue_solver_project_tpu import SolverOptions, power_method
from pcsc_eigenvalue_solver_project_tpu.matrix.dia import SparseDIA
from pcsc_eigenvalue_solver_project_tpu.models.generators import (
    banded_full, laplacian_1d)
from pcsc_eigenvalue_solver_project_tpu.parallel.dia import (
    distributed_dia_matvec, distributed_dia_power_method, partition_dia)
from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_row_mesh(8)


class TestPartitionedDIA:
    def test_matvec_matches_sequential(self, mesh):
        n = 96
        m = SparseDIA.from_csr(laplacian_1d(n))
        A = partition_dia(m, mesh)
        rng = np.random.default_rng(0)
        x = np.zeros(A.n_padded)
        x[:n] = rng.random(n)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
        y = np.asarray(distributed_dia_matvec(A, xs, mesh))
        expected = np.asarray(m.matvec(jnp.asarray(x[:n])))
        np.testing.assert_allclose(y[:n], expected, rtol=1e-13)
        np.testing.assert_allclose(y[n:], 0.0)

    def test_wide_band(self, mesh):
        # bandwidth close to rows_per_shard exercises deep halos
        n = 128
        m = banded_full(n, bandwidth=10, dtype=np.float64, seed=3)
        A = partition_dia(m, mesh)
        rng = np.random.default_rng(1)
        x = rng.random(A.n_padded)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
        y = np.asarray(distributed_dia_matvec(A, xs, mesh))
        expected = np.asarray(m.matvec(jnp.asarray(x[:n])))
        np.testing.assert_allclose(y[:n], expected, rtol=1e-12)

    def test_bandwidth_exceeds_shard_rejected(self, mesh):
        m = banded_full(64, bandwidth=10, dtype=np.float64, seed=4)  # rps=8
        with pytest.raises(ValueError, match="bandwidth .10. exceeds rows per shard"):
            partition_dia(m, mesh)

    def test_power_matches_single_chip(self, mesh, key):
        n = 96
        m = SparseDIA.from_csr(laplacian_1d(n))
        A = partition_dia(m, mesh)
        x0 = np.asarray(jax.random.uniform(key, (n,), jnp.float64, minval=-1, maxval=1))
        seq = power_method(m, SolverOptions(tolerance=1e-10), x0=x0)
        dist = distributed_dia_power_method(A, mesh, SolverOptions(tolerance=1e-10),
                                            x0=x0)
        np.testing.assert_allclose(complex(dist.eigenvalue), complex(seq.eigenvalue),
                                   rtol=1e-10)
        assert int(dist.iterations) == int(seq.iterations)
        assert bool(dist.converged) == bool(seq.converged)

    def test_non_divisible(self, mesh, key):
        n = 50
        m = banded_full(n, bandwidth=2, dtype=np.float64, seed=5, diag_boost=4.0)
        A = partition_dia(m, mesh)
        res = distributed_dia_power_method(A, mesh, SolverOptions(tolerance=1e-10),
                                           key=key)
        seq = power_method(m, SolverOptions(tolerance=1e-10), key=key)
        np.testing.assert_allclose(complex(res.eigenvalue), complex(seq.eigenvalue),
                                   rtol=1e-8)
