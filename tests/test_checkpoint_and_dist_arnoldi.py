"""Checkpoint/resume + distributed-Arnoldi tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import SolverOptions, power_method
from pcsc_eigenvalue_solver_project_tpu.models.generators import (
    banded_random, laplacian_1d)
from pcsc_eigenvalue_solver_project_tpu.parallel.arnoldi import (
    distributed_arnoldi_eigenvalues)
from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
from pcsc_eigenvalue_solver_project_tpu.parallel.sharded import partition_ell
from pcsc_eigenvalue_solver_project_tpu.solvers.arnoldi import arnoldi_eigenvalues
from pcsc_eigenvalue_solver_project_tpu.utils.checkpoint import (
    power_method_checkpointed, restore_state)


@pytest.fixture(scope="module")
def mesh():
    return make_row_mesh(8)


class TestCheckpointedPower:
    def test_matches_uninterrupted(self, tmp_path):
        m = laplacian_1d(64)
        opts = SolverOptions(tolerance=1e-10, max_iterations=5000)
        key = jax.random.key(7)
        ref = power_method(m, opts, key=key)
        res = power_method_checkpointed(m, opts, checkpoint_dir=str(tmp_path),
                                        chunk=100, key=key)
        assert complex(res.eigenvalue) == complex(ref.eigenvalue)
        assert int(res.iterations) == int(ref.iterations)

    def test_resume_after_interruption(self, tmp_path):
        m = laplacian_1d(64)
        key = jax.random.key(7)
        ref = power_method(m, SolverOptions(tolerance=1e-10, max_iterations=5000),
                           key=key)
        # phase 1: budget-capped run leaves a checkpoint behind
        part = power_method_checkpointed(
            m, SolverOptions(tolerance=1e-10, max_iterations=300),
            checkpoint_dir=str(tmp_path), chunk=100, key=key)
        assert not bool(part.converged)
        assert restore_state(str(tmp_path / "power_state")) is not None
        # phase 2: full budget resumes from iteration 300
        res = power_method_checkpointed(
            m, SolverOptions(tolerance=1e-10, max_iterations=5000),
            checkpoint_dir=str(tmp_path), chunk=100, key=key)
        assert bool(res.converged)
        assert complex(res.eigenvalue) == complex(ref.eigenvalue)
        assert int(res.iterations) == int(ref.iterations)


class TestDistributedArnoldi:
    def test_matches_single_chip(self, mesh, key):
        n = 96
        m = banded_random(n, bandwidth=3, nnz_per_row=4, seed=11)
        A = partition_ell(m, mesh)
        x0 = np.asarray(jax.random.uniform(key, (n,), jnp.float64, minval=-1, maxval=1))
        seq = arnoldi_eigenvalues(m, k=4, m=30, x0=x0)
        dist = distributed_arnoldi_eigenvalues(A, mesh, k=4, m=30, x0=x0)
        got = np.sort_complex(np.asarray(dist.eigenvalues))
        exp = np.sort_complex(np.asarray(seq.eigenvalues))
        np.testing.assert_allclose(got, exp, rtol=1e-8, atol=1e-10)

    def test_against_dense_oracle(self, mesh, key):
        n = 120
        m = banded_random(n, bandwidth=2, nnz_per_row=3, seed=13)
        A = partition_ell(m, mesh)
        res = distributed_arnoldi_eigenvalues(A, mesh, k=2, m=50, key=key)
        exact = np.linalg.eigvals(np.asarray(m.to_dense()))
        exact = exact[np.argsort(-np.abs(exact))]
        got = np.asarray(res.eigenvalues)
        for e in exact[:2]:
            assert min(abs(got - e)) < 1e-6

    def test_padded_size(self, mesh, key):
        # n not divisible by 8: padded rows must not pollute Ritz values
        n = 50
        m = banded_random(n, bandwidth=2, nnz_per_row=3, seed=17, diag_boost=3.0)
        A = partition_ell(m, mesh)
        res = distributed_arnoldi_eigenvalues(A, mesh, k=2, m=50, key=key)
        exact = np.linalg.eigvals(np.asarray(m.to_dense()))
        exact = exact[np.argsort(-np.abs(exact))]
        got = np.asarray(res.eigenvalues)
        for e in exact[:2]:
            assert min(abs(got - e)) < 1e-6


class TestDistributedCheckpointedPower:
    """Distributed interleaved checkpointed power: bit-identical to the
    uninterrupted run, including across a simulated preemption."""

    def test_matches_uninterrupted_and_resumes(self, tmp_path):
        from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_full
        from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
        from pcsc_eigenvalue_solver_project_tpu.parallel.dia import (
            distributed_dia_il_power_method, partition_dia_il)
        from pcsc_eigenvalue_solver_project_tpu.utils.checkpoint import (
            distributed_dia_il_power_checkpointed)

        mesh = make_row_mesh(8)
        dia = banded_full(6000, bandwidth=5, dtype=np.float32, seed=6)
        A = partition_dia_il(dia, mesh)
        opts = SolverOptions(max_iterations=500, tolerance=1e-7)
        key = jax.random.key(2)

        ref = distributed_dia_il_power_method(A, mesh, opts, key=key)

        # "preempted" run: budget stops mid-solve, state is on disk
        partial_opts = SolverOptions(max_iterations=60, tolerance=1e-7)
        distributed_dia_il_power_checkpointed(
            A, mesh, partial_opts, checkpoint_dir=str(tmp_path), chunk=25,
            key=key)
        # resume with the full budget: must land exactly where the
        # uninterrupted run does
        r = distributed_dia_il_power_checkpointed(
            A, mesh, opts, checkpoint_dir=str(tmp_path), chunk=100, key=key)
        assert int(r.iterations) == int(ref.iterations)
        assert bool(r.converged) == bool(ref.converged)
        np.testing.assert_allclose(float(r.eigenvalue),
                                   float(ref.eigenvalue), rtol=0, atol=0)
