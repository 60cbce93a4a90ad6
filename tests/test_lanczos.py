"""Lanczos (symmetric/Hermitian top-k) — single-chip, interleaved, and
distributed variants, with Ritz-residual convergence honesty."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pcsc_eigenvalue_solver_project_tpu as es
from pcsc_eigenvalue_solver_project_tpu.matrix.dia import SparseDIA
from pcsc_eigenvalue_solver_project_tpu.matrix.sparse import SparseCSR
from pcsc_eigenvalue_solver_project_tpu.models.generators import laplacian_1d
from pcsc_eigenvalue_solver_project_tpu.parallel.dia import (
    partition_dia, partition_dia_il)
from pcsc_eigenvalue_solver_project_tpu.parallel.lanczos import (
    distributed_lanczos_eigenvalues)
from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
from pcsc_eigenvalue_solver_project_tpu.parallel.sharded import partition_ell


def sym_banded(n, bw, seed, boost, dtype=np.float64):
    """Random symmetric band with a boosted (separated) diagonal head."""
    rng = np.random.default_rng(seed)
    offs = tuple(range(-bw, bw + 1))
    data = np.zeros((len(offs), n), dtype)
    for d, off in enumerate(offs):
        if off < 0:
            continue
        v = rng.uniform(-0.5, 0.5, n).astype(dtype)
        if off > 0:
            v[n - off:] = 0
        data[d] = v
        if off > 0:
            data[offs.index(-off), off:] = v[:n - off]
    data[bw] += np.asarray(boost, dtype)
    return SparseDIA(data=jnp.asarray(data), offsets=offs, shape=(n, n))


@pytest.fixture(scope="module")
def operator():
    boost = np.zeros(400)
    boost[:6] = [30, 25, 21, 18, 16, 15]
    return sym_banded(400, 3, 0, boost)


@pytest.fixture(scope="module")
def exact(operator):
    d = np.asarray(operator.to_dense())
    np.testing.assert_allclose(d, d.T)
    return np.linalg.eigvalsh(d)


@pytest.fixture(scope="module")
def mesh():
    return make_row_mesh(8)


class TestLanczos:
    def test_largest_algebraic(self, operator, exact, key):
        r = es.lanczos_eigenvalues(operator, k=5, m=60, which="LA",
                                   opts=es.SolverOptions(tolerance=1e-9),
                                   key=key)
        assert bool(r.converged)
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(exact)[::-1][:5], rtol=1e-9)

    def test_smallest_algebraic_full_space(self, operator, exact, key):
        r = es.lanczos_eigenvalues(operator, k=3, m=400, which="SA",
                                   opts=es.SolverOptions(tolerance=1e-8),
                                   key=key)
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(exact)[:3], atol=1e-7)

    def test_largest_magnitude_default(self, operator, exact, key):
        r = es.lanczos_eigenvalues(operator, k=2, m=60, key=key,
                                   opts=es.SolverOptions(tolerance=1e-8))
        by_mag = exact[np.argsort(-np.abs(exact))][:2]
        np.testing.assert_allclose(np.asarray(r.eigenvalues), by_mag,
                                   rtol=1e-8)

    def test_clustered_spectrum_reports_unconverged(self, key):
        # laplacian_1d's top eigenvalues differ by ~1e-4: m=60 cannot
        # resolve them to 1e-8 and the Ritz bound must say so
        lap = SparseDIA.from_csr(laplacian_1d(500))
        r = es.lanczos_eigenvalues(lap, k=5, m=60, which="LA", key=key,
                                   opts=es.SolverOptions(tolerance=1e-8))
        assert not bool(r.converged)

    def test_no_reorth_still_finds_extremes(self, operator, exact, key):
        r = es.lanczos_eigenvalues(operator, k=1, m=60, which="LA",
                                   reorth=False, key=key,
                                   opts=es.SolverOptions(tolerance=1e-6))
        np.testing.assert_allclose(float(r.eigenvalues[0]),
                                   np.max(exact), rtol=1e-6)

    def test_interleaved_operator(self, operator, exact, key):
        il = SparseDIA(data=operator.data.astype(jnp.float32),
                       offsets=operator.offsets,
                       shape=operator.shape).interleaved()
        r = es.lanczos_eigenvalues(il, k=5, m=60, which="LA", key=key,
                                   opts=es.SolverOptions(tolerance=1e-3))
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(exact)[::-1][:5], rtol=1e-4)

    def test_breakdown_invariant_subspace(self):
        # rank-2 spectrum: breakdown after a few steps, exact Ritz values
        d = np.zeros(50)
        d[0], d[1] = 7.0, 3.0
        M = es.DenseMatrix.from_array(np.diag(d))
        x0 = np.zeros(50)
        x0[0] = 1.0
        x0[1] = 1.0
        r = es.lanczos_eigenvalues(M, k=2, m=20, which="LA", x0=x0,
                                   opts=es.SolverOptions(tolerance=1e-10))
        assert bool(r.converged)
        assert int(r.iterations) <= 3
        np.testing.assert_allclose(np.asarray(r.eigenvalues), [7.0, 3.0],
                                   atol=1e-12)

    def test_errors(self, operator):
        M = es.DenseMatrix.from_array(np.ones((2, 3)))
        with pytest.raises(ValueError, match="square"):
            es.lanczos_eigenvalues(M)
        with pytest.raises(ValueError, match="k must be >= 1"):
            es.lanczos_eigenvalues(operator, k=0)
        with pytest.raises(ValueError, match="which"):
            es.lanczos_eigenvalues(operator, which="XX")
        with pytest.raises(TypeError, match="scalar type mismatch"):
            es.lanczos_eigenvalues(operator, dtype=np.float32)


class TestDistributedLanczos:
    def test_all_partitions_match_oracle(self, operator, exact, mesh, key):
        d = np.asarray(operator.to_dense())
        csr = SparseCSR.from_dense(d)
        A32 = SparseDIA(data=operator.data.astype(jnp.float32),
                        offsets=operator.offsets, shape=operator.shape)
        top5 = np.sort(exact)[::-1][:5]
        for A in (partition_ell(csr, mesh), partition_dia(operator, mesh),
                  partition_dia_il(A32, mesh)):
            r = distributed_lanczos_eigenvalues(
                A, mesh, k=5, m=60, which="LA", key=key,
                opts=es.SolverOptions(tolerance=1e-3))
            assert bool(r.converged)
            np.testing.assert_allclose(np.asarray(r.eigenvalues), top5,
                                       rtol=1e-4)

    def test_errors(self, operator, mesh):
        A = partition_dia(operator, mesh)
        with pytest.raises(ValueError, match="k must be >= 1"):
            distributed_lanczos_eigenvalues(A, mesh, k=0)
        with pytest.raises(ValueError, match="which"):
            distributed_lanczos_eigenvalues(A, mesh, which="ZZ")


class TestLanczosEigenpairs:
    def test_ritz_vectors_satisfy_residual(self, operator, exact, key):
        res, Y = es.lanczos_eigenpairs(operator, k=4, m=60, which="LA",
                                       opts=es.SolverOptions(tolerance=1e-9),
                                       key=key)
        assert bool(res.converged)
        assert Y.shape == (400, 4)
        A = np.asarray(operator.to_dense())
        for i in range(4):
            y = np.asarray(Y[:, i])
            th = float(res.eigenvalues[i])
            assert np.linalg.norm(A @ y - th * y) < 1e-7 * (1 + abs(th))
            assert abs(np.linalg.norm(y) - 1) < 1e-8

    def test_interleaved_vectors_decode(self, operator, key):
        il = SparseDIA(data=operator.data.astype(jnp.float32),
                       offsets=operator.offsets,
                       shape=operator.shape).interleaved()
        res, Y = es.lanczos_eigenpairs(il, k=2, m=60, which="LA", key=key,
                                       opts=es.SolverOptions(tolerance=1e-4))
        assert Y.shape == (400, 2)  # decoded from the il domain
        A = np.asarray(il.to_dense())
        y = np.asarray(Y[:, 0])
        th = float(res.eigenvalues[0])
        assert np.linalg.norm(A @ y - th * y) < 1e-2 * (1 + abs(th))


class TestThickRestart:
    """TRLan: memory-bounded basis resolves what a single sweep cannot."""

    def test_clustered_top_converges_where_plain_fails(self, key):
        L = SparseDIA.from_csr(laplacian_1d(500))
        exact = np.sort(2 - 2 * np.cos(np.arange(1, 501) * np.pi / 501))
        r_plain = es.lanczos_eigenvalues(
            L, k=5, m=60, which="LA",
            opts=es.SolverOptions(tolerance=1e-8), key=key)
        assert not bool(r_plain.converged)
        r = es.lanczos_thick_restart(
            L, k=5, m=60, which="LA",
            opts=es.SolverOptions(tolerance=1e-8), key=key)
        assert bool(r.converged)
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   exact[::-1][:5], atol=1e-8)

    def test_smallest_end(self, key):
        L = SparseDIA.from_csr(laplacian_1d(500))
        exact = np.sort(2 - 2 * np.cos(np.arange(1, 501) * np.pi / 501))
        r = es.lanczos_thick_restart(
            L, k=3, m=60, which="SA",
            opts=es.SolverOptions(tolerance=1e-8), key=key)
        assert bool(r.converged)
        np.testing.assert_allclose(np.asarray(r.eigenvalues), exact[:3],
                                   atol=1e-8)

    def test_separated_spectrum_single_cycle(self, operator, exact, key):
        # well-separated top: should converge without restarting much
        r = es.lanczos_thick_restart(
            operator, k=4, m=60, which="LA",
            opts=es.SolverOptions(tolerance=1e-9), key=key)
        assert bool(r.converged)
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(exact)[::-1][:4], rtol=1e-9)

    def test_errors(self, operator):
        with pytest.raises(ValueError, match="which"):
            es.lanczos_thick_restart(operator, which="LM")
        with pytest.raises(ValueError, match="k must be >= 1"):
            es.lanczos_thick_restart(operator, k=0)
        with pytest.raises(ValueError, match="too small"):
            es.lanczos_thick_restart(operator, k=4, m=5)
