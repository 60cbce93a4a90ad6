"""LOBPCG block eigensolver — protocol bridging, LA/SA modes, honesty."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pcsc_eigenvalue_solver_project_tpu as es
from pcsc_eigenvalue_solver_project_tpu.matrix.dia import SparseDIA
from pcsc_eigenvalue_solver_project_tpu.models.generators import laplacian_1d


def sym_banded(n, bw, seed, boost_head, dtype=np.float64):
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
    boost = np.zeros(n, dtype)
    boost[:len(boost_head)] = boost_head
    data[bw] += boost
    return SparseDIA(data=jnp.asarray(data), offsets=offs, shape=(n, n))


@pytest.fixture(scope="module")
def operator():
    return sym_banded(2000, 3, 0, [30, 25, 21, 18])


@pytest.fixture(scope="module")
def exact(operator):
    return np.linalg.eigvalsh(np.asarray(operator.to_dense()))


class TestLOBPCG:
    def test_largest_f64(self, operator, exact, key):
        r = es.lobpcg_eigenvalues(operator, k=4, which="LA", key=key,
                                  opts=es.SolverOptions(max_iterations=100,
                                                        tolerance=1e-9))
        assert bool(r.converged)
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(exact)[::-1][:4], rtol=1e-6)

    def test_smallest_via_spectral_shift(self, key):
        B = sym_banded(2000, 3, 1, [-30, -25, -21, -18])
        evB = np.linalg.eigvalsh(np.asarray(B.to_dense()))
        r = es.lobpcg_eigenvalues(B, k=4, which="SA", key=key,
                                  opts=es.SolverOptions(max_iterations=200,
                                                        tolerance=1e-8))
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(evB)[:4], atol=1e-5)

    @pytest.mark.slow
    def test_interleaved_f32_noise_floor(self, operator, exact, key):
        # f32 converges to its storage noise floor (~1e-3 relative)
        A32 = SparseDIA(data=operator.data.astype(jnp.float32),
                        offsets=operator.offsets, shape=operator.shape)
        il = A32.interleaved()
        r = es.lobpcg_eigenvalues(il, k=4, which="LA", key=key,
                                  opts=es.SolverOptions(max_iterations=100,
                                                        tolerance=1e-5))
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(exact)[::-1][:4], rtol=5e-3)

    def test_dense_path(self, key):
        # smaller operator than the module fixture: the dense path runs
        # O(n^2) matvecs per sweep and only the DenseMatrix dispatch is
        # under test here
        op = sym_banded(600, 3, 0, [30, 25, 21, 18])
        exact_small = np.linalg.eigvalsh(np.asarray(op.to_dense()))
        D = es.DenseMatrix.from_array(np.asarray(op.to_dense()))
        r = es.lobpcg_eigenvalues(D, k=4, which="LA", key=key,
                                  opts=es.SolverOptions(max_iterations=100,
                                                        tolerance=1e-9))
        np.testing.assert_allclose(np.asarray(r.eigenvalues),
                                   np.sort(exact_small)[::-1][:4], rtol=1e-6)

    def test_clustered_bottom_reports_unconverged(self, key):
        # unpreconditioned SA on the 1-D laplacian's 1e-6-clustered bottom
        # cannot converge in 100 sweeps — the flag must say so
        L = SparseDIA.from_csr(laplacian_1d(2000))
        r = es.lobpcg_eigenvalues(L, k=4, which="SA", key=key,
                                  opts=es.SolverOptions(max_iterations=100,
                                                        tolerance=1e-7))
        assert not bool(r.converged)

    def test_errors(self, operator):
        with pytest.raises(ValueError, match="which"):
            es.lobpcg_eigenvalues(operator, which="LM")
        with pytest.raises(ValueError, match="k must be >= 1"):
            es.lobpcg_eigenvalues(operator, k=0)
        with pytest.raises(ValueError, match="must exceed 5k"):
            es.lobpcg_eigenvalues(sym_banded(30, 1, 0, [5.0]), k=8)
        with pytest.raises(ValueError, match="square"):
            es.lobpcg_eigenvalues(es.DenseMatrix.from_array(np.ones((2, 3))))
        with pytest.raises(TypeError, match="scalar type mismatch"):
            es.lobpcg_eigenvalues(operator, dtype=np.float32)
        with pytest.raises(ValueError, match="X0 must be"):
            es.lobpcg_eigenvalues(operator, k=4, X0=np.ones((5, 4)))
