"""Seeded randomized (property-style) tests.

The reference has no property/fuzz testing (SURVEY §4); these sweeps pin
down invariants across random shapes/sparsity/dtypes: IO round-trips are
exact, SpMV agrees across all storage formats, solver results satisfy
their defining residuals, and QR modes agree with numpy oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import (
    DenseMatrix, QROptions, SolverOptions, SparseCSR, power_method,
    qr_eigenvalues, read_matrix_from_file, solve_shifted, write_matrix_to_file)
from pcsc_eigenvalue_solver_project_tpu.matrix.dia import SparseDIA
from tests.test_qr import spectrum_distance


@pytest.mark.parametrize("seed", range(8))
def test_io_roundtrip_random(seed, tmp_path):
    rng = np.random.default_rng(seed)
    n, m = rng.integers(1, 12, 2)
    if seed % 2:
        a = rng.standard_normal((n, m)) * 10.0 ** float(rng.integers(-8, 8))
        src = DenseMatrix.from_array(a)
    else:
        density = rng.uniform(0.1, 0.9)
        a = rng.standard_normal((n, m)) * (rng.random((n, m)) < density)
        if not a.any():
            a[0, 0] = 1.0
        src = SparseCSR.from_dense(a)
    p = str(tmp_path / f"m{seed}.txt")
    write_matrix_to_file(p, src)
    back = read_matrix_from_file(p, np.float64)
    np.testing.assert_array_equal(np.asarray(back.to_dense()),
                                  np.asarray(src.to_dense()))


@pytest.mark.parametrize("seed", range(6))
def test_formats_agree_on_matvec(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(4, 40))
    a = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.4)
    a[np.arange(n), np.arange(n)] += 1.0
    x = rng.standard_normal(n)
    dense = DenseMatrix.from_array(a)
    csr = SparseCSR.from_dense(a)
    ell = csr.to_ell()
    dia = SparseDIA.from_csr(csr)
    ref = a @ x
    for m in (dense, csr, ell, dia):
        np.testing.assert_allclose(np.asarray(m.matvec(jnp.asarray(x))), ref,
                                   rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("seed", range(5))
def test_power_satisfies_eigen_residual(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(3, 20))
    a = rng.standard_normal((n, n))
    a = a + a.T + n * np.eye(n)  # symmetric, dominant eig separated-ish
    res = power_method(DenseMatrix.from_array(a),
                       SolverOptions(tolerance=1e-12, max_iterations=50000),
                       key=jax.random.key(seed))
    if bool(res.converged):
        lam = complex(res.eigenvalue).real
        v = np.asarray(res.eigenvector)
        assert np.linalg.norm(a @ v - lam * v) < 1e-4 * max(abs(lam), 1)


@pytest.mark.parametrize("seed", range(5))
def test_solve_shifted_residual(seed):
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(2, 30))
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    shift = float(rng.standard_normal())
    x = np.asarray(solve_shifted(DenseMatrix.from_array(a), shift, b))
    assert np.linalg.norm((a - shift * np.eye(n)) @ x - b) < 1e-8


@pytest.mark.parametrize("seed", range(4))
def test_qr_modes_agree(seed):
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(3, 12))
    a = rng.standard_normal((n, n))
    exact = np.linalg.eigvals(a)
    acc = qr_eigenvalues(DenseMatrix.from_array(a),
                         QROptions(mode="accelerated", tolerance=1e-12,
                                   max_iterations=5000))
    assert spectrum_distance(np.asarray(acc.eigenvalues), exact) < 1e-7
