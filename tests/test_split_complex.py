"""Split-plane complex subsystem tests.

The TPU backend has no complex dtypes, so complex eigenproblems run as
(2, n) real planes (matrix/split_complex.py, ops/split_complex.py). These
tests pin the plane algebra against numpy complex, the fused kernel
against the XLA plane path, and the split power method against the
complex-dtype solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu import SolverOptions, SparseCSR, power_method
from pcsc_eigenvalue_solver_project_tpu.matrix.dia import SparseDIA
from pcsc_eigenvalue_solver_project_tpu.matrix.split_complex import SplitComplexDIA
from pcsc_eigenvalue_solver_project_tpu.ops.pallas.dia_spmv import dia_matvec_planes
from pcsc_eigenvalue_solver_project_tpu.ops.split_complex import (
    from_planes, splitc_div_scalar, splitc_is_close_relative, splitc_mul,
    splitc_norm, splitc_vdot, to_planes)
from pcsc_eigenvalue_solver_project_tpu.solvers.power import (
    power_method_split_complex)


def _rand_band(n, offsets, seed, dtype=np.complex128):
    rng = np.random.default_rng(seed)
    k = len(offsets)
    data = (rng.random((k, n)) + 1j * rng.random((k, n))).astype(dtype)
    for d, off in enumerate(offsets):
        if off > 0:
            data[d, n - off:] = 0
        elif off < 0:
            data[d, :-off] = 0
    return data


class TestPlaneAlgebra:
    def test_roundtrip(self):
        z = np.array([1 + 2j, -3 + 0.5j])
        np.testing.assert_allclose(from_planes(to_planes(z)), z)

    def test_mul_vdot_norm(self):
        rng = np.random.default_rng(0)
        a = rng.random(10) + 1j * rng.random(10)
        b = rng.random(10) + 1j * rng.random(10)
        ap, bp = to_planes(a), to_planes(b)
        np.testing.assert_allclose(from_planes(splitc_mul(ap, bp)), a * b, rtol=1e-12)
        np.testing.assert_allclose(complex(from_planes(splitc_vdot(ap, bp))),
                                   np.vdot(a, b), rtol=1e-12)
        np.testing.assert_allclose(float(splitc_norm(ap)), np.linalg.norm(a),
                                   rtol=1e-12)

    def test_div_scalar(self):
        a = to_planes(np.array([4 + 2j, 1 - 1j]))
        s = to_planes(np.array(2 - 1j)).reshape(2)
        np.testing.assert_allclose(from_planes(splitc_div_scalar(a, s)),
                                   np.array([4 + 2j, 1 - 1j]) / (2 - 1j), rtol=1e-12)

    def test_is_close_relative_matches_complex(self):
        a, b = 3 + 4j, 3 + 4j + 5.9e-9
        assert bool(splitc_is_close_relative(to_planes(np.array(a)).reshape(2),
                                             to_planes(np.array(b)).reshape(2),
                                             1e-9))


class TestSplitKernel:
    @pytest.mark.parametrize("n,offsets", [
        (16384, (-1, 0, 1)),
        (20000, tuple(range(-8, 9))),
        (16384, (-130, 0, 129)),
    ])
    def test_interpret_matches_xla_planes(self, n, offsets):
        data = _rand_band(n, offsets, 7, np.complex64)
        planes = jnp.asarray(np.stack([data.real, data.imag]).astype(np.float32))
        rng = np.random.default_rng(8)
        xp = jnp.asarray(rng.random((2, n)).astype(np.float32))
        y_ref = dia_matvec_planes(planes, offsets, xp, force="xla")
        y_ker = dia_matvec_planes(planes, offsets, xp, force="interpret")
        np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)

    def test_planes_match_complex_matvec(self):
        n = 300
        offsets = (-2, 0, 3)
        data = _rand_band(n, offsets, 9)
        dia = SparseDIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))
        M = SplitComplexDIA.from_complex_dia(dia, precision=np.float64)
        rng = np.random.default_rng(10)
        x = rng.random(n) + 1j * rng.random(n)
        y_complex = np.asarray(dia.matvec(jnp.asarray(x)))
        y_planes = from_planes(np.asarray(M.matvec(to_planes(x))))
        np.testing.assert_allclose(y_planes, y_complex, rtol=1e-10)


class TestSplitPowerMethod:
    def test_matches_complex_solver(self, key):
        n = 64
        offsets = (-1, 0, 1)
        data = _rand_band(n, offsets, 11)
        dia = SparseDIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))
        M = SplitComplexDIA.from_complex_dia(dia, precision=np.float64)

        x0c = np.asarray(jax.random.uniform(key, (2, n), jnp.float64,
                                            minval=-1, maxval=1))
        x0_complex = x0c[0] + 1j * x0c[1]

        ref = power_method(dia, SolverOptions(tolerance=1e-10), x0=x0_complex)
        res = power_method_split_complex(M, SolverOptions(tolerance=1e-10), x0=x0c)
        lam = complex(from_planes(np.asarray(res.eigenvalue)))
        np.testing.assert_allclose(lam, complex(ref.eigenvalue), rtol=1e-9)
        assert int(res.iterations) == int(ref.iterations)
        assert bool(res.converged) == bool(ref.converged)

    def test_against_dense_oracle(self, key):
        n = 120
        offsets = tuple(range(-3, 4))
        data = _rand_band(n, offsets, 12)
        dia = SparseDIA(data=jnp.asarray(data), offsets=offsets, shape=(n, n))
        M = SplitComplexDIA.from_complex_dia(dia, precision=np.float64)
        res = power_method_split_complex(M, SolverOptions(tolerance=1e-11,
                                                          max_iterations=20000),
                                         key=key)
        assert bool(res.converged)
        lam = complex(from_planes(np.asarray(res.eigenvalue)))
        eigs = np.linalg.eigvals(M.to_complex_dense())
        dom = eigs[np.argmax(np.abs(eigs))]
        np.testing.assert_allclose(lam, dom, rtol=1e-7)

    def test_errors(self):
        M = SplitComplexDIA(planes=jnp.zeros((2, 1, 4)), offsets=(0,), shape=(4, 5))
        with pytest.raises(ValueError, match="square"):
            power_method_split_complex(M)


class TestInterleavedSplitComplex:
    """Lane-major split-plane kernel + power loop integration."""

    def _banded_planes(self, n, offs, seed=0, dtype=np.float32):
        rng = np.random.default_rng(seed)
        k = len(offs)
        planes = np.zeros((2, k, n), dtype)
        for d, off in enumerate(offs):
            planes[0, d] = rng.standard_normal(n)
            planes[1, d] = rng.standard_normal(n)
            if off > 0:
                planes[:, d, n - off:] = 0
            elif off < 0:
                planes[:, d, :-off] = 0
        return SplitComplexDIA(planes=jnp.asarray(planes), offsets=offs,
                               shape=(n, n))

    def test_il_planes_matvec_matches_xla(self):
        from pcsc_eigenvalue_solver_project_tpu.ops.split_complex import from_planes
        sc = self._banded_planes(20000, (-7, -2, 0, 3, 7), seed=1)
        il = sc.interleaved()
        rng = np.random.default_rng(2)
        zp = jnp.asarray(np.stack([rng.standard_normal(20000),
                                   rng.standard_normal(20000)]), jnp.float32)
        y_ref = from_planes(np.asarray(sc.matvec(zp, force="xla")))
        y_il = from_planes(np.asarray(il.decode_vec(
            il.matvec(il.encode_vec(zp), force="interpret"))))
        np.testing.assert_allclose(y_il, y_ref, rtol=2e-4, atol=2e-4)
        y_fb = from_planes(np.asarray(il.decode_vec(
            il.matvec(il.encode_vec(zp), force="xla"))))
        np.testing.assert_allclose(y_fb, y_ref, rtol=1e-6, atol=1e-6)

    def test_power_method_through_il(self, key):
        from pcsc_eigenvalue_solver_project_tpu.ops.split_complex import from_planes
        from pcsc_eigenvalue_solver_project_tpu import SolverOptions, power_method
        sc = self._banded_planes(300, (-2, 0, 1), seed=3)
        il = sc.interleaved()
        opts = SolverOptions(max_iterations=5000, tolerance=1e-6)
        r1 = power_method(sc, opts, key=key)
        r2 = power_method(il, opts, key=key)
        assert bool(r1.converged) and bool(r2.converged)
        l1 = from_planes(np.asarray(r1.eigenvalue))
        l2 = from_planes(np.asarray(r2.eigenvalue))
        ev = np.linalg.eigvals(sc.to_complex_dense())
        dom = ev[np.argmax(np.abs(ev))]
        assert abs(l2 - dom) < 1e-3 * abs(dom)
        assert abs(l1 - l2) < 1e-3 * abs(dom)
        assert r2.eigenvector.shape == (2, 300)  # decoded to natural planes

    def test_to_natural_roundtrip(self):
        sc = self._banded_planes(1000, (-3, 0, 4), seed=4)
        il = sc.interleaved()
        nat = il.to_natural()
        np.testing.assert_array_equal(np.asarray(nat.planes),
                                      np.asarray(sc.planes))


class TestSplitComplexShiftedInverse:
    """Complex shifted inverse power with NO complex dtype on device:
    dense split-block LU path (exact) and plane-BiCGStab honesty."""

    def _operator(self, n=500, seed=0):
        rng = np.random.default_rng(seed)
        offs = (-2, 0, 1)
        planes = np.zeros((2, len(offs), n), np.float32)
        for d, off in enumerate(offs):
            planes[0, d] = rng.standard_normal(n)
            planes[1, d] = rng.standard_normal(n)
            if off > 0:
                planes[:, d, n - off:] = 0
            elif off < 0:
                planes[:, d, :-off] = 0
        planes[0, 1] += 4.0
        return SplitComplexDIA(planes=jnp.asarray(planes), offsets=offs,
                               shape=(n, n))

    def test_dense_lu_path_nearest_eigenvalue(self, key):
        from pcsc_eigenvalue_solver_project_tpu import (
            ShiftedSolverOptions, shifted_inverse_power_method)
        sc = self._operator()
        ev = np.linalg.eigvals(sc.to_complex_dense())
        shift = 4.0 + 1.5j
        target = ev[np.argmin(np.abs(ev - shift))]
        opts = ShiftedSolverOptions(shift=shift, max_iterations=200,
                                    tolerance=1e-6)
        for M in (sc, sc.interleaved()):
            r = shifted_inverse_power_method(M, opts, key=key)
            assert bool(r.converged)
            lam = from_planes(np.asarray(r.eigenvalue))
            assert abs(lam - target) < 1e-4 * (1 + abs(target))

    def test_reference_demo_case_b(self, key):
        # main.cpp:87-97 — B.txt, sigma = 2.3 -> eigenvalue 3+2i
        from pcsc_eigenvalue_solver_project_tpu import (
            ShiftedSolverOptions, read_matrix_from_file,
            shifted_inverse_power_method)
        B = read_matrix_from_file("data/B.txt", dtype=np.complex128)
        sc = SplitComplexDIA.from_csr(B.as_csr(), precision=np.float64)
        r = shifted_inverse_power_method(
            sc, ShiftedSolverOptions(shift=2.3, tolerance=1e-10), key=key)
        assert bool(r.converged)
        lam = from_planes(np.asarray(r.eigenvalue))
        assert abs(lam - (3 + 2j)) < 1e-5

    def test_bicgstab_path_never_nan(self, key):
        from pcsc_eigenvalue_solver_project_tpu import (
            ShiftedSolverOptions, shifted_inverse_power_method)
        sc = self._operator()
        opts = ShiftedSolverOptions(shift=4.0 + 1.5j, max_iterations=50,
                                    tolerance=1e-6, inner_method="bicgstab",
                                    inner_tolerance=1e-10)
        r = shifted_inverse_power_method(sc, opts, key=key)
        assert np.all(np.isfinite(np.asarray(r.eigenvalue)))
        assert np.all(np.isfinite(np.asarray(r.eigenvector)))

    def test_splitc_bicgstab_solves_dominant_system(self):
        # diagonally dominant shifted system: the plane BiCGStab must
        # actually solve it (not just stay finite)
        from pcsc_eigenvalue_solver_project_tpu.ops.split_krylov import (
            solve_shifted_splitc)
        rng = np.random.default_rng(3)
        n = 400
        offs = (-1, 0, 1)
        planes = np.zeros((2, 3, n))
        for d, off in enumerate(offs):
            planes[0, d] = 0.3 * rng.standard_normal(n)
            planes[1, d] = 0.3 * rng.standard_normal(n)
            if off > 0:
                planes[:, d, n - off:] = 0
            elif off < 0:
                planes[:, d, :-off] = 0
        planes[0, 1] += 5.0
        sc = SplitComplexDIA(planes=jnp.asarray(planes), offsets=offs,
                             shape=(n, n))
        b = rng.standard_normal((2, n))
        shift_p = jnp.asarray([0.5, 0.25], jnp.float64)
        y = solve_shifted_splitc(sc.matvec, shift_p, jnp.asarray(b),
                                 diag=sc.diagonal_planes(), tol=1e-12,
                                 maxiter=400)
        A = sc.to_complex_dense() - (0.5 + 0.25j) * np.eye(n)
        yc = from_planes(np.asarray(y))
        bc = b[0] + 1j * b[1]
        res = np.linalg.norm(A @ yc - bc) / np.linalg.norm(bc)
        assert res < 1e-9, res


class TestDistributedSplitComplex:
    """Row-partitioned complex planes: matvec + power parity with the
    single-chip split loop (identical iteration counts)."""

    def test_power_matches_single_chip(self):
        import os
        from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
        from pcsc_eigenvalue_solver_project_tpu.parallel.split_complex import (
            distributed_splitc_power_method, partition_splitc_dia)
        from pcsc_eigenvalue_solver_project_tpu import SolverOptions, power_method
        rng = np.random.default_rng(0)
        n = 2000
        offs = (-2, 0, 1)
        planes = np.zeros((2, len(offs), n), np.float64)
        for d, off in enumerate(offs):
            planes[0, d] = rng.standard_normal(n)
            planes[1, d] = rng.standard_normal(n)
            if off > 0:
                planes[:, d, n - off:] = 0
            elif off < 0:
                planes[:, d, :-off] = 0
        sc = SplitComplexDIA(planes=jnp.asarray(planes), offsets=offs,
                             shape=(n, n))
        mesh = make_row_mesh(8)
        A = partition_splitc_dia(sc, mesh)
        opts = SolverOptions(max_iterations=5000, tolerance=1e-8)
        x0 = rng.uniform(-1, 1, (2, n))
        r_d = distributed_splitc_power_method(A, mesh, opts, x0=x0)
        r_s = power_method(sc, opts, x0=x0)
        assert int(r_d.iterations) == int(r_s.iterations)
        assert bool(r_d.converged) == bool(r_s.converged)
        np.testing.assert_allclose(np.asarray(r_d.eigenvalue),
                                   np.asarray(r_s.eigenvalue), rtol=1e-10)

    def test_bandwidth_guard(self):
        from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh
        from pcsc_eigenvalue_solver_project_tpu.parallel.split_complex import (
            partition_splitc_dia)
        planes = np.zeros((2, 41, 64))
        sc = SplitComplexDIA(planes=jnp.asarray(planes),
                             offsets=tuple(range(-20, 21)), shape=(64, 64))
        with pytest.raises(ValueError, match="bandwidth"):
            partition_splitc_dia(sc, make_row_mesh(8))


class TestSplitComplexGMRES:
    """Plane GMRES inner method — robust for interior complex shifts near
    an eigenvalue (reference demo sigma=2.3, main.cpp:87)."""

    def _operator(self, n=500, seed=0):
        rng = np.random.default_rng(seed)
        offs = (-2, 0, 1)
        planes = np.zeros((2, len(offs), n), np.float32)
        for d, off in enumerate(offs):
            planes[0, d] = rng.standard_normal(n)
            planes[1, d] = rng.standard_normal(n)
            if off > 0:
                planes[:, d, n - off:] = 0
            elif off < 0:
                planes[:, d, :-off] = 0
        planes[0, 1] += 4.0
        return SplitComplexDIA(planes=jnp.asarray(planes), offsets=offs,
                               shape=(n, n))

    def test_splitc_gmres_solves_shifted_system(self):
        from pcsc_eigenvalue_solver_project_tpu.ops.split_krylov import (
            solve_shifted_splitc_gmres)
        from pcsc_eigenvalue_solver_project_tpu.ops.split_complex import (
            splitc_mul)
        sc = self._operator(300, seed=5)
        rng = np.random.default_rng(1)
        b = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
        shift = jnp.asarray([0.7, 0.3], jnp.float32)
        diag = sc.diagonal_planes()
        x = solve_shifted_splitc_gmres(sc.matvec, shift, b, diag=diag,
                                       tol=1e-6, m=60, max_restarts=16)
        r = sc.matvec(x) - splitc_mul(shift.reshape(2, 1), x) - b
        rnorm = float(np.sqrt(np.sum(np.asarray(r) ** 2)))
        bnorm = float(np.sqrt(np.sum(np.asarray(b) ** 2)))
        assert rnorm <= 1e-4 * bnorm

    def test_gmres_inner_sigma_near_eigenvalue(self, key):
        # the hard case the VERDICT pinned: interior complex shift close
        # to an eigenvalue, where the shifted system is near-singular
        from pcsc_eigenvalue_solver_project_tpu import (
            ShiftedSolverOptions, shifted_inverse_power_method)
        sc = self._operator(320, seed=0)
        ev = np.linalg.eigvals(sc.to_complex_dense())
        target = ev[np.argmin(np.abs(ev - (4.0 + 1.5j)))]
        shift = target + 0.02 * (1 + 1j)   # very close to the eigenvalue
        opts = ShiftedSolverOptions(shift=complex(shift), max_iterations=200,
                                    tolerance=1e-6, inner_method="gmres",
                                    inner_tolerance=1e-10)
        r = shifted_inverse_power_method(sc, opts, key=key)
        assert bool(r.converged)
        lam = from_planes(np.asarray(r.eigenvalue))
        assert abs(lam - target) < 1e-3 * (1 + abs(target))

    def test_reference_demo_case_b_gmres(self, key):
        # main.cpp:87-97 — B.txt, sigma = 2.3 -> eigenvalue 3+2i, via the
        # plane-GMRES inner solve instead of BiCGStab
        from pcsc_eigenvalue_solver_project_tpu import (
            ShiftedSolverOptions, read_matrix_from_file,
            shifted_inverse_power_method)
        B = read_matrix_from_file("data/B.txt", dtype=np.complex128)
        sc = SplitComplexDIA.from_csr(B.as_csr(), precision=np.float64)
        r = shifted_inverse_power_method(
            sc, ShiftedSolverOptions(shift=2.3, tolerance=1e-10,
                                     inner_method="gmres"), key=key)
        assert bool(r.converged)
        lam = from_planes(np.asarray(r.eigenvalue))
        assert abs(lam - (3 + 2j)) < 1e-5
