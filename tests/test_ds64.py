"""Double-single (f64-class on-chip) arithmetic — ops/ds64.py and
power_method_ds64. The reference's scalar contract is double precision
(types.hpp:28-30); these tests pin the compensated path to <= 1e-12 of
host float64 on the bench configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcsc_eigenvalue_solver_project_tpu.core.options import SolverOptions
from pcsc_eigenvalue_solver_project_tpu.matrix.dia import SparseDIA
from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_full
from pcsc_eigenvalue_solver_project_tpu.ops.ds64 import (
    dia_matvec_ds, ds_add, ds_dot, ds_from_f64, ds_mul, ds_rsqrt, ds_sum,
    ds_to_f64, two_prod, two_sum)
from pcsc_eigenvalue_solver_project_tpu.solvers.power import power_method_ds64


class TestErrorFreeTransforms:
    def test_two_sum_exact(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal(1000).astype(np.float32)
        b = (rng.standard_normal(1000) * 1e-6).astype(np.float32)
        s, e = two_sum(jnp.asarray(a), jnp.asarray(b))
        exact = a.astype(np.float64) + b.astype(np.float64)
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)

    def test_two_prod_exact(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal(1000).astype(np.float32)
        b = rng.standard_normal(1000).astype(np.float32)
        p, e = two_prod(jnp.asarray(a), jnp.asarray(b))
        exact = a.astype(np.float64) * b.astype(np.float64)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        np.testing.assert_array_equal(got, exact)

    def test_ds_roundtrip_and_ops(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(512)
        y = rng.standard_normal(512)
        xh, xl = ds_from_f64(x)
        yh, yl = ds_from_f64(y)
        # hi+lo carries ~48 mantissa bits (~3.6e-15 relative), not full f64
        np.testing.assert_allclose(ds_to_f64(xh, xl), x, rtol=4e-15)
        # accuracy is relative to the INPUT magnitudes (cancellation in
        # x + y can make tiny results), so use a scaled atol
        sh, sl = ds_add(xh, xl, yh, yl)
        np.testing.assert_allclose(ds_to_f64(sh, sl), x + y, rtol=4e-15,
                                   atol=1e-14 * np.abs(x).max())
        ph, pl = ds_mul(xh, xl, yh, yl)
        np.testing.assert_allclose(ds_to_f64(ph, pl), x * y, rtol=4e-15,
                                   atol=1e-14 * np.abs(x * y).max())

    def test_ds_sum_and_dot(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(100_001)   # odd length exercises padding
        xh, xl = ds_from_f64(x)
        sh, sl = ds_sum(xh, xl)
        assert abs((float(sh) + float(sl)) - x.sum()) < 1e-11 * abs(x).sum()
        dh, dl = ds_dot(xh, xl, xh, xl)
        assert abs((float(dh) + float(dl)) - x @ x) < 1e-12 * (x @ x)

    def test_ds_rsqrt(self):
        for v in (2.0, 1e-6, 12345.678):
            sh, sl = ds_from_f64(np.float64(v))
            rh, rl = ds_rsqrt(sh, sl)
            got = float(rh) + float(rl)
            assert abs(got - v ** -0.5) < 3e-14 * v ** -0.5


class TestDsMatvec:
    def test_matvec_matches_f64_100k_banded(self):
        """The VERDICT round-5 acceptance config: 100K banded, <= 1e-12
        of the host float64 result."""
        n = 100_000
        dia = banded_full(n, bandwidth=16, dtype=np.float64, seed=0)
        rng = np.random.default_rng(4)
        x = rng.standard_normal(n)
        dh, dl = ds_from_f64(np.asarray(dia.data, np.float64))
        xh, xl = ds_from_f64(x)
        yh, yl = dia_matvec_ds(dh, dl, tuple(dia.offsets), xh, xl)
        y_ds = ds_to_f64(yh, yl)
        # host f64 oracle via the band structure (no dense materialise)
        data = np.asarray(dia.data, np.float64)
        y64 = np.zeros(n)
        for d, off in enumerate(dia.offsets):
            if off >= 0:
                y64[:n - off] += data[d, :n - off] * x[off:]
            else:
                y64[-off:] += data[d, -off:] * x[:off]
        scale = np.abs(y64).max()
        assert np.abs(y_ds - y64).max() < 1e-12 * scale


class TestPowerDs64:
    def test_eigenpair_f64_accuracy(self):
        n = 2000
        dia = banded_full(n, bandwidth=4, dtype=np.float64, seed=0)
        data = np.array(dia.data, np.float64)
        mid = len(dia.offsets) // 2
        data[mid] += 3.0
        data[mid, 7] = 25.0          # planted dominant eigenvalue
        m = SparseDIA(data=jnp.asarray(data), offsets=dia.offsets,
                      shape=dia.shape)
        r = power_method_ds64(m, SolverOptions(max_iterations=5000,
                                               tolerance=1e-13))
        d = np.asarray(m.to_dense(), np.float64)
        ev = np.linalg.eigvals(d)
        lam_o = ev[np.argmax(np.abs(ev))]
        assert bool(r.converged)
        assert r.eigenvalue.dtype == np.float64
        assert abs(r.eigenvalue - lam_o) < 1e-12 * abs(lam_o)
        x = np.asarray(r.eigenvector)
        assert np.abs(d @ x - r.eigenvalue * x).max() < 1e-10 * abs(lam_o)

    def test_f32_accuracy_is_insufficient_here(self):
        """The point of the ds path: the same solve in plain f32 cannot
        reach 1e-12 — pin the gap so the feature stays load-bearing."""
        n = 2000
        dia = banded_full(n, bandwidth=4, dtype=np.float64, seed=0)
        data = np.array(dia.data, np.float64)
        mid = len(dia.offsets) // 2
        data[mid] += 3.0
        data[mid, 7] = 25.0
        m = SparseDIA(data=jnp.asarray(data), offsets=dia.offsets,
                      shape=dia.shape)
        r = power_method_ds64(m, SolverOptions(max_iterations=5000,
                                               tolerance=1e-13))
        d64 = np.asarray(m.to_dense(), np.float64)
        ev = np.linalg.eigvals(d64)
        lam_o = ev[np.argmax(np.abs(ev))]
        # f32 loop on the same operator
        from pcsc_eigenvalue_solver_project_tpu.solvers.power import (
            power_method)
        m32 = SparseDIA(data=jnp.asarray(data.astype(np.float32)),
                        offsets=dia.offsets, shape=dia.shape)
        r32 = power_method(m32, SolverOptions(max_iterations=5000,
                                              tolerance=1e-13))
        err32 = abs(complex(np.asarray(r32.eigenvalue)) - lam_o)
        err_ds = abs(r.eigenvalue - lam_o)
        assert err_ds < 1e-12 * abs(lam_o)
        assert err32 > 50 * err_ds     # ds is orders of magnitude closer

    def test_validation(self):
        from pcsc_eigenvalue_solver_project_tpu.matrix.dense import (
            DenseMatrix)
        with pytest.raises(ValueError):
            power_method_ds64(DenseMatrix.from_array(np.eye(4)))
        dia = banded_full(64, bandwidth=2, dtype=np.complex64, seed=0)
        with pytest.raises(ValueError):
            power_method_ds64(dia)


class TestJitFencing:
    def test_jitted_matches_eager_compensation(self):
        """Round-5 regression: jit-fused EFT chains silently degraded to
        plain f32 (XLA algebraic simplification / excess-precision
        evaluation cancel the compensation terms) while eager op-by-op
        execution was exact. The reduce_precision fences must keep the
        jitted path at ds accuracy on EVERY backend."""
        from pcsc_eigenvalue_solver_project_tpu.ops.ds64 import ds_mul_f32
        rng = np.random.default_rng(0)
        z64 = rng.standard_normal(2000) * 3.0
        zh, zl = ds_from_f64(z64)
        rh = jnp.float32(np.float32(0.008765430152416229))
        jh, jl = jax.jit(ds_mul_f32)(zh, zl, rh)
        err = np.abs(ds_to_f64(jh, jl) - z64 * float(rh)).max()
        assert err < 1e-14      # was 3.7e-9 before the fences

    def test_fence_survives_compilation(self):
        from pcsc_eigenvalue_solver_project_tpu.ops.ds64 import ds_mul_f32
        zh = jnp.ones(256, jnp.float32)
        zl = jnp.zeros(256, jnp.float32)
        txt = jax.jit(ds_mul_f32).lower(
            zh, zl, jnp.float32(1.5)).compile().as_text()
        assert txt.count("reduce-precision") > 0
