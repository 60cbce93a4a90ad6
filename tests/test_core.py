"""Core-layer tests: tolerance predicate, options, dtype policy.

Mirrors the conventions of the reference's test suites (SURVEY.md §4):
analytic oracles plus error-path coverage as first-class deliverables.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu.core.dtypes import (
    canonical_dtype, check_scalar_type, complex_dtype_of, is_complex_dtype,
    real_dtype_of)
from pcsc_eigenvalue_solver_project_tpu.core.options import (
    QROptions, ShiftedSolverOptions, SolverOptions)
from pcsc_eigenvalue_solver_project_tpu.core.tolerance import is_close_relative


class TestIsCloseRelative:
    # parity with tolerance.hpp:29-33: |a-b| <= tol*(1+|a|)
    def test_exact_equal(self):
        assert bool(is_close_relative(1.0, 1.0, 0.0))

    def test_relative_for_large(self):
        # a=100: threshold = tol*101
        assert bool(is_close_relative(100.0, 100.0 + 0.9e-8 * 101, 1e-8))
        assert not bool(is_close_relative(100.0, 100.0 + 2e-8 * 101, 1e-8))

    def test_absolute_near_zero(self):
        # a=0: threshold = tol
        assert bool(is_close_relative(0.0, 1e-10, 1e-10))
        assert not bool(is_close_relative(0.0, 2e-10, 1e-10))

    def test_complex(self):
        a = 3.0 + 4.0j  # |a| = 5 -> threshold = 6*tol
        assert bool(is_close_relative(a, a + 5.9e-9, 1e-9))
        assert not bool(is_close_relative(a, a + 6.1e-9, 1e-9))

    def test_traceable(self):
        import jax
        f = jax.jit(is_close_relative)
        assert bool(f(jnp.float64(2.0), jnp.float64(2.0), 1e-12))


class TestOptions:
    def test_defaults(self):
        # solver_option.hpp:16-19 defaults
        o = SolverOptions()
        assert o.max_iterations == 1000
        assert o.tolerance == 1e-10

    def test_shifted_defaults(self):
        # shifted_solver_option.hpp: shift defaults to 0
        o = ShiftedSolverOptions()
        assert o.shift == 0.0
        assert o.max_iterations == 1000

    def test_shifted_full(self):
        o = ShiftedSolverOptions(shift=3.1, max_iterations=50, tolerance=1e-6)
        assert o.shift == 3.1 and o.max_iterations == 50 and o.tolerance == 1e-6

    def test_frozen(self):
        with pytest.raises(Exception):
            SolverOptions().max_iterations = 5

    def test_validation(self):
        with pytest.raises(ValueError):
            SolverOptions(max_iterations=-1)
        with pytest.raises(ValueError):
            SolverOptions(tolerance=-1e-3)
        with pytest.raises(ValueError):
            QROptions(mode="bogus")


class TestDtypePolicy:
    def test_allowed(self):
        for d in (np.float32, np.float64, np.complex64, np.complex128):
            assert canonical_dtype(d) == np.dtype(d)

    def test_rejected(self):
        # ScalarConcept analogue: ints/bools are not scalars (types.hpp:28-30)
        for d in (np.int32, np.int64, bool):
            with pytest.raises(TypeError):
                canonical_dtype(d)

    def test_real_complex_maps(self):
        assert real_dtype_of(np.complex128) == np.dtype(np.float64)
        assert real_dtype_of(np.complex64) == np.dtype(np.float32)
        assert complex_dtype_of(np.float32) == np.dtype(np.complex64)
        assert is_complex_dtype(np.complex64)
        assert not is_complex_dtype(np.float64)

    def test_scalar_type_guard(self):
        with pytest.raises(TypeError, match="scalar type mismatch"):
            check_scalar_type(np.float32, np.float64, "power_method")
