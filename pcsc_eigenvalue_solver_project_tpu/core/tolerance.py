"""Relative-tolerance convergence predicate.

Reference parity: ``is_close_relative(a, b, tol)`` returns
``|a - b| <= tol * (1 + |a|)`` (/root/reference/src/core/tolerance.hpp:29-33).
The scale term ``1 + |a|`` makes the test relative for large magnitudes and
absolute near zero. ``a`` is the *new* value in all solver call sites
(power_method.hpp:84 calls ``is_close_relative(lambdaNew, lambda, tol)``).

This version is traceable: it works on JAX scalars inside ``lax.while_loop``
bodies so the convergence check stays on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def is_close_relative(a, b, tol):
    """True iff ``|a - b| <= tol * (1 + |a|)``. Works for real and complex."""
    diff = jnp.abs(a - b)
    scale = 1.0 + jnp.abs(a)
    return diff <= tol * scale
