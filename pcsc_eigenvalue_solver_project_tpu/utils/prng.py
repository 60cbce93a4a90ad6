"""PRNG helpers.

The reference seeds its iterations with ``Vector::Random`` (uniform in
[-1, 1]; complex entries have uniform real and imaginary parts) at
power_method.hpp:62. Here initial vectors come from JAX's counter-based PRNG
with a fixed default key so results are reproducible run-to-run (the survey
notes the reference's random init forces loose test tolerances; a fixed key
lets tests tighten them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import is_complex_dtype, real_dtype_of

DEFAULT_SEED = 0


def default_key():
    return jax.random.key(DEFAULT_SEED)


def random_unit_vector(key, n: int, dtype):
    """Uniform [-1,1] entries (re/im for complex), normalised to unit 2-norm."""
    rdt = jnp.dtype(real_dtype_of(dtype))
    if is_complex_dtype(dtype):
        kr, ki = jax.random.split(key)
        re = jax.random.uniform(kr, (n,), rdt, minval=-1.0, maxval=1.0)
        im = jax.random.uniform(ki, (n,), rdt, minval=-1.0, maxval=1.0)
        x = (re + 1j * im).astype(dtype)
    else:
        x = jax.random.uniform(key, (n,), rdt, minval=-1.0, maxval=1.0).astype(dtype)
    nrm = jnp.linalg.norm(x)
    return jnp.where(nrm == 0, x, x / jnp.where(nrm == 0, 1, nrm).astype(dtype))
