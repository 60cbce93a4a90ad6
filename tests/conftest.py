"""Test harness config.

Tests run on CPU with an 8-device fake mesh (the survey's recommended
pattern for multi-chip testing without hardware, SURVEY.md §4) and with x64
enabled so float64/complex128 parity cases match the reference's C++
doubles. The real-chip benchmark path (bench.py) does not import this.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend unconditionally and the
# JAX_PLATFORMS env var is overridden there; jax.config wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (hundreds of
# distinct jit signatures); re-runs hit the disk cache instead of XLA.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(42)
