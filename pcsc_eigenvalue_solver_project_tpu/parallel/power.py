"""Distributed power iteration over a row-partitioned operator.

The whole solver — SpMV with halo/all-gather exchange, psum norms and
Rayleigh quotients, and the on-device convergence flag — runs as ONE
``lax.while_loop`` inside ``jax.shard_map`` under jit: zero host
round-trips per iteration, and every scalar in the carry is replicated so
all shards take identical branches. Reuses the exact loop kernel of the
single-chip solver (solvers/power.py:power_iteration_loop), so semantics
(breakdown, iteration counts, stopping rule — power_method.hpp:47-99) are
identical by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.options import SolverOptions
from ..core.results import EigenResult
from ..solvers.power import power_iteration_loop
from ..utils.prng import default_key, random_unit_vector
from .mesh import ROW_AXIS
from .sharded import (PartitionedELL, psum_norm, psum_vdot, spmv_all_gather,
                      spmv_halo)


@partial(jax.jit, static_argnames=("mesh", "axis", "exchange"))
def _distributed_power(A: PartitionedELL, x0: jax.Array,
                       max_iterations: jax.Array, tol: jax.Array,
                       mesh: Mesh, axis: str, exchange: str) -> EigenResult:
    body = spmv_halo if exchange == "halo" else spmv_all_gather

    def local_loop(data, indices, x0_local):
        def matvec(x_local):
            return body(data, indices, x_local, axis=axis)

        return power_iteration_loop(
            matvec,
            lambda a, b: psum_vdot(a, b, axis=axis),
            lambda v: psum_norm(v, axis=axis),
            x0_local, max_iterations, tol)

    return jax.shard_map(
        local_loop, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=EigenResult(eigenvalue=P(), eigenvector=P(axis),
                              iterations=P(), converged=P()),
    )(A.data, A.indices, x0)


def distributed_power_method(A: PartitionedELL, mesh: Mesh,
                             opts: SolverOptions = SolverOptions(), *,
                             axis: str = ROW_AXIS, exchange: str = "auto",
                             key=None, x0=None) -> EigenResult:
    """Dominant eigenpair of a row-partitioned operator.

    ``A`` comes from ``partition_ell``; padding rows/columns are zero, so
    the padded operator's spectrum is the original one plus zero
    eigenvalues — harmless for the dominant pair as long as the start
    vector's padding entries are zero (enforced here).
    """
    if exchange == "auto":
        exchange = "halo" if A.halo_ok else "all_gather"
    n, n_pad = A.n_orig, A.n_padded
    if x0 is None:
        xh = np.asarray(random_unit_vector(key if key is not None else default_key(),
                                           n, A.dtype))
    else:
        xh = np.asarray(x0, dtype=A.dtype)
        nrm = np.linalg.norm(xh)
        if nrm != 0:
            xh = xh / nrm
    xp = np.zeros(n_pad, dtype=A.dtype)
    xp[:n] = xh
    x0_sharded = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P(axis)))

    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    res = _distributed_power(A, x0_sharded,
                             jnp.asarray(opts.max_iterations, jnp.int32),
                             jnp.asarray(opts.tolerance, ftype),
                             mesh, axis, exchange)
    return res
