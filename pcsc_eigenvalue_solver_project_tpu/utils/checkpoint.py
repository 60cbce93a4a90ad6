"""Checkpoint / resume for long-running solves.

The reference runs to completion in memory with no serialisation
(SURVEY.md §5 — 'Checkpoint/resume: absent'). The TPU framework's
long-running config (1M-row distributed power iteration) warrants
persistence: solver state is a tiny pytree (x, lambda, k, flags), saved
with orbax every ``chunk`` iterations so a preempted job resumes where it
stopped instead of restarting thousands of SpMVs.

``power_method_checkpointed`` drives the standard loop kernel
(solvers/power.py) in chunks: each chunk is one on-device ``while_loop``
segment, with a host-side orbax save between chunks. Semantics (stopping
rule, iteration counts) are identical to ``power_method`` because it IS
the same loop carry.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.options import SolverOptions
from ..core.results import EigenResult
from ..matrix.protocol import AbstractMatrix, require_nonempty, require_square
from ..solvers.power import (carry_to_result, power_carry_loop,
                             power_init_carry)
from .prng import default_key, random_unit_vector


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_state(path: str, state) -> None:
    """Persist a solver-state pytree (overwrites)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state),
               save_args=None, force=True)


def restore_state(path: str):
    """Load a solver-state pytree, or None if absent."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    return _checkpointer().restore(path)


@jax.jit
def _power_chunk(M: AbstractMatrix, carry, k_end: jax.Array, tol: jax.Array):
    return power_carry_loop(M.matvec, jnp.vdot, jnp.linalg.norm, carry,
                            k_end, tol)


def power_method_checkpointed(M: AbstractMatrix,
                              opts: SolverOptions = SolverOptions(), *,
                              checkpoint_dir: str, chunk: int = 200,
                              key=None, x0=None) -> EigenResult:
    """Power iteration with periodic orbax checkpoints and auto-resume.

    State layout: the loop carry of solvers/power.py plus nothing else —
    restoring and continuing produces the same iterate sequence as an
    uninterrupted run.
    """
    require_square(M, "power_method")
    require_nonempty(M, "power_method")
    path = os.path.join(os.path.abspath(checkpoint_dir), "power_state")

    restored = restore_state(path)
    if restored is not None:
        carry = tuple(jnp.asarray(v) for v in restored)
    else:
        if x0 is None:
            x0 = random_unit_vector(key if key is not None else default_key(),
                                    M.shape[0], M.dtype)
        else:
            x0 = jnp.asarray(x0, M.dtype)
            nrm = jnp.linalg.norm(x0)
            x0 = jnp.where(nrm == 0, x0, x0 / jnp.where(nrm == 0, 1, nrm).astype(M.dtype))
        carry = power_init_carry(M.matvec, x0)

    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    tol = jnp.asarray(opts.tolerance, ftype)
    while True:
        k = int(carry[0])
        done = bool(carry[7])
        if done or k >= opts.max_iterations:
            break
        k_end = jnp.asarray(min(k + chunk, opts.max_iterations), jnp.int32)
        carry = _power_chunk(M, carry, k_end, tol)
        save_state(path, carry)
    return carry_to_result(carry)
