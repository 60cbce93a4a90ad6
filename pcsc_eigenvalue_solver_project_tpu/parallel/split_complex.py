"""Distributed split-plane complex power iteration — complex eigenproblems
at the 1M-row scale with NO complex dtype anywhere.

The real distributed paths (parallel/dia.py) carry one plane; here the
operator is re/im diagonal planes ``(2, k, n)`` column-sharded over the
row mesh, the iterate is ``(2, rows_local)`` planes, the halo exchange
moves both planes' boundary strips (one ppermute pair on a (2, halo)
array), and the fused plane arithmetic of ops/split_complex.py runs on
shifted window slices. Reductions are psum'd plane forms; the loop reuses
the exact split power semantics of solvers/power.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.options import SolverOptions
from ..core.results import EigenResult
from ..matrix.split_complex import SplitComplexDIA
from ..ops.split_complex import splitc_is_close_relative
from .mesh import ROW_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedSplitComplexDIA:
    """Complex banded operator as row-partitioned re/im diagonal planes."""

    planes: jax.Array  # (2, k, n_padded) sharded P(None, None, rows)
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    n_orig: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_padded(self) -> int:
        return self.planes.shape[2]

    @property
    def dtype(self):
        return np.dtype(self.planes.dtype)


def partition_splitc_dia(m: SplitComplexDIA, mesh: Mesh, *,
                         axis: str = ROW_AXIS) -> PartitionedSplitComplexDIA:
    n = m.shape[0]
    p = mesh.shape[axis]
    rps = -(-n // p)
    n_pad = rps * p
    bw = max((abs(o) for o in m.offsets), default=0)
    if bw > rps:
        raise ValueError(
            f"partition_splitc_dia: bandwidth ({bw}) exceeds rows per "
            f"shard ({rps})")
    planes = np.zeros((2, m.planes.shape[1], n_pad), m.dtype)
    planes[:, :, :n] = np.asarray(m.planes)
    sharding = NamedSharding(mesh, P(None, None, axis))
    return PartitionedSplitComplexDIA(
        planes=jax.device_put(jnp.asarray(planes), sharding),
        offsets=m.offsets, n_orig=n, n_shards=p, halo=max(bw, 1))


def _splitc_halo_window(x_local, halo, *, axis: str = ROW_AXIS):
    """[left | local | right] on both planes: x_local (2, rps) ->
    (2, rps + 2*halo). Two ppermutes move both planes at once."""
    p = jax.lax.axis_size(axis)
    perm_fwd = [(j, (j + 1) % p) for j in range(p)]
    perm_bwd = [(j, (j - 1) % p) for j in range(p)]
    left = jax.lax.ppermute(x_local[:, -halo:], axis, perm_fwd)
    right = jax.lax.ppermute(x_local[:, :halo], axis, perm_bwd)
    return jnp.concatenate([left, x_local, right], axis=1)


def _splitc_window_matvec(planes_local, offsets, w, halo):
    """Fused plane banded matvec from a haloed window: planes_local
    (2, k, rps), w (2, rps + 2*halo) -> (2, rps)."""
    rps = planes_local.shape[2]
    yr = jnp.zeros((rps,), planes_local.dtype)
    yi = jnp.zeros((rps,), planes_local.dtype)
    for d, off in enumerate(offsets):
        sr = jax.lax.slice_in_dim(w[0], halo + off, halo + off + rps)
        si = jax.lax.slice_in_dim(w[1], halo + off, halo + off + rps)
        vr = planes_local[0, d]
        vi = planes_local[1, d]
        yr = yr + vr * sr - vi * si
        yi = yi + vr * si + vi * sr
    return jnp.stack([yr, yi])


def _psum_splitc_norm(v, axis):
    return jnp.sqrt(jax.lax.psum(jnp.sum(v * v), axis))


def _psum_splitc_vdot(a, b, axis):
    re = jax.lax.psum(jnp.sum(a[0] * b[0] + a[1] * b[1]), axis)
    im = jax.lax.psum(jnp.sum(a[0] * b[1] - a[1] * b[0]), axis)
    return jnp.stack([re, im])


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _distributed_splitc_power(A: PartitionedSplitComplexDIA, x0: jax.Array,
                              max_iterations: jax.Array, tol: jax.Array,
                              mesh: Mesh, axis: str) -> EigenResult:
    def local_loop(planes, x0_local):
        rdt = x0_local.dtype

        def matvec(x_local):
            w = _splitc_halo_window(x_local, A.halo, axis=axis)
            return _splitc_window_matvec(planes, A.offsets, w, A.halo)

        def cond(c):
            k, x, z, lam, initialized, converged, used, done = c
            return jnp.logical_and(k < max_iterations, jnp.logical_not(done))

        def body(c):
            k, x, z, lam, initialized, converged, used, done = c
            y = z
            norm_y = _psum_splitc_norm(y, axis)
            breakdown = norm_y == 0
            safe = jnp.where(breakdown, jnp.ones((), rdt), norm_y)
            x_new = y / safe
            z_new = matvec(x_new)
            lam_new = _psum_splitc_vdot(x_new, z_new, axis)
            conv_now = jnp.logical_and(
                initialized, splitc_is_close_relative(lam_new, lam, tol))
            conv_now = jnp.logical_and(conv_now, jnp.logical_not(breakdown))
            return (
                k + 1,
                jnp.where(breakdown, x, x_new),
                jnp.where(breakdown, z, z_new),
                jnp.where(breakdown, lam, lam_new),
                jnp.logical_or(initialized, jnp.logical_not(breakdown)),
                jnp.logical_or(converged, conv_now),
                k + 1,
                jnp.logical_or(done, jnp.logical_or(breakdown, conv_now)),
            )

        init = (
            jnp.zeros((), jnp.int32),
            x0_local,
            matvec(x0_local),
            jnp.zeros((2,), rdt),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.zeros((), jnp.int32),
            jnp.asarray(False),
        )
        k, x, z, lam, initialized, converged, used, done = \
            jax.lax.while_loop(cond, body, init)
        return EigenResult(eigenvalue=lam, eigenvector=x, iterations=used,
                           converged=converged)

    return jax.shard_map(
        local_loop, mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=EigenResult(eigenvalue=P(), eigenvector=P(None, axis),
                              iterations=P(), converged=P()),
    )(A.planes, x0)


def distributed_splitc_power_method(A: PartitionedSplitComplexDIA, mesh: Mesh,
                                    opts: SolverOptions = SolverOptions(), *,
                                    axis: str = ROW_AXIS, key=None,
                                    x0=None) -> EigenResult:
    """Dominant eigenpair of a row-partitioned complex banded operator.

    ``eigenvalue`` is a (2,) plane scalar; ``eigenvector`` the sharded
    (2, n_padded) plane iterate (slice ``[:, :A.n_orig]`` after
    device_get; convert with ``ops.split_complex.from_planes``)."""
    from ..utils.prng import default_key
    n, n_pad = A.n_orig, A.n_padded
    rdt = jnp.dtype(A.dtype)
    if x0 is None:
        xh = np.asarray(jax.random.uniform(
            key if key is not None else default_key(), (2, n), rdt,
            minval=-1.0, maxval=1.0))
    else:
        xh = np.asarray(x0, rdt)
        if xh.shape != (2, n):
            raise ValueError(
                "distributed_splitc_power_method: x0 must be (2, n) planes")
    nrm = np.linalg.norm(xh)
    if nrm != 0:
        xh = xh / nrm
    xp = np.zeros((2, n_pad), rdt)
    xp[:, :n] = xh
    x0_sharded = jax.device_put(jnp.asarray(xp),
                                NamedSharding(mesh, P(None, axis)))
    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return _distributed_splitc_power(
        A, x0_sharded, jnp.asarray(opts.max_iterations, jnp.int32),
        jnp.asarray(opts.tolerance, ftype), mesh, axis)
