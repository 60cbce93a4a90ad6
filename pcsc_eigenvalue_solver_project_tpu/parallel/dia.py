"""Row-partitioned DIA (banded) operator — the bandwidth-optimal
distributed SpMV.

For banded operators the general ELL partition (parallel/sharded.py) pays
for a gather per nnz; the DIA layout keeps the distributed SpMV fully
gather-free: each shard holds its column-slice of the diagonal planes
``(k, rows_per_shard)``, exchanges only ``bandwidth`` halo entries of x
with each neighbor over ICI (``ppermute``), and multiplies shifted window
slices — unit-stride reads end to end. The two halo permutes are
independent of the local-band compute, so XLA overlaps them.

Zero padding rows keep the spectrum clean exactly as in PartitionedELL
(pads never excited when the iterate starts zero there).
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
from ..matrix.dia import SparseDIA
from ..solvers.power import power_iteration_loop
from ..utils.prng import default_key, random_unit_vector
from .mesh import ROW_AXIS
from .sharded import psum_norm, psum_vdot


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedDIA:
    """Banded operator with diagonal planes column-sharded over the mesh."""

    data: jax.Array  # (k, n_padded) sharded P(None, rows)
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    n_orig: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_padded(self) -> int:
        return self.data.shape[1]

    @property
    def rows_per_shard(self) -> int:
        return self.n_padded // self.n_shards

    @property
    def dtype(self):
        return np.dtype(self.data.dtype)

    @property
    def nnz(self) -> int:
        return int(np.count_nonzero(np.asarray(self.data)))


def partition_dia(m: SparseDIA, mesh: Mesh, *, axis: str = ROW_AXIS) -> PartitionedDIA:
    """Pad + place a banded operator over a 1-D mesh."""
    n = m.shape[0]
    n_shards = mesh.shape[axis]
    rows_per_shard = -(-n // n_shards)
    n_padded = rows_per_shard * n_shards
    bw = m.bandwidth
    if bw > rows_per_shard:
        raise ValueError(
            f"partition_dia: bandwidth ({bw}) exceeds rows per shard "
            f"({rows_per_shard}); use the ELL partition with all_gather instead")
    data = np.zeros((m.data.shape[0], n_padded), dtype=m.dtype)
    data[:, :n] = np.asarray(m.data)
    sharding = NamedSharding(mesh, P(None, axis))
    return PartitionedDIA(
        data=jax.device_put(jnp.asarray(data), sharding),
        offsets=m.offsets, n_orig=n, n_shards=n_shards, halo=max(bw, 1))


def dia_window_matvec(vals_local, offsets, x_window, halo):
    """Local banded matvec: y[i] = sum_d vals[d, i] * window[halo + i + off].

    ``x_window`` has ``halo`` neighbor entries on each side of the local
    block; offsets are static so every slice is static."""
    rps = vals_local.shape[1]
    y = jnp.zeros((rps,), vals_local.dtype)
    for d, off in enumerate(offsets):
        y = y + vals_local[d] * jax.lax.slice_in_dim(
            x_window, halo + off, halo + off + rps)
    return y


def dia_halo_window(x_local, halo, *, axis: str = ROW_AXIS):
    """Build [left-halo | x_local | right-halo] via two neighbor permutes."""
    p = jax.lax.axis_size(axis)
    perm_fwd = [(j, (j + 1) % p) for j in range(p)]   # j's tail -> j+1's left halo
    perm_bwd = [(j, (j - 1) % p) for j in range(p)]   # j's head -> j-1's right halo
    left = jax.lax.ppermute(x_local[-halo:], axis, perm_fwd)
    right = jax.lax.ppermute(x_local[:halo], axis, perm_bwd)
    return jnp.concatenate([left, x_local, right])


def distributed_dia_matvec(A: PartitionedDIA, x, mesh: Mesh, *,
                           axis: str = ROW_AXIS):
    """One distributed banded SpMV (jittable): sharded x -> sharded y."""

    def local(data, x_local):
        w = dia_halo_window(x_local, A.halo, axis=axis)
        return dia_window_matvec(data, A.offsets, w, A.halo)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
    )(A.data, x)


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _distributed_dia_power(A: PartitionedDIA, x0: jax.Array,
                           max_iterations: jax.Array, tol: jax.Array,
                           mesh: Mesh, axis: str) -> EigenResult:
    def local_loop(data, x0_local):
        def matvec(x_local):
            w = dia_halo_window(x_local, A.halo, axis=axis)
            return dia_window_matvec(data, A.offsets, w, A.halo)

        return power_iteration_loop(
            matvec,
            lambda a, b: psum_vdot(a, b, axis=axis),
            lambda v: psum_norm(v, axis=axis),
            x0_local, max_iterations, tol)

    return jax.shard_map(
        local_loop, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=EigenResult(eigenvalue=P(), eigenvector=P(axis),
                              iterations=P(), converged=P()),
    )(A.data, x0)


def distributed_dia_power_method(A: PartitionedDIA, mesh: Mesh,
                                 opts: SolverOptions = SolverOptions(), *,
                                 axis: str = ROW_AXIS, key=None,
                                 x0=None) -> EigenResult:
    """Dominant eigenpair of a row-partitioned banded operator."""
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
    return _distributed_dia_power(A, x0_sharded,
                                  jnp.asarray(opts.max_iterations, jnp.int32),
                                  jnp.asarray(opts.tolerance, ftype), mesh, axis)
