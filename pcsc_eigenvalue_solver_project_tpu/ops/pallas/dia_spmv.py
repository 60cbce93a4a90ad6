"""Pallas TPU kernel: single-pass DIA (banded) SpMV.

Why a kernel: XLA fuses the shifted multiply-accumulate chain of a DIA
matvec well in isolation (~290 GB/s measured) but NOT inside
``lax.while_loop`` solver bodies, where it decomposes into ~3 dispatches
per diagonal (~580 us/iteration for a 33-band 100K-row operator — 13x off
bandwidth). This kernel reads each diagonal block and the x window once,
does the whole band in one VPU pass, and writes the y tile once:
traffic = vals + x + y, the speed-of-light regime for SpMV.

Layout (all 2-D, TPU-native (sublane, 128-lane) tiles):
- ``x`` lives as ``(R + 2*PR, 128)`` rows — PR halo rows of zeros on each
  side so every shifted access stays in range;
- ``vals`` lives as ``(k, R, 128)`` — diagonal d of the operator,
  row-indexed (matrix/dia.py convention), reshaped to rows;
- a shift by ``off = q*128 + r`` becomes a static sublane slice (q) plus a
  lane roll (r) with a two-source blend at the lane seam — register-level
  data movement, never an unaligned memory access (Mosaic rejects those).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TILE_ROWS = 128  # 128 rows x 128 lanes = 16384 elements per tile


def _dia_kernel(x_ref, vals_ref, out_ref, *, offsets, pr, tile_rows):
    """One output tile: acc[i, l] = sum_d vals[d, i, l] * x[i*128 + l + off_d].

    A shift by off = q*LANES + r decomposes into a lane roll by r (shared
    across all diagonals with the same r — rolled ONCE on the whole window,
    since lane rolls act row-independently) plus static sublane slices for
    q and the seam row, blended at the lane boundary.
    """
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    # x_ref holds the whole padded vector (rows + 2*pr, LANES) in VMEM; the
    # window load offset i*tile_rows is sublane-aligned (tile_rows % 8 == 0).
    row_base = pl.multiple_of(i * tile_rows, tile_rows)
    w = x_ref[pl.ds(row_base, tile_rows + 2 * pr), :]

    by_r: dict = {}
    for d, off in enumerate(offsets):
        q, r = divmod(off, LANES)
        by_r.setdefault(r, []).append((d, q))

    # accumulate in >= f32 even for bf16 diagonal storage
    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc = jnp.zeros((tile_rows, LANES), acc_dt)
    for r, items in by_r.items():
        w_rot = w if r == 0 else pltpu.roll(w, LANES - r, 1)
        for d, q in items:
            a = jax.lax.slice_in_dim(w_rot, pr + q, pr + q + tile_rows, axis=0)
            if r == 0:
                seg = a
            else:
                b = jax.lax.slice_in_dim(w_rot, pr + q + 1, pr + q + 1 + tile_rows,
                                         axis=0)
                seg = jnp.where(lane < LANES - r, a, b)
            acc = acc + vals_ref[d].astype(acc_dt) * seg.astype(acc_dt)
    out_ref[...] = acc


def _dia_complex_kernel(x_ref, vals_ref, out_ref, *, offsets, pr, tile_rows):
    """Split-plane complex tile: planes stacked on a leading axis of size 2
    (0=re, 1=im). One pass reads both value planes and both x planes and
    emits y_re = Ar xr - Ai xi, y_im = Ar xi + Ai xr — the fused complex
    SpMV (Pallas has no complex dtypes; this is the idiomatic carry)."""
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    row_base = pl.multiple_of(i * tile_rows, tile_rows)
    w_re = x_ref[0, pl.ds(row_base, tile_rows + 2 * pr), :]
    w_im = x_ref[1, pl.ds(row_base, tile_rows + 2 * pr), :]

    by_r: dict = {}
    for d, off in enumerate(offsets):
        q, r = divmod(off, LANES)
        by_r.setdefault(r, []).append((d, q))

    acc_re = jnp.zeros((tile_rows, LANES), w_re.dtype)
    acc_im = jnp.zeros((tile_rows, LANES), w_re.dtype)
    for r, items in by_r.items():
        wr = w_re if r == 0 else pltpu.roll(w_re, LANES - r, 1)
        wi = w_im if r == 0 else pltpu.roll(w_im, LANES - r, 1)
        for d, q in items:
            a_re = jax.lax.slice_in_dim(wr, pr + q, pr + q + tile_rows, axis=0)
            a_im = jax.lax.slice_in_dim(wi, pr + q, pr + q + tile_rows, axis=0)
            if r == 0:
                seg_re, seg_im = a_re, a_im
            else:
                b_re = jax.lax.slice_in_dim(wr, pr + q + 1, pr + q + 1 + tile_rows, axis=0)
                b_im = jax.lax.slice_in_dim(wi, pr + q + 1, pr + q + 1 + tile_rows, axis=0)
                sel = lane < LANES - r
                seg_re = jnp.where(sel, a_re, b_re)
                seg_im = jnp.where(sel, a_im, b_im)
            vre = vals_ref[0, d]
            vim = vals_ref[1, d]
            acc_re = acc_re + vre * seg_re - vim * seg_im
            acc_im = acc_im + vre * seg_im + vim * seg_re
    out_ref[0] = acc_re
    out_ref[1] = acc_im


@functools.partial(jax.jit, static_argnames=("offsets", "tile_rows", "interpret"))
def _dia_matvec_pallas_planes(vals_p: jax.Array, x_p: jax.Array, offsets: tuple,
                              tile_rows: int, interpret: bool) -> jax.Array:
    """Split-plane complex SpMV: vals_p (2, k, n) real, x_p (2, n) real ->
    (2, n) real. The on-TPU complex representation (no complex dtypes exist
    on this backend)."""
    _, k, n = vals_p.shape
    rows = -(-n // (tile_rows * LANES)) * tile_rows
    n_pad = rows * LANES
    bw = max((abs(o) for o in offsets), default=0)
    pr = max(-(-bw // LANES), 1)
    rdt = vals_p.dtype

    x2 = jnp.zeros((2, rows + 2 * pr, LANES), rdt)
    x2 = x2.at[:, pr:pr + rows, :].set(
        jnp.pad(x_p, ((0, 0), (0, n_pad - n))).reshape(2, rows, LANES))
    vals3 = jnp.pad(vals_p, ((0, 0), (0, 0), (0, n_pad - n))).reshape(
        2, k, rows, LANES)

    grid = (rows // tile_rows,)
    out = pl.pallas_call(
        functools.partial(_dia_complex_kernel, offsets=offsets, pr=pr,
                          tile_rows=tile_rows),
        out_shape=jax.ShapeDtypeStruct((2, rows, LANES), rdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((2, k, tile_rows, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile_rows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * k * n, transcendentals=0,
            bytes_accessed=(2 * k * n + 4 * n) * jnp.dtype(rdt).itemsize),
        interpret=interpret,
    )(x2, vals3)
    return out.reshape(2, n_pad)[:, :n]


def dia_matvec_planes(vals_p: jax.Array, offsets: tuple, x_p: jax.Array, *,
                      tile_rows: int = DEFAULT_TILE_ROWS,
                      force: str | None = None) -> jax.Array:
    """Split-plane banded complex SpMV dispatch (real arrays only).

    ``vals_p`` (2, k, n), ``x_p`` (2, n); returns (2, n). ``force`` as in
    ``dia_matvec``. The XLA fallback uses plane arithmetic, so this runs on
    every backend including TPUs without complex support.
    """
    _, k, n = vals_p.shape
    interpret = force == "interpret"
    use_pallas = (force in ("pallas", "interpret")
                  or (force is None and _backend_supports_pallas()
                      and vals_p.dtype == jnp.float32 and n >= tile_rows * LANES))
    if use_pallas:
        return _dia_matvec_pallas_planes(vals_p, x_p, tuple(offsets),
                                         tile_rows, interpret)

    yr = jnp.zeros((n,), vals_p.dtype)
    yi = jnp.zeros((n,), vals_p.dtype)
    for d, off in enumerate(offsets):
        if off >= 0:
            sr = jnp.pad(x_p[0, off:], (0, off)) if off else x_p[0]
            si = jnp.pad(x_p[1, off:], (0, off)) if off else x_p[1]
        else:
            sr = jnp.pad(x_p[0, :off], (-off, 0))
            si = jnp.pad(x_p[1, :off], (-off, 0))
        vr, vi = vals_p[0, d], vals_p[1, d]
        yr = yr + vr * sr - vi * si
        yi = yi + vr * si + vi * sr
    return jnp.stack([yr, yi])


@functools.partial(jax.jit, static_argnames=("offsets", "tile_rows", "interpret"))
def _dia_matvec_pallas(vals: jax.Array, x: jax.Array, offsets: tuple,
                       tile_rows: int, interpret: bool) -> jax.Array:
    k, n = vals.shape
    rows = -(-n // (tile_rows * LANES)) * tile_rows
    n_pad = rows * LANES
    bw = max((abs(o) for o in offsets), default=0)
    pr = max(-(-bw // LANES), 1)  # halo rows

    x2 = jnp.zeros((rows + 2 * pr, LANES), x.dtype)
    x2 = x2.at[pr:pr + rows, :].set(
        jnp.pad(x, (0, n_pad - n)).reshape(rows, LANES))
    vals3 = jnp.pad(vals, ((0, 0), (0, n_pad - n))).reshape(k, rows, LANES)

    grid = (rows // tile_rows,)
    out_dt = jnp.promote_types(vals.dtype, jnp.float32)
    out = pl.pallas_call(
        functools.partial(_dia_kernel, offsets=offsets, pr=pr, tile_rows=tile_rows),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), out_dt),
        grid=grid,
        in_specs=[
            # whole padded x in VMEM; the kernel slices its own overlapping
            # window (overlap is inexpressible through blocked index maps)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n, transcendentals=0,
            bytes_accessed=(k * n + 2 * n) * vals.dtype.itemsize),
        interpret=interpret,
    )(x2, vals3)
    return out.reshape(n_pad)[:n]


def _dia_block_kernel(x_ref, vals_ref, out_ref, *, offsets, pr, tile_rows, nvec):
    """Block SpMM tile: nvec stacked vectors share ONE read of the
    diagonal block — arithmetic intensity scales with nvec, which is the
    whole point of block (subspace) iteration on a bandwidth-bound op."""
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    row_base = pl.multiple_of(i * tile_rows, tile_rows)
    w = x_ref[:, pl.ds(row_base, tile_rows + 2 * pr), :]  # (nvec, win, LANES)

    by_r: dict = {}
    for d, off in enumerate(offsets):
        q, r = divmod(off, LANES)
        by_r.setdefault(r, []).append((d, q))

    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc = jnp.zeros((nvec, tile_rows, LANES), acc_dt)
    for r, items in by_r.items():
        w_rot = w if r == 0 else pltpu.roll(w, LANES - r, 2)
        for d, q in items:
            a = jax.lax.slice_in_dim(w_rot, pr + q, pr + q + tile_rows, axis=1)
            if r == 0:
                seg = a
            else:
                b = jax.lax.slice_in_dim(w_rot, pr + q + 1, pr + q + 1 + tile_rows,
                                         axis=1)
                seg = jnp.where(lane[None] < LANES - r, a, b)
            v = vals_ref[d].astype(acc_dt)  # (tile_rows, LANES)
            acc = acc + v[None] * seg.astype(acc_dt)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "tile_rows", "interpret"))
def _dia_matmat_pallas(vals: jax.Array, xs: jax.Array, offsets: tuple,
                       tile_rows: int, interpret: bool) -> jax.Array:
    """Block SpMM: vals (k, n) real, xs (nvec, n) -> (nvec, n)."""
    k, n = vals.shape
    nvec = xs.shape[0]
    rows = -(-n // (tile_rows * LANES)) * tile_rows
    n_pad = rows * LANES
    bw = max((abs(o) for o in offsets), default=0)
    pr = max(-(-bw // LANES), 1)

    x2 = jnp.zeros((nvec, rows + 2 * pr, LANES), xs.dtype)
    x2 = x2.at[:, pr:pr + rows, :].set(
        jnp.pad(xs, ((0, 0), (0, n_pad - n))).reshape(nvec, rows, LANES))
    vals3 = jnp.pad(vals, ((0, 0), (0, n_pad - n))).reshape(k, rows, LANES)

    grid = (rows // tile_rows,)
    out_dt = jnp.promote_types(vals.dtype, jnp.float32)
    out = pl.pallas_call(
        functools.partial(_dia_block_kernel, offsets=offsets, pr=pr,
                          tile_rows=tile_rows, nvec=nvec),
        out_shape=jax.ShapeDtypeStruct((nvec, rows, LANES), out_dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nvec, tile_rows, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n * nvec, transcendentals=0,
            bytes_accessed=(k * n + 2 * nvec * n) * vals.dtype.itemsize),
        interpret=interpret,
    )(x2, vals3)
    return out.reshape(nvec, n_pad)[:, :n]


def dia_matmat(vals: jax.Array, offsets: tuple, xs: jax.Array, *,
               tile_rows: int = DEFAULT_TILE_ROWS,
               force: str | None = None) -> jax.Array:
    """Banded SpMM dispatch: xs (nvec, n) -> (nvec, n); real dtypes."""
    k, n = vals.shape
    interpret = force == "interpret"
    use_pallas = (force in ("pallas", "interpret")
                  or (force is None and _backend_supports_pallas()
                      and vals.dtype in (jnp.float32, jnp.bfloat16)
                      and n >= tile_rows * LANES))
    if use_pallas:
        return _dia_matmat_pallas(vals, xs, tuple(offsets), tile_rows, interpret)

    ys = jnp.zeros_like(xs)
    for d, off in enumerate(offsets):
        if off >= 0:
            seg = jnp.pad(xs[:, off:], ((0, 0), (0, off))) if off else xs
        else:
            seg = jnp.pad(xs[:, :off], ((0, 0), (-off, 0)))
        ys = ys + vals[d][None] * seg
    return ys


def _backend_supports_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


# --------------------------------------------------------------------------
# Interleaved (lane-major) layout — the fast path.
#
# The row-major kernels above pay ~1 lane-roll per distinct ``off % 128``
# residue per tile (up to 32 full-window VPU shuffles for a 33-band operator)
# plus a two-source lane blend per diagonal; measured VPU-bound at ~39% of
# HBM speed-of-light. Storing the vector LANE-MAJOR — element ``i`` at
# ``(sublane = i % R, lane = i // R)`` so each of the 128 lanes holds a
# contiguous chunk of R elements — turns a shift by ``off`` into a SUBLANE
# shift. Grouping diagonals by ``off % 8`` (vreg sublane count) leaves at
# most EIGHT sublane rolls per tile; each diagonal then needs only a
# vreg-ALIGNED static slice (free) and one FMA. Lane crossings happen only
# at chunk boundaries and are pre-materialised as PR halo sublanes on the
# window (PR = bandwidth rounded up to 8).
# --------------------------------------------------------------------------

_SUB = 8  # f32 sublanes per vreg
DEFAULT_IL_TILE = 64  # measured best on v5e (289 Gnnz/s bf16, 33-band 100K)


def il_rows(n: int, tile_s: int = DEFAULT_IL_TILE) -> int:
    """Sublane count R for the interleaved layout of an n-vector
    (rounded so the padded size R*128 tiles evenly)."""
    return -(-(-(-n // LANES)) // tile_s) * tile_s


def _il_halo(offsets) -> int:
    bw = max((abs(o) for o in offsets), default=0)
    return max(-(-bw // _SUB) * _SUB, _SUB)


def interleave_vec(x: jax.Array, R: int) -> jax.Array:
    """(n,) -> (R, 128) lane-major: element i at (i % R, i // R)."""
    n = x.shape[0]
    return jnp.pad(x, (0, R * LANES - n)).reshape(LANES, R).T


def deinterleave_vec(x_il: jax.Array, n: int) -> jax.Array:
    """(R, 128) lane-major -> (n,)."""
    return x_il.T.reshape(-1)[:n]


def interleave_dia_vals(vals: jax.Array, R: int) -> jax.Array:
    """(k, n) diagonals -> (k, R, 128) lane-major (one-time transform)."""
    k, n = vals.shape
    return jnp.pad(vals, ((0, 0), (0, R * LANES - n))).reshape(
        k, LANES, R).transpose(0, 2, 1)


def _il_window(x_il: jax.Array, pr: int) -> jax.Array:
    """Haloed window (R + 2*pr, 128): pr sublanes above/below each chunk,
    carrying the tail/head of the NEIGHBOURING lane's chunk (zero at the
    array edges). After this, x[i + off] for |off| <= pr is the pure
    sublane access window[pr + (i % R) + off, i // R]."""
    R = x_il.shape[0]
    top = jnp.pad(x_il[R - pr:, : LANES - 1], ((0, 0), (1, 0)))
    bot = jnp.pad(x_il[:pr, 1:], ((0, 0), (0, 1)))
    return jnp.concatenate([top, x_il, bot], axis=0)


def _il_plan(offsets, pr):
    """Static kernel plan: [(b, ((d, aligned_start), ...)), ...] grouped by
    the mod-8 residue b of each diagonal's window shift."""
    by_b: dict = {}
    for d, off in enumerate(offsets):
        t = pr + off
        b = t % _SUB
        by_b.setdefault(b, []).append((d, t - b))
    return tuple((b, tuple(items)) for b, items in by_b.items())


def _dia_il_kernel(w_ref, vals_ref, out_ref, *, plan, pr, tile_s):
    """One (tile_s, 128) output tile: <= 8 sublane rolls shared across the
    band, then one aligned slice + FMA per diagonal."""
    i = pl.program_id(0)
    base = pl.multiple_of(i * tile_s, tile_s)
    win = tile_s + 2 * pr
    w = w_ref[pl.ds(base, win), :]
    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc = jnp.zeros((tile_s, LANES), acc_dt)
    for b, items in plan:
        wb = w if b == 0 else pltpu.roll(w, win - b, 0)  # wb[s] = w[s + b]
        for d, st in items:
            seg = jax.lax.slice_in_dim(wb, st, st + tile_s, axis=0)
            acc = acc + vals_ref[d].astype(acc_dt) * seg.astype(acc_dt)
    out_ref[...] = acc


# Above this many bytes the haloed x window streams from HBM per tile
# instead of living whole in VMEM (16 MiB VMEM minus vals double-buffers).
_WINDOW_VMEM_BUDGET = 4 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("offsets", "tile_s", "interpret"))
def _dia_matvec_il_pallas(vals_il: jax.Array, x_il: jax.Array, offsets: tuple,
                          tile_s: int, interpret: bool) -> jax.Array:
    pr = _il_halo(offsets)
    wdt = jnp.promote_types(x_il.dtype, jnp.float32)
    w = _il_window(x_il.astype(wdt), pr)
    return _dia_matvec_il_window_pallas(vals_il, w, offsets, tile_s, interpret)


def _dia_matvec_il_window_pallas(vals_il: jax.Array, w: jax.Array,
                                 offsets: tuple, tile_s: int,
                                 interpret: bool) -> jax.Array:
    """Core: SpMV from a PRE-BUILT haloed window (R + 2*pr, 128). The
    distributed path (parallel/dia.py) fills the seam-lane halo entries
    with neighbor-shard data via ppermute before calling this."""
    k, R, _ = vals_il.shape
    pr = _il_halo(offsets)
    wdt = w.dtype
    out_dt = jnp.promote_types(vals_il.dtype, jnp.float32)
    stream = w.size * w.dtype.itemsize > _WINDOW_VMEM_BUDGET and not interpret
    if stream:
        kernel = functools.partial(_dia_il_kernel_stream,
                                   plan=_il_plan(offsets, pr), pr=pr,
                                   tile_s=tile_s)
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((tile_s + 2 * pr, LANES), wdt),
                   pltpu.SemaphoreType.DMA]
    else:
        kernel = functools.partial(_dia_il_kernel, plan=_il_plan(offsets, pr),
                                   pr=pr, tile_s=tile_s)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANES), out_dt),
        grid=(R // tile_s,),
        in_specs=[
            x_spec,
            pl.BlockSpec((k, tile_s, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_s, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * R * LANES, transcendentals=0,
            bytes_accessed=(k * R * LANES + 2 * R * LANES)
            * vals_il.dtype.itemsize),
        interpret=interpret,
    )(w, vals_il)


def dia_matvec_il(vals_il: jax.Array, offsets: tuple, x_il: jax.Array, *,
                  tile_s: int = DEFAULT_IL_TILE,
                  force: str | None = None) -> jax.Array:
    """Interleaved-domain banded SpMV: (k, R, 128) x (R, 128) -> (R, 128).

    Both operands live in the lane-major layout of ``interleave_vec`` /
    ``interleave_dia_vals``; the result stays in that layout so solver
    loops never convert. Requires bandwidth < R (one-lane halo).
    """
    k, R, _ = vals_il.shape
    if _il_halo(offsets) > R:
        raise ValueError("dia_matvec_il: bandwidth exceeds chunk size R")
    interpret = force == "interpret"
    use_pallas = (force in ("pallas", "interpret")
                  or (force is None and _backend_supports_pallas()
                      and vals_il.dtype in (jnp.float32, jnp.bfloat16)))
    if use_pallas:
        return _dia_matvec_il_pallas(vals_il, x_il, tuple(offsets), tile_s,
                                     interpret)
    # XLA fallback: de-interleave, shifted-pad accumulate on the padded
    # vector (exact — boundary positions carry zero diagonal values).
    vals = vals_il.transpose(0, 2, 1).reshape(k, R * LANES)
    x = x_il.T.reshape(-1)
    y = jnp.zeros_like(x, dtype=jnp.promote_types(vals.dtype, x.dtype))
    for d, off in enumerate(offsets):
        if off >= 0:
            seg = jnp.pad(x[off:], (0, off)) if off else x
        else:
            seg = jnp.pad(x[:off], (-off, 0))
        y = y + vals[d] * seg
    return y.reshape(LANES, R).T


def il_window_halo(offsets) -> int:
    """The pr (sublane halo) a pre-built window for ``dia_matvec_il_window``
    must carry: bandwidth rounded up to the vreg sublane count."""
    return _il_halo(offsets)


def dia_matvec_il_window(vals_il: jax.Array, offsets: tuple, w: jax.Array, *,
                         tile_s: int = DEFAULT_IL_TILE,
                         force: str | None = None) -> jax.Array:
    """Interleaved SpMV from a caller-built haloed window (R + 2*pr, 128).

    Unlike ``dia_matvec_il`` (which zero-fills the global-edge seam halos),
    the window here may carry ANY values in the halo region — e.g. the
    neighbor shard's entries in the distributed row partition. Semantics:
    ``y[s, l] = sum_d vals[d, s, l] * w[pr + s + off_d, l]``.
    """
    k, R, _ = vals_il.shape
    pr = _il_halo(offsets)
    if w.shape[0] != R + 2 * pr:
        raise ValueError(
            f"dia_matvec_il_window: window has {w.shape[0]} sublanes, "
            f"expected R + 2*pr = {R + 2 * pr}")
    interpret = force == "interpret"
    use_pallas = (force in ("pallas", "interpret")
                  or (force is None and _backend_supports_pallas()
                      and vals_il.dtype in (jnp.float32, jnp.bfloat16)))
    if use_pallas:
        return _dia_matvec_il_window_pallas(
            vals_il, w.astype(jnp.promote_types(w.dtype, jnp.float32)),
            tuple(offsets), tile_s, interpret)
    out_dt = jnp.promote_types(vals_il.dtype, jnp.float32)
    y = jnp.zeros((R, w.shape[1]), out_dt)
    for d, off in enumerate(offsets):
        seg = jax.lax.slice_in_dim(w, pr + off, pr + off + R, axis=0)
        y = y + vals_il[d].astype(out_dt) * seg.astype(out_dt)
    return y


def _dia_il_kernel_stream(w_hbm, vals_ref, out_ref, w_vmem, sem, *,
                          plan, pr, tile_s):
    """Streamed-window variant: x's haloed window stays in HBM and each
    tile DMAs only its (tile_s + 2*pr, 128) slice into VMEM scratch — VMEM
    use is O(tile), not O(n), so arbitrarily large vectors fit. The x
    stream is 1/k of the diagonal traffic, so the serialized DMA is cheap
    (the vals stream is still double-buffered by the Pallas pipeline)."""
    i = pl.program_id(0)
    win = tile_s + 2 * pr
    cp = pltpu.make_async_copy(w_hbm.at[pl.ds(i * tile_s, win), :], w_vmem, sem)
    cp.start()
    cp.wait()
    w = w_vmem[...]
    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc = jnp.zeros((tile_s, LANES), acc_dt)
    for b, items in plan:
        wb = w if b == 0 else pltpu.roll(w, win - b, 0)
        for d, st in items:
            seg = jax.lax.slice_in_dim(wb, st, st + tile_s, axis=0)
            acc = acc + vals_ref[d].astype(acc_dt) * seg.astype(acc_dt)
    out_ref[...] = acc


def _dia_il_block_kernel_stream(w_hbm, vals_ref, out_ref, w_vmem, sem, *,
                                plan, pr, tile_s, nvec):
    i = pl.program_id(0)
    win = tile_s + 2 * pr
    cp = pltpu.make_async_copy(w_hbm.at[:, pl.ds(i * tile_s, win), :],
                               w_vmem, sem)
    cp.start()
    cp.wait()
    w = w_vmem[...]
    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc = jnp.zeros((nvec, tile_s, LANES), acc_dt)
    for b, items in plan:
        wb = w if b == 0 else pltpu.roll(w, win - b, 1)
        for d, st in items:
            seg = jax.lax.slice_in_dim(wb, st, st + tile_s, axis=1)
            acc = acc + vals_ref[d][None].astype(acc_dt) * seg.astype(acc_dt)
    out_ref[...] = acc


def _dia_il_planes_kernel(w_ref, vals_ref, out_ref, *, plan, pr, tile_s):
    """Split-plane complex tile in the interleaved layout: planes on the
    leading axis (0=re, 1=im); <=8 sublane rolls per plane per tile, then
    one aligned slice + 4 FMAs per diagonal (fused complex multiply)."""
    i = pl.program_id(0)
    win = tile_s + 2 * pr
    base = pl.multiple_of(i * tile_s, tile_s)
    w_re = w_ref[0, pl.ds(base, win), :]
    w_im = w_ref[1, pl.ds(base, win), :]
    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc_re = jnp.zeros((tile_s, LANES), acc_dt)
    acc_im = jnp.zeros((tile_s, LANES), acc_dt)
    for b, items in plan:
        wr = w_re if b == 0 else pltpu.roll(w_re, win - b, 0)
        wi = w_im if b == 0 else pltpu.roll(w_im, win - b, 0)
        for d, st in items:
            a_re = jax.lax.slice_in_dim(wr, st, st + tile_s, axis=0).astype(acc_dt)
            a_im = jax.lax.slice_in_dim(wi, st, st + tile_s, axis=0).astype(acc_dt)
            vre = vals_ref[0, d].astype(acc_dt)
            vim = vals_ref[1, d].astype(acc_dt)
            acc_re = acc_re + vre * a_re - vim * a_im
            acc_im = acc_im + vre * a_im + vim * a_re
    out_ref[0] = acc_re
    out_ref[1] = acc_im


def _dia_il_planes_kernel_stream(w_hbm, vals_ref, out_ref, w_vmem, sem, *,
                                 plan, pr, tile_s):
    i = pl.program_id(0)
    win = tile_s + 2 * pr
    cp = pltpu.make_async_copy(w_hbm.at[:, pl.ds(i * tile_s, win), :],
                               w_vmem, sem)
    cp.start()
    cp.wait()
    w_re = w_vmem[0]
    w_im = w_vmem[1]
    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc_re = jnp.zeros((tile_s, LANES), acc_dt)
    acc_im = jnp.zeros((tile_s, LANES), acc_dt)
    for b, items in plan:
        wr = w_re if b == 0 else pltpu.roll(w_re, win - b, 0)
        wi = w_im if b == 0 else pltpu.roll(w_im, win - b, 0)
        for d, st in items:
            a_re = jax.lax.slice_in_dim(wr, st, st + tile_s, axis=0).astype(acc_dt)
            a_im = jax.lax.slice_in_dim(wi, st, st + tile_s, axis=0).astype(acc_dt)
            vre = vals_ref[0, d].astype(acc_dt)
            vim = vals_ref[1, d].astype(acc_dt)
            acc_re = acc_re + vre * a_re - vim * a_im
            acc_im = acc_im + vre * a_im + vim * a_re
    out_ref[0] = acc_re
    out_ref[1] = acc_im


@functools.partial(jax.jit, static_argnames=("offsets", "tile_s", "interpret"))
def _dia_matvec_il_planes_pallas(vals_il_p: jax.Array, x_il_p: jax.Array,
                                 offsets: tuple, tile_s: int,
                                 interpret: bool) -> jax.Array:
    _, k, R, _ = vals_il_p.shape
    pr = _il_halo(offsets)
    wdt = jnp.promote_types(x_il_p.dtype, jnp.float32)
    w = jax.vmap(lambda v: _il_window(v, pr))(x_il_p.astype(wdt))
    out_dt = jnp.promote_types(vals_il_p.dtype, jnp.float32)
    stream = w.size * w.dtype.itemsize > _WINDOW_VMEM_BUDGET and not interpret
    if stream:
        kernel = functools.partial(_dia_il_planes_kernel_stream,
                                   plan=_il_plan(offsets, pr), pr=pr,
                                   tile_s=tile_s)
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((2, tile_s + 2 * pr, LANES), wdt),
                   pltpu.SemaphoreType.DMA]
    else:
        kernel = functools.partial(_dia_il_planes_kernel,
                                   plan=_il_plan(offsets, pr), pr=pr,
                                   tile_s=tile_s)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, R, LANES), out_dt),
        grid=(R // tile_s,),
        in_specs=[
            x_spec,
            pl.BlockSpec((2, k, tile_s, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile_s, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=8 * k * R * LANES, transcendentals=0,
            bytes_accessed=(2 * k * R * LANES + 4 * R * LANES)
            * vals_il_p.dtype.itemsize),
        interpret=interpret,
    )(w, vals_il_p)


def dia_matvec_il_planes(vals_il_p: jax.Array, offsets: tuple,
                         x_il_p: jax.Array, *,
                         tile_s: int = DEFAULT_IL_TILE,
                         force: str | None = None) -> jax.Array:
    """Interleaved split-plane complex SpMV: vals (2, k, R, 128) real,
    x (2, R, 128) real -> (2, R, 128) real (y = A x with A, x complex)."""
    _, k, R, _ = vals_il_p.shape
    if _il_halo(offsets) > R:
        raise ValueError("dia_matvec_il_planes: bandwidth exceeds chunk size R")
    interpret = force == "interpret"
    use_pallas = (force in ("pallas", "interpret")
                  or (force is None and _backend_supports_pallas()
                      and vals_il_p.dtype in (jnp.float32, jnp.bfloat16)))
    if use_pallas:
        return _dia_matvec_il_planes_pallas(vals_il_p, x_il_p, tuple(offsets),
                                            tile_s, interpret)
    vals_p = vals_il_p.transpose(0, 1, 3, 2).reshape(2, k, R * LANES)
    x_p = x_il_p.transpose(0, 2, 1).reshape(2, R * LANES)
    y = dia_matvec_planes(vals_p, offsets, x_p, force="xla")
    return y.reshape(2, LANES, R).transpose(0, 2, 1)


def _dia_il_block_kernel(w_ref, vals_ref, out_ref, *, plan, pr, tile_s, nvec):
    """Block variant: nvec stacked vectors share one read of the diagonal
    block; rolls/slices act on the (nvec, win, 128) window's sublane axis."""
    i = pl.program_id(0)
    base = pl.multiple_of(i * tile_s, tile_s)
    win = tile_s + 2 * pr
    w = w_ref[:, pl.ds(base, win), :]
    acc_dt = jnp.promote_types(vals_ref.dtype, jnp.float32)
    acc = jnp.zeros((nvec, tile_s, LANES), acc_dt)
    for b, items in plan:
        wb = w if b == 0 else pltpu.roll(w, win - b, 1)
        for d, st in items:
            seg = jax.lax.slice_in_dim(wb, st, st + tile_s, axis=1)
            acc = acc + vals_ref[d][None].astype(acc_dt) * seg.astype(acc_dt)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "tile_s", "interpret"))
def _dia_matmat_il_pallas(vals_il: jax.Array, xs_il: jax.Array, offsets: tuple,
                          tile_s: int, interpret: bool) -> jax.Array:
    pr = _il_halo(offsets)
    wdt = jnp.promote_types(xs_il.dtype, jnp.float32)
    w = jax.vmap(lambda v: _il_window(v, pr))(xs_il.astype(wdt))
    return _dia_matmat_il_window_pallas(vals_il, w, offsets, tile_s, interpret)


def _dia_matmat_il_window_pallas(vals_il: jax.Array, w: jax.Array,
                                 offsets: tuple, tile_s: int,
                                 interpret: bool) -> jax.Array:
    """Block core from PRE-BUILT per-vector windows (nvec, R + 2*pr, 128)
    — the distributed block path fills seam-lane halos via ppermute."""
    k, R, _ = vals_il.shape
    nvec = w.shape[0]
    pr = _il_halo(offsets)
    wdt = w.dtype
    out_dt = jnp.promote_types(vals_il.dtype, jnp.float32)
    stream = w.size * w.dtype.itemsize > _WINDOW_VMEM_BUDGET and not interpret
    if stream:
        kernel = functools.partial(_dia_il_block_kernel_stream,
                                   plan=_il_plan(offsets, pr), pr=pr,
                                   tile_s=tile_s, nvec=nvec)
        x_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((nvec, tile_s + 2 * pr, LANES), wdt),
                   pltpu.SemaphoreType.DMA]
    else:
        kernel = functools.partial(_dia_il_block_kernel,
                                   plan=_il_plan(offsets, pr), pr=pr,
                                   tile_s=tile_s, nvec=nvec)
        x_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = []
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nvec, R, LANES), out_dt),
        grid=(R // tile_s,),
        in_specs=[
            x_spec,
            pl.BlockSpec((k, tile_s, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nvec, tile_s, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * R * LANES * nvec, transcendentals=0,
            bytes_accessed=(k * R * LANES + 2 * nvec * R * LANES)
            * vals_il.dtype.itemsize),
        interpret=interpret,
    )(w, vals_il)


def dia_matmat_il_window(vals_il: jax.Array, offsets: tuple, w: jax.Array, *,
                         tile_s: int = DEFAULT_IL_TILE,
                         force: str | None = None) -> jax.Array:
    """Interleaved block SpMM from caller-built haloed windows
    (nvec, R + 2*pr, 128) -> (nvec, R, 128); window halos may carry
    neighbor-shard values (cf. ``dia_matvec_il_window``)."""
    k, R, _ = vals_il.shape
    pr = _il_halo(offsets)
    if w.shape[1] != R + 2 * pr:
        raise ValueError(
            f"dia_matmat_il_window: window has {w.shape[1]} sublanes, "
            f"expected R + 2*pr = {R + 2 * pr}")
    interpret = force == "interpret"
    use_pallas = (force in ("pallas", "interpret")
                  or (force is None and _backend_supports_pallas()
                      and vals_il.dtype in (jnp.float32, jnp.bfloat16)))
    if use_pallas:
        return _dia_matmat_il_window_pallas(
            vals_il, w.astype(jnp.promote_types(w.dtype, jnp.float32)),
            tuple(offsets), tile_s, interpret)
    out_dt = jnp.promote_types(vals_il.dtype, jnp.float32)
    ys = jnp.zeros((w.shape[0], R, w.shape[2]), out_dt)
    for d, off in enumerate(offsets):
        seg = jax.lax.slice_in_dim(w, pr + off, pr + off + R, axis=1)
        ys = ys + vals_il[d][None].astype(out_dt) * seg.astype(out_dt)
    return ys


def dia_matmat_il(vals_il: jax.Array, offsets: tuple, xs_il: jax.Array, *,
                  tile_s: int = DEFAULT_IL_TILE,
                  force: str | None = None) -> jax.Array:
    """Interleaved-domain block SpMM: xs_il (nvec, R, 128) -> (nvec, R, 128)."""
    interpret = force == "interpret"
    use_pallas = (force in ("pallas", "interpret")
                  or (force is None and _backend_supports_pallas()
                      and vals_il.dtype in (jnp.float32, jnp.bfloat16)))
    if use_pallas:
        return _dia_matmat_il_pallas(vals_il, xs_il, tuple(offsets), tile_s,
                                     interpret)
    return jax.vmap(lambda v: dia_matvec_il(vals_il, offsets, v, force="xla"))(
        xs_il)


def dia_matvec(vals: jax.Array, offsets: tuple, x: jax.Array, *,
               tile_rows: int = DEFAULT_TILE_ROWS, force: str | None = None) -> jax.Array:
    """Banded SpMV dispatch.

    ``force``: None (auto), "pallas", "interpret" (kernel via interpreter,
    for CPU tests), or "xla" (shifted-pad jnp path).
    """
    k, n = vals.shape
    use_pallas = False
    interpret = False
    if force == "pallas":
        use_pallas = True
    elif force == "interpret":
        use_pallas, interpret = True, True
    elif force == "xla":
        use_pallas = False
    else:
        # f32/bf16/c64 on a TPU-ish backend; f64/c128 take the XLA path.
        # bf16 diagonal storage halves HBM traffic; accumulation stays f32.
        use_pallas = (_backend_supports_pallas()
                      and vals.dtype in (jnp.float32, jnp.bfloat16, jnp.complex64)
                      and n >= tile_rows * LANES)

    if use_pallas:
        if vals.dtype in (jnp.complex64, jnp.complex128):
            # complex arrays exist only off-TPU here: split to planes, run
            # the split-plane kernel, rejoin
            vals_p = jnp.stack([jnp.real(vals), jnp.imag(vals)]).astype(
                jnp.float32 if vals.dtype == jnp.complex64 else jnp.float64)
            x_c = jnp.asarray(x, vals.dtype)
            x_p = jnp.stack([jnp.real(x_c), jnp.imag(x_c)]).astype(vals_p.dtype)
            out = _dia_matvec_pallas_planes(vals_p, x_p, tuple(offsets),
                                            tile_rows, interpret)
            return (out[0] + 1j * out[1]).astype(vals.dtype)
        return _dia_matvec_pallas(vals, x, tuple(offsets), tile_rows, interpret)

    y = jnp.zeros_like(x)
    for d, off in enumerate(offsets):
        if off >= 0:
            seg = jnp.pad(x[off:], (0, off)) if off else x
        else:
            seg = jnp.pad(x[:off], (-off, 0))
        y = y + vals[d] * seg
    return y
