"""Pallas TPU kernel: general (unstructured) sparse SpMV — "packed gather-ELL".

This is the fast path for the reference's hot op ``A * x`` when ``A`` is an
arbitrary ``Eigen::SparseMatrix`` (/root/reference/src/power_method/
power_method.hpp:69 with the sparse arm of src/matrix/matrix.hpp:39-44).
XLA's gather + segment-sum runs at ~0.15 Gnnz/s inside solver loops on this
chip; this kernel measures ~12.8 Gnnz/s on a 100K-row / 33 nnz-per-row
random matrix (85x) by turning the irregular gather/scatter into dense
(sublane, lane) tile operations:

Layout ("GELL pack", built once on host):
- Rows are tiled ``tile_rows`` (= ``ng``*128) at a time. Within a tile,
  every nonzero (r, c, v) is bucketed by **lane bucket** ``l = c % 128``
  (the sublane axis) and packed densely into **slots** (the lane axis) in
  sorted (output-row, column-segment) order — a (128, 128) tile of values
  plus a packed int32 carrying ``seg = c // 128`` (16 bits) and 3
  suffix-scan mask bits.
- ``x`` is transposed to ``x_t[l, s] = x[s*128 + l]`` so one
  ``take_along_axis`` **lane gather** (the only gather Mosaic supports,
  and only within a 128-lane tile) fetches x for all 16384 slots of one
  128-wide segment chunk; a short masked loop covers the column span.
- Entries of the same output row in the same bucket are **contiguous slot
  runs**; a 3-step masked Hillis-Steele suffix scan (lane rolls by 1/2/4)
  sums each run into its head slot — handling up to 8 duplicates per
  (row, bucket).
- A per-output-row **inverse permutation** (lane gather again) moves each
  head slot to its output position; sublanes (buckets) partially reduce
  16 -> 1 inside the kernel and the final 8-way reduction + spill
  scatter-add run in XLA.
- Entries that overflow a bucket (slot >= 128) or a run (>= 8 deep) go to
  a small COO **spill** tail evaluated with gather + ``.at[].add``.

The same pack evaluates in pure jnp (``force="xla"``) for CPU tests, f64,
and complex dtypes; the Pallas path requires f32 (complex64 runs as two
split-plane passes through the same kernel).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TILE_ROWS = 384          # ng = 3 output groups; good fill at ~33 nnz/row
_MAX_SEG = (1 << 16) - 1         # seg must fit the low 16 bits of the packed word
_XT_VMEM_BUDGET = 6 * 2**20      # keep the transposed-x VMEM block modest


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GELLPack:
    """Device arrays of one packed gather-ELL operator (a pytree).

    ``seg_packed[t, l, slot]``: low 16 bits = column segment (c // 128);
    bits 16/17/18 = "run continues for >=1/2/4 more slots" scan masks.
    ``val`` has the same indexing. ``inv[t, g*128 + l, j]``: for output row
    ``t*tile_rows + g*128 + j``, bit 15 = valid, low 7 bits = head slot of
    that row's run in bucket ``l``. COO spill tail in ``sp_*``.
    """

    seg_packed: jax.Array   # (n_tiles, 128, 128) int32
    val: jax.Array          # (n_tiles, 128, 128) scalar dtype
    inv: jax.Array          # (n_tiles, ng*128, 128) int32
    sp_rows: jax.Array      # (n_spill,) int32
    sp_cols: jax.Array      # (n_spill,) int32
    sp_vals: jax.Array      # (n_spill,) scalar dtype
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    tile_rows: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return -(-self.shape[0] // self.tile_rows)

    @property
    def ng(self) -> int:
        return self.tile_rows // LANES

    @property
    def n_chunks(self) -> int:
        s = -(-self.shape[1] // LANES)
        return -(-s // LANES)

    @property
    def n_spill(self) -> int:
        return int(self.sp_rows.shape[0])


def auto_tile_rows(n_rows: int, nnz: int) -> int:
    """Pick tile_rows so the expected bucket fill is ~0.75 (96 slots):
    tile_rows * (nnz/n_rows) / 128 ~= 96, rounded to a multiple of 128."""
    avg = max(nnz / max(n_rows, 1), 1e-9)
    t = int(round(96.0 * LANES / avg / LANES)) * LANES
    return int(np.clip(t, LANES, 1024))


def pack_gell(row, col, values, shape, tile_rows: int | None = None) -> GELLPack:
    """Host-side packing of COO triplets (may contain duplicates — they
    become scan-run members and sum, matching SpMV semantics)."""
    n_rows, n_cols = map(int, shape)
    r = np.asarray(row, np.int64)
    c = np.asarray(col, np.int64)
    v = np.asarray(values)
    nnz = len(r)
    if tile_rows is None:
        tile_rows = auto_tile_rows(n_rows, nnz)
    if tile_rows % LANES != 0:
        raise ValueError("pack_gell: tile_rows must be a multiple of 128")
    T = tile_rows
    ng = T // LANES
    n_tiles = max(-(-n_rows // T), 1)

    tile = r // T
    o = r % T                      # output row within tile
    l = c % LANES                  # lane bucket (sublane axis)
    seg = c // LANES               # column segment (gather target)
    order = np.lexsort((seg, o, l, tile))
    t_, o_, l_, g_, v_ = tile[order], o[order], l[order], seg[order], v[order]
    r_, c_ = r[order], c[order]

    # run id over (tile, l, o) groups — members are consecutive after the sort
    key_g = (t_ * LANES + l_) * T + o_
    first_g = np.ones(nnz, bool)
    first_g[1:] = key_g[1:] != key_g[:-1]
    starts_g = np.flatnonzero(first_g)
    run_g = np.cumsum(first_g) - 1
    rank = np.arange(nnz) - starts_g[run_g] if nnz else np.zeros(0, np.int64)
    # slot within (tile, l): dense packing along the lane axis
    key_tl = t_ * LANES + l_
    first_tl = np.ones(nnz, bool)
    first_tl[1:] = key_tl[1:] != key_tl[:-1]
    starts_tl = np.flatnonzero(first_tl)
    run_tl = np.cumsum(first_tl) - 1
    slot = np.arange(nnz) - starts_tl[run_tl] if nnz else np.zeros(0, np.int64)

    spill = (slot >= LANES) | (rank >= 8)
    keep = ~spill
    kt, ko, kl, kg, kv, kslot = (t_[keep], o_[keep], l_[keep], g_[keep],
                                 v_[keep], slot[keep])
    # run rank/size on the KEPT set only: a spilled tail member must not
    # inflate the scan masks of kept members
    krun = run_g[keep]
    kfirst = np.ones(len(krun), bool)
    kfirst[1:] = krun[1:] != krun[:-1]
    kstarts = np.flatnonzero(kfirst)
    krid = np.cumsum(kfirst) - 1
    krank = np.arange(len(krun)) - kstarts[krid] if len(krun) else np.zeros(0, np.int64)
    kgsize = np.diff(np.append(kstarts, len(krun)))
    remaining = (kgsize[krid] - krank - 1) if len(krun) else np.zeros(0, np.int64)

    if n_cols > (_MAX_SEG + 1) * LANES:
        raise ValueError("pack_gell: n_cols too large for the 16-bit segment field")

    seg_arr = np.zeros((n_tiles, LANES, LANES), np.int32)
    val_arr = np.zeros((n_tiles, LANES, LANES), v.dtype)
    inv_arr = np.zeros((n_tiles, ng, LANES, LANES), np.int32)
    m1 = (remaining >= 1).astype(np.int32)
    m2 = (remaining >= 2).astype(np.int32)
    m4 = (remaining >= 4).astype(np.int32)
    packed = kg.astype(np.int32) | (m1 << 16) | (m2 << 17) | (m4 << 18)
    seg_arr[kt, kl, kslot] = packed
    val_arr[kt, kl, kslot] = kv
    heads = krank == 0
    ht, hl, ho, hs = kt[heads], kl[heads], ko[heads], kslot[heads]
    inv_arr[ht, ho // LANES, hl, ho % LANES] = hs | 0x8000

    return GELLPack(
        seg_packed=jnp.asarray(seg_arr),
        val=jnp.asarray(val_arr),
        inv=jnp.asarray(inv_arr.reshape(n_tiles, ng * LANES, LANES)),
        sp_rows=jnp.asarray(r_[spill], jnp.int32),
        sp_cols=jnp.asarray(c_[spill], jnp.int32),
        sp_vals=jnp.asarray(v_[spill]),
        shape=(n_rows, n_cols),
        tile_rows=T,
    )


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _gell_kernel(seg_ref, val_ref, inv_ref, xt_ref, out_ref, *, n_chunks, ng):
    seg_p = seg_ref[0]
    val = val_ref[0]
    seg = seg_p & 0xFFFF
    s_lo = seg & (LANES - 1)
    s_hi = seg >> 7
    # gather x for every slot: one lane-gather per 128-segment chunk,
    # selected where the slot's segment lives in that chunk
    t = jnp.zeros((LANES, LANES), val.dtype)
    for c in range(n_chunks):
        src = xt_ref[:, c * LANES:(c + 1) * LANES]
        g = jnp.take_along_axis(src, s_lo, axis=1)
        t = jnp.where(s_hi == c, g, t)
    p = val * t
    # masked suffix scan: sum each contiguous run into its head slot
    zero = jnp.zeros((), p.dtype)
    for k, bit in ((1, 16), (2, 17), (4, 18)):
        m = (seg_p & (1 << bit)) > 0
        p = p + jnp.where(m, pltpu.roll(p, LANES - k, 1), zero)
    # inverse permutation: head slot -> output-row lane, then partial
    # sublane reduction 128 -> 8 per output group
    outs = []
    for g in range(ng):
        inv = inv_ref[0, g * LANES:(g + 1) * LANES, :]
        valid = (inv >> 15).astype(p.dtype)
        idx = inv & (LANES - 1)
        q = jnp.take_along_axis(p, idx, axis=1) * valid
        outs.append(jnp.sum(q.reshape(8, 16, LANES), axis=1))
    out_ref[0] = jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("n_chunks", "ng", "interpret"))
def _gell_tiles_pallas(seg_packed, val, inv, x_t, n_chunks: int, ng: int,
                       interpret: bool):
    n_tiles = seg_packed.shape[0]
    out = pl.pallas_call(
        functools.partial(_gell_kernel, n_chunks=n_chunks, ng=ng),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8 * ng, LANES), val.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng * LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8 * ng, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seg_packed, val, inv, x_t)
    # final 8-way reduction: (n_tiles, ng, 8, LANES) -> rows
    return out.reshape(n_tiles, ng, 8, LANES).sum(axis=2).reshape(-1)


def _gell_tiles_xla(seg_packed, val, inv, x_pad, ng: int):
    """Pure-jnp evaluation of the same pack (CPU / f64 / complex path)."""
    seg = seg_packed & 0xFFFF
    lane = jnp.arange(LANES, dtype=jnp.int32)[None, :, None]
    t = jnp.take(x_pad, seg * LANES + lane, axis=0)
    p = val * t.astype(val.dtype)
    zero = jnp.zeros((), p.dtype)
    for k, bit in ((1, 16), (2, 17), (4, 18)):
        m = (seg_packed & (1 << bit)) > 0
        p = p + jnp.where(m, jnp.roll(p, -k, axis=2), zero)
    n_tiles = seg_packed.shape[0]
    inv4 = inv.reshape(n_tiles, ng, LANES, LANES)
    valid = (inv4 >> 15).astype(p.dtype)
    idx = inv4 & (LANES - 1)
    q = jnp.take_along_axis(p[:, None], idx, axis=3) * valid
    return jnp.sum(q, axis=2).reshape(-1)  # sum over buckets (sublanes)


def _use_pallas(pack: GELLPack, force: str | None) -> bool:
    if force in ("pallas", "interpret"):
        return True
    if force == "xla":
        return False
    if force is not None:
        raise ValueError(f"gell_matvec: unknown force={force!r}")
    if jax.default_backend() == "cpu":
        return False
    dt = np.dtype(pack.val.dtype)
    if dt not in (np.dtype(np.float32), np.dtype(np.complex64)):
        return False
    return pack.n_chunks * LANES * LANES * 4 <= _XT_VMEM_BUDGET


def gell_matvec(pack: GELLPack, x: jax.Array, *, force: str | None = None) -> jax.Array:
    """``A @ x`` for a packed operator. ``force``: None (auto), "pallas",
    "interpret" (kernel logic on CPU), or "xla"."""
    n_rows, n_cols = pack.shape
    n_chunks, ng = pack.n_chunks, pack.ng
    pad_cols = n_chunks * LANES * LANES
    xp = jnp.pad(x, (0, pad_cols - n_cols))
    if _use_pallas(pack, force):
        interpret = force == "interpret"
        if np.dtype(pack.val.dtype) == np.dtype(np.complex64):
            x_t = xp.reshape(-1, LANES).T
            vr, vi = jnp.real(pack.val), jnp.imag(pack.val)
            xr, xi = jnp.real(x_t).astype(jnp.float32), jnp.imag(x_t).astype(jnp.float32)
            args = (pack.seg_packed, pack.inv)
            rr = _gell_tiles_pallas(args[0], vr, args[1], xr, n_chunks, ng, interpret)
            ii = _gell_tiles_pallas(args[0], vi, args[1], xi, n_chunks, ng, interpret)
            ri = _gell_tiles_pallas(args[0], vr, args[1], xi, n_chunks, ng, interpret)
            ir = _gell_tiles_pallas(args[0], vi, args[1], xr, n_chunks, ng, interpret)
            y = jax.lax.complex(rr - ii, ri + ir)
        else:
            x_t = xp.reshape(-1, LANES).T
            y = _gell_tiles_pallas(pack.seg_packed, pack.val, pack.inv, x_t,
                                   n_chunks, ng, interpret)
    else:
        y = _gell_tiles_xla(pack.seg_packed, pack.val, pack.inv, xp, ng)
    y = y[:n_rows]
    if pack.n_spill:
        y = y.at[pack.sp_rows].add(pack.sp_vals * jnp.take(x, pack.sp_cols, axis=0))
    return y
