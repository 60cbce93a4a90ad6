"""Pallas TPU kernel: general (unstructured) sparse SpMV — "packed gather-ELL".

This is the fast path for the reference's hot op ``A * x`` when ``A`` is an
arbitrary ``Eigen::SparseMatrix`` (/root/reference/src/power_method/
power_method.hpp:69 with the sparse arm of src/matrix/matrix.hpp:39-44).
XLA's gather + segment-sum runs at ~0.15 Gnnz/s inside solver loops on this
chip; this kernel turns the irregular gather/scatter into dense
(sublane, lane) tile operations:

Layout ("GELL pack", built once on host):
- Rows are tiled ``tile_rows`` (= ``ng``*128) at a time. Within a tile,
  every nonzero (r, c, v) is bucketed by **lane bucket** ``l = c % 128``
  (the sublane axis) and packed densely into **slots** (the lane axis) in
  sorted (output-row, column-segment) order.
- The segment word carries ``seg = c // 128`` plus suffix-scan mask bits.
  It is **int16** when the column count fits 13 bits of segment
  (n_cols <= 2**13 * 128 = 1,048,576; masks in bits 13/14/15) and int32
  otherwise (seg in the low 16 bits, masks at bits 16/17/18) — half the
  HBM traffic for every matrix up to a million columns.
- ``x`` is transposed to ``x_t[l, s] = x[s*128 + l]`` so one
  ``take_along_axis`` **lane gather** (the only gather Mosaic supports,
  and only within a 128-lane tile) fetches x for all 16384 slots of one
  128-wide segment chunk; a short masked loop covers the column span.
- Entries of the same output row in the same bucket are **contiguous slot
  runs**; a masked Hillis-Steele suffix scan (lane rolls by 1/2/4) sums
  each run into its head slot — handling up to 8 duplicates per
  (row, bucket). The number of scan steps actually executed is the
  static ``scan_steps`` = ceil(log2(longest run)) recorded at pack time
  (0 for collision-free packs — the common case for scattered sparsity).
- A per-output-row **inverse permutation** (lane gather again) moves each
  head slot to its output position. It is stored as **int8** (bit 7 =
  valid, low 7 bits = head slot) — a quarter of the int32 encoding's
  traffic, which dominated the round-2 kernel's bytes/nnz.
- Complex values are stored as split re/im planes ``(tiles, 2, 128, 128)``
  and evaluated in ONE fused kernel pass (shared segment/inverse loads,
  two gathers per chunk) instead of four split passes.
- Entries that overflow a bucket (slot >= 128) or a run (>= 8 deep) go to
  a small COO **spill** tail evaluated with gather + ``.at[].add``.

The same pack evaluates in pure jnp (``force="xla"``) for CPU tests, f64,
and complex128; the Pallas path takes f32/bf16 values (complex64 runs the
fused split-plane kernel; use ``GELLPack.with_values_dtype(jnp.bfloat16)``
to halve value traffic at bf16 precision).
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
_SEG16_BITS = 13                 # int16 word: 13-bit seg + 3 scan-mask bits
_SEG16_MAX_COLS = (1 << _SEG16_BITS) * LANES   # 1,048,576
_MAX_SEG = (1 << 16) - 1         # int32 word: seg must fit 16 bits
_XT_VMEM_BUDGET = 6 * 2**20      # keep the transposed-x VMEM block modest


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GELLPack:
    """Device arrays of one packed gather-ELL operator (a pytree).

    ``seg_packed[t, l, slot]``: the segment word (int16 or int32 — see
    module docstring). ``val`` is (tiles, 128, 128) for real dtypes and
    (tiles, 2, 128, 128) re/im planes for complex. ``inv[t, g*128+l, j]``
    int8: bit 7 = valid, low 7 bits = head slot of output row
    ``t*tile_rows + g*128 + j``'s run in bucket ``l``. COO spill tail in
    ``sp_*`` (``sp_vals`` is (2, n_spill) planes when complex).
    """

    seg_packed: jax.Array   # (n_tiles, 128, 128) int16 | int32
    val: jax.Array          # (n_tiles, [2,] 128, 128)
    inv: jax.Array          # (n_tiles, ng*128, 128) int8
    sp_rows: jax.Array      # (n_spill,) int32
    sp_cols: jax.Array      # (n_spill,) int32
    sp_vals: jax.Array      # (n_spill,) | (2, n_spill)
    # column-panel pruning (VERDICT r3 task 5): chunk_ids[t, 0, j] lists
    # the x-chunks tile t actually touches (j < max_chunks, padded by
    # repeating the first id); the kernel's gather loop visits only
    # these instead of all ceil(n_cols/16384) chunks, breaking the
    # n-proportional chunk-loop cost for matrices with column locality.
    chunk_ids: jax.Array    # (n_tiles, 1, maxc_pad) int32
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    tile_rows: int = dataclasses.field(metadata=dict(static=True))
    scan_steps: int = dataclasses.field(default=3, metadata=dict(static=True))
    is_complex: bool = dataclasses.field(default=False,
                                         metadata=dict(static=True))
    max_chunks: int = dataclasses.field(default=0,
                                        metadata=dict(static=True))

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

    @property
    def dtype(self):
        """The logical scalar dtype of the operator."""
        if self.is_complex:
            r = np.dtype(self.val.dtype)
            if r == np.dtype(jnp.bfloat16):
                return np.dtype(np.complex64)
            return np.dtype(np.complex64) if r == np.dtype(np.float32) \
                else np.dtype(np.complex128)
        return np.dtype(self.val.dtype)

    def with_values_dtype(self, dtype) -> "GELLPack":
        """Same pack with values (and spill) cast — e.g. jnp.bfloat16 to
        halve the value-plane HBM traffic (f32 accumulation regardless)."""
        return dataclasses.replace(self, val=self.val.astype(dtype),
                                   sp_vals=self.sp_vals.astype(dtype))


def _round_up_gell(x: int, m: int) -> int:
    return -(-x // m) * m


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
    is_complex = np.dtype(v.dtype).kind == "c"
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
    seg16 = n_cols <= _SEG16_MAX_COLS

    m1 = (remaining >= 1).astype(np.int32)
    m2 = (remaining >= 2).astype(np.int32)
    m4 = (remaining >= 4).astype(np.int32)
    max_rem = int(remaining.max()) if len(remaining) else 0
    scan_steps = 0 if max_rem < 1 else 1 if max_rem < 2 else \
        2 if max_rem < 4 else 3

    if seg16:
        packed = (kg.astype(np.int32) | (m1 << _SEG16_BITS)
                  | (m2 << (_SEG16_BITS + 1)) | (m4 << (_SEG16_BITS + 2)))
        seg_arr = np.zeros((n_tiles, LANES, LANES), np.uint16)
        seg_arr[kt, kl, kslot] = packed.astype(np.uint16)
        seg_arr = seg_arr.view(np.int16)
    else:
        packed = kg.astype(np.int32) | (m1 << 16) | (m2 << 17) | (m4 << 18)
        seg_arr = np.zeros((n_tiles, LANES, LANES), np.int32)
        seg_arr[kt, kl, kslot] = packed

    rdt = np.float64 if np.dtype(v.dtype).itemsize > (8 if is_complex else 4) \
        else np.float32
    if is_complex:
        val_arr = np.zeros((n_tiles, 2, LANES, LANES), rdt)
        val_arr[kt, 0, kl, kslot] = kv.real
        val_arr[kt, 1, kl, kslot] = kv.imag
        sp_vals = np.stack([v_[spill].real, v_[spill].imag]).astype(rdt)
    else:
        val_arr = np.zeros((n_tiles, LANES, LANES), v.dtype)
        val_arr[kt, kl, kslot] = kv
        sp_vals = v_[spill]

    inv_arr = np.zeros((n_tiles, ng, LANES, LANES), np.uint8)
    heads = krank == 0
    ht, hl, ho, hs = kt[heads], kl[heads], ko[heads], kslot[heads]
    inv_arr[ht, ho // LANES, hl, ho % LANES] = (hs | 0x80).astype(np.uint8)

    # per-tile touched-chunk lists (kept entries only; spill is gathered
    # separately) — chunk = seg // 128
    n_chunks_tot = max(-(-(-(-n_cols // LANES)) // LANES), 1)
    kchunk = (kg // LANES).astype(np.int64)
    touched = np.zeros((n_tiles, n_chunks_tot), bool)
    if len(kt):
        touched[kt, kchunk] = True
    counts = touched.sum(axis=1)
    max_chunks = int(max(counts.max() if n_tiles else 1, 1))
    maxc_pad = _round_up_gell(max_chunks, LANES)
    cid = np.zeros((n_tiles, 1, maxc_pad), np.int32)
    for t in range(n_tiles):
        ids = np.flatnonzero(touched[t])
        if len(ids) == 0:
            ids = np.array([0])
        cid[t, 0, :len(ids)] = ids
        cid[t, 0, len(ids):] = ids[0]   # pad by repetition (harmless)

    return GELLPack(
        seg_packed=jnp.asarray(seg_arr),
        val=jnp.asarray(val_arr),
        inv=jnp.asarray(inv_arr.reshape(n_tiles, ng * LANES, LANES)
                        .view(np.int8)),
        sp_rows=jnp.asarray(r_[spill], jnp.int32),
        sp_cols=jnp.asarray(c_[spill], jnp.int32),
        sp_vals=jnp.asarray(sp_vals),
        chunk_ids=jnp.asarray(cid),
        shape=(n_rows, n_cols),
        tile_rows=T,
        scan_steps=scan_steps,
        is_complex=is_complex,
        max_chunks=max_chunks,
    )


# ---------------------------------------------------------------------------
# shared decode helpers (trace into both the kernel and the XLA path)
# ---------------------------------------------------------------------------

def _decode_seg(seg_arr):
    """-> (seg, word32, (bit1, bit2, bit4)) for either segment format."""
    if seg_arr.dtype == jnp.int16:
        w = seg_arr.astype(jnp.int32) & 0xFFFF
        return (w & (_SEG16_MAX_COLS // LANES - 1), w,
                (1 << _SEG16_BITS, 1 << (_SEG16_BITS + 1),
                 1 << (_SEG16_BITS + 2)))
    return seg_arr & 0xFFFF, seg_arr, (1 << 16, 1 << 17, 1 << 18)


def _scan_runs(p, word, bits, scan_steps: int, roll):
    """Masked Hillis-Steele suffix scan: sum runs into their head slots.

    The mask is a ``where`` select (NOT a float multiply): with a
    multiply, a NaN/Inf rolled in from an unrelated slot would survive
    ``0 * NaN`` and poison the run head. The select form measured within
    run-to-run noise of the multiply (the kernel is VPU-op-bound either
    way, see docs/PERF_NOTES.md) and keeps the kernel NaN-proof."""
    for k, bit in list(zip((1, 2, 4), bits))[:scan_steps]:
        m = (word & bit) > 0
        p = jnp.where(m, p + roll(p, k), p)
    return p


def _decode_inv(inv8):
    iv = inv8.astype(jnp.int32)          # sign-extends: valid -> negative
    return iv & (LANES - 1), (iv < 0)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _gather_chunks(seg, xt_ref, n_chunks, plane=None, cid_ref=None,
                   max_chunks=None):
    """x value for every slot: one lane-gather per 128-segment chunk.
    Accumulates via ``where`` select so an Inf/NaN in one x chunk can
    never leak into slots belonging to other chunks (0 * NaN = NaN would;
    the select measures within noise of the multiply on this VPU).

    With ``cid_ref``/``max_chunks`` (column-panel pruning, VERDICT r3
    task 5) the loop visits only the chunks THIS tile touches — the
    chunk id is read from the per-tile list and used as a dynamic index
    into the x-chunk stack, so the cost scales with the tile's column
    footprint instead of ceil(n_cols/16384). Padding ids repeat the
    first entry; the where-select makes re-visits idempotent."""
    s_lo = seg & (LANES - 1)
    s_hi = seg >> 7
    t = jnp.zeros((LANES, LANES), jnp.float32)
    if cid_ref is not None and max_chunks is not None \
            and 0 < max_chunks < n_chunks:
        lane_c = jax.lax.broadcasted_iota(
            jnp.int32, cid_ref[0].shape, len(cid_ref[0].shape) - 1)
        for lc in range(max_chunks):
            gc = jnp.sum(jnp.where(lane_c == lc, cid_ref[0], 0))
            src = xt_ref[gc] if plane is None else xt_ref[plane, gc]
            g = jnp.take_along_axis(src, s_lo, axis=1)
            t = jnp.where(s_hi == gc, g, t)
        return t
    for c in range(n_chunks):
        src = xt_ref[c] if plane is None else xt_ref[plane, c]
        g = jnp.take_along_axis(src, s_lo, axis=1)
        t = jnp.where(s_hi == c, g, t)
    return t


def _invert_to_rows(p, inv_ref, ng):
    """Head slot -> output-row lane + partial sublane reduction 128 -> 8."""
    outs = []
    zero = jnp.zeros((), jnp.float32)
    for g in range(ng):
        idx, valid = _decode_inv(inv_ref[0, g * LANES:(g + 1) * LANES, :])
        q = jnp.where(valid, jnp.take_along_axis(p, idx, axis=1), zero)
        outs.append(jnp.sum(q.reshape(8, 16, LANES), axis=1))
    return jnp.concatenate(outs, axis=0)


def _gell_kernel(seg_ref, val_ref, inv_ref, cid_ref, xt_ref, out_ref, *,
                 n_chunks, ng, scan_steps, max_chunks):
    seg, word, bits = _decode_seg(seg_ref[0])
    t = _gather_chunks(seg, xt_ref, n_chunks, cid_ref=cid_ref,
                       max_chunks=max_chunks)
    p = val_ref[0].astype(jnp.float32) * t
    p = _scan_runs(p, word, bits, scan_steps,
                   lambda q, k: pltpu.roll(q, LANES - k, 1))
    out_ref[0] = _invert_to_rows(p, inv_ref, ng)


def _gell_kernel_cpx(seg_ref, val_ref, inv_ref, cid_ref, xt_ref, out_ref,
                     *, n_chunks, ng, scan_steps, max_chunks):
    """Fused complex pass: one segment/inverse load, two gathers/chunk."""
    seg, word, bits = _decode_seg(seg_ref[0])
    tr = _gather_chunks(seg, xt_ref, n_chunks, plane=0, cid_ref=cid_ref,
                        max_chunks=max_chunks)
    ti = _gather_chunks(seg, xt_ref, n_chunks, plane=1, cid_ref=cid_ref,
                        max_chunks=max_chunks)
    vr = val_ref[0, 0].astype(jnp.float32)
    vi = val_ref[0, 1].astype(jnp.float32)
    pr = vr * tr - vi * ti
    pi = vr * ti + vi * tr
    roll = lambda q, k: pltpu.roll(q, LANES - k, 1)
    pr = _scan_runs(pr, word, bits, scan_steps, roll)
    pi = _scan_runs(pi, word, bits, scan_steps, roll)
    # share the inverse-permutation index decode across both planes
    outs_r, outs_i = [], []
    zero = jnp.zeros((), jnp.float32)
    for g in range(ng):
        idx, valid = _decode_inv(inv_ref[0, g * LANES:(g + 1) * LANES, :])
        qr = jnp.where(valid, jnp.take_along_axis(pr, idx, axis=1), zero)
        qi = jnp.where(valid, jnp.take_along_axis(pi, idx, axis=1), zero)
        outs_r.append(jnp.sum(qr.reshape(8, 16, LANES), axis=1))
        outs_i.append(jnp.sum(qi.reshape(8, 16, LANES), axis=1))
    out_ref[0, 0] = jnp.concatenate(outs_r, axis=0)
    out_ref[0, 1] = jnp.concatenate(outs_i, axis=0)


@functools.partial(jax.jit, static_argnames=("n_chunks", "ng", "scan_steps",
                                             "max_chunks", "interpret"))
def _gell_tiles_pallas(seg_packed, val, inv, cid, x_t, n_chunks: int,
                       ng: int, scan_steps: int, max_chunks: int,
                       interpret: bool):
    n_tiles = seg_packed.shape[0]
    maxc_pad = cid.shape[2]
    out = pl.pallas_call(
        functools.partial(_gell_kernel, n_chunks=n_chunks, ng=ng,
                          scan_steps=scan_steps, max_chunks=max_chunks),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8 * ng, LANES), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng * LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, maxc_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8 * ng, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seg_packed, val, inv, cid, x_t)
    # final 8-way reduction: (n_tiles, ng, 8, LANES) -> rows
    return out.reshape(n_tiles, ng, 8, LANES).sum(axis=2).reshape(-1)


@functools.partial(jax.jit, static_argnames=("n_chunks", "ng", "scan_steps",
                                             "max_chunks", "interpret"))
def _gell_tiles_pallas_cpx(seg_packed, val, inv, cid, x_t2, n_chunks: int,
                           ng: int, scan_steps: int, max_chunks: int,
                           interpret: bool):
    n_tiles = seg_packed.shape[0]
    maxc_pad = cid.shape[2]
    out = pl.pallas_call(
        functools.partial(_gell_kernel_cpx, n_chunks=n_chunks, ng=ng,
                          scan_steps=scan_steps, max_chunks=max_chunks),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 2, 8 * ng, LANES),
                                       jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, LANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng * LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, maxc_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 8 * ng, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(seg_packed, val, inv, cid, x_t2)
    yr = out[:, 0].reshape(n_tiles, ng, 8, LANES).sum(axis=2).reshape(-1)
    yi = out[:, 1].reshape(n_tiles, ng, 8, LANES).sum(axis=2).reshape(-1)
    return yr, yi


def _gell_tiles_xla(seg_packed, val, inv, x_pad, ng: int, scan_steps: int):
    """Pure-jnp evaluation of the same pack (CPU / f64 path). ``val``/
    ``x_pad`` are one real plane; complex callers run this per product."""
    seg, word, bits = _decode_seg(seg_packed)
    lane = jnp.arange(LANES, dtype=jnp.int32)[None, :, None]
    t = jnp.take(x_pad, seg * LANES + lane, axis=0)
    p = val * t.astype(val.dtype)
    p = _scan_runs(p, word, bits, scan_steps,
                   lambda q, k: jnp.roll(q, -k, axis=2))
    n_tiles = seg_packed.shape[0]
    inv4 = inv.reshape(n_tiles, ng, LANES, LANES)
    idx, valid = _decode_inv(inv4)
    q = jnp.where(valid, jnp.take_along_axis(p[:, None], idx, axis=3),
                  jnp.zeros((), p.dtype))
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
    if dt not in (np.dtype(np.float32), np.dtype(jnp.bfloat16)):
        return False
    planes = 2 if pack.is_complex else 1
    return planes * pack.n_chunks * LANES * LANES * 4 <= _XT_VMEM_BUDGET


def gell_matvec_planes(pack: GELLPack, x_planes: jax.Array, *,
                       force: str | None = None) -> jax.Array:
    """``A @ x`` for a complex pack with ``x`` as (2, n) re/im planes,
    returning (2, n_rows) planes — the entry point for accelerator
    backends with no complex dtypes (complex arrays cannot even be
    CREATED on the axon TPU; ``gell_matvec`` with a complex ``x`` only
    exists off-accelerator)."""
    if not pack.is_complex:
        raise ValueError("gell_matvec_planes: pack is not complex")
    n_rows, n_cols = pack.shape
    n_chunks, ng = pack.n_chunks, pack.ng
    pad_cols = n_chunks * LANES * LANES
    rdt = x_planes.dtype
    xp = jnp.pad(x_planes, ((0, 0), (0, pad_cols - n_cols)))
    if _use_pallas(pack, force):
        x_t2 = xp.reshape(2, -1, LANES).transpose(0, 2, 1) \
            .reshape(2, LANES, n_chunks, LANES).transpose(0, 2, 1, 3)
        yr, yi = _gell_tiles_pallas_cpx(
            pack.seg_packed, pack.val, pack.inv, pack.chunk_ids, x_t2,
            n_chunks, ng, pack.scan_steps, pack.max_chunks,
            force == "interpret")
        yr, yi = yr.astype(rdt), yi.astype(rdt)
    else:
        vr, vi = pack.val[:, 0].astype(rdt), pack.val[:, 1].astype(rdt)
        a = (pack.seg_packed, pack.inv)
        yr = (_gell_tiles_xla(a[0], vr, a[1], xp[0], ng, pack.scan_steps)
              - _gell_tiles_xla(a[0], vi, a[1], xp[1], ng, pack.scan_steps))
        yi = (_gell_tiles_xla(a[0], vr, a[1], xp[1], ng, pack.scan_steps)
              + _gell_tiles_xla(a[0], vi, a[1], xp[0], ng, pack.scan_steps))
    y = jnp.stack([yr[:n_rows], yi[:n_rows]])
    if pack.n_spill:
        svr = pack.sp_vals[0].astype(rdt)
        svi = pack.sp_vals[1].astype(rdt)
        xgr = jnp.take(x_planes[0], pack.sp_cols, axis=0)
        xgi = jnp.take(x_planes[1], pack.sp_cols, axis=0)
        y = y.at[0, pack.sp_rows].add(svr * xgr - svi * xgi)
        y = y.at[1, pack.sp_rows].add(svr * xgi + svi * xgr)
    return y


def gell_matvec(pack: GELLPack, x: jax.Array, *, force: str | None = None) -> jax.Array:
    """``A @ x`` for a packed operator. ``force``: None (auto), "pallas",
    "interpret" (kernel logic on CPU), or "xla"."""
    n_rows, n_cols = pack.shape
    n_chunks, ng = pack.n_chunks, pack.ng
    pad_cols = n_chunks * LANES * LANES

    if pack.is_complex:
        rdt = jnp.float64 if np.dtype(x.dtype) == np.dtype(np.complex128) \
            else jnp.float32
        planes = jnp.stack([jnp.real(x).astype(rdt), jnp.imag(x).astype(rdt)])
        y = gell_matvec_planes(pack, planes, force=force)
        return jax.lax.complex(y[0], y[1]).astype(x.dtype)

    xp = jnp.pad(x, (0, pad_cols - n_cols))
    if _use_pallas(pack, force):
        x_t = xp.astype(jnp.float32).reshape(-1, LANES).T \
            .reshape(LANES, n_chunks, LANES).transpose(1, 0, 2)
        y = _gell_tiles_pallas(pack.seg_packed, pack.val, pack.inv,
                               pack.chunk_ids, x_t, n_chunks, ng,
                               pack.scan_steps, pack.max_chunks,
                               force == "interpret").astype(x.dtype)
    else:
        y = _gell_tiles_xla(pack.seg_packed, pack.val.astype(x.dtype),
                            pack.inv, xp, ng, pack.scan_steps)
    y = y[:n_rows]
    if pack.n_spill:
        y = y.at[pack.sp_rows].add(pack.sp_vals.astype(x.dtype)
                                   * jnp.take(x, pack.sp_cols, axis=0))
    return y
