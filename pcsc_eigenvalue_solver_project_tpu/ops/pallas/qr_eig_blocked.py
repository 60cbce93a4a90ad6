"""Pallas TPU kernel: blocked Wilkinson-shifted QR eigenvalue iteration
with HBM-resident planes.

Lifts the n <= 768 VMEM cap of ``qr_kernels.qr_hessenberg_eig_planes``
(VERDICT r2 task 4): the Hessenberg planes stay in HBM (``pl.ANY``) and
every sweep is processed in 120-rotation diagonal blocks —

1. **Left pass** per block b: DMA the (136, 256) diagonal window, run the
   sequential Givens rotation generation/application in VMEM (the same
   masked 16-row-window machinery as the in-VMEM kernel), accumulate the
   block's rotations into a dense U_b (136x136) and the per-rotation
   coefficients into a (8, np) cs buffer, then apply U_b to the remaining
   row slab [b+256, hi) as streamed (136, 512) MXU GEMM chunks.
2. **Right pass** per block: rebuild U_b from cs, post-multiply columns
   [b, b+136) by U_b^H over streamed (512, 256) row chunks (rows
   [0, b+136)), re-adding the shift on the diagonal.
3. diag/sub/superdiagonal caches (VMEM vectors) are refreshed per block
   from a small window re-read, so shift + deflation logic never touches
   HBM rows directly.

Eigenvalues-only: the trailing columns [hi, n) and converged rows above
``lo`` are never updated — they feed neither rotation generation nor
deflation nor the diagonal, so the active-window similarity is
self-contained (same contract as the in-VMEM kernel's deflation window).

Semantics (shift choice, deflation rule |H[i,i-1]| <= tol *
max(|H[i-1,i-1]| + |H[i,i]|, 1), iteration/convergence contract) match
``_qr_eig_kernel`` — reference alg: /root/reference/src/qr_method/
qr_eigenvalues.hpp:40-108, upgraded with shifts+deflation per SURVEY §7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qr_kernels import _rot_rows

LANES = 128
_BS = 120          # rotations per block
_WR = 136          # window rows (17 sublane vregs)
_WC = 256          # window cols
_SC = 512          # left-pass slab chunk width
_RC = 512          # right-pass chunk rows


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dotg(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _qr_blocked_kernel(scal_i_ref, scal_f_ref, sh_ref, h_in, *refs,
                       np_: int, accumulate_q: bool = False,
                       rc_rows: int = _RC):
    """See module docstring. np_ = 128-padded live size; HBM planes are
    (2, np_ + _RC, np_ + _SC). With ``accumulate_q`` the kernel also
    post-multiplies a Q matrix (same HBM layout, starts as identity) by
    every right rotation block, and the left slabs extend to the full n
    columns so the final h planes are a valid Schur T factor.

    ``sh_ref`` (2, 1, 128 VMEM): explicit shift schedule — when
    ``scal_i_ref[2] = n_shifts > 0``, sweep s uses the complex shift at
    lane ``s % n_shifts`` instead of the Wilkinson shift (the AED driver
    feeds undeflated deflation-window Ritz values here, qr_aed.py)."""
    if accumulate_q:
        (q_in, eig_ref, stat_ref, h_ref, q_ref,
         win, U, Ux, cs, dc, sc, pc, slab, rch, sems) = refs
        del q_in  # aliased with q_ref
    else:
        (eig_ref, stat_ref, h_ref,
         win, U, Ux, cs, dc, sc, pc, slab, rch, sems) = refs
        q_ref = None
    n = scal_i_ref[0]
    max_sweeps = scal_i_ref[1]
    n_shifts = scal_i_ref[2]
    tol = scal_f_ref[0]
    del h_in  # aliased with h_ref

    nblk_max = np_ // _BS + 1
    row_w = jax.lax.broadcasted_iota(jnp.int32, (_WR, _WC), 0)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (_WR, _WC), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    lane_wc = jax.lax.broadcasted_iota(jnp.int32, (1, _WC), 1)
    # cs is BLOCK-LOCAL (nblk, 8, 128): per-rotation coefficient reads/
    # writes touch 8 vregs instead of 8 * (np_/128) — the full-width cs
    # cost ~0.6 us/rotation at np_=2048, the dominant sweep cost
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row_u = jax.lax.broadcasted_iota(jnp.int32, (_WR, _WR), 0)
    col_u = jax.lax.broadcasted_iota(jnp.int32, (_WR, _WR), 1)
    eye_u = (row_u == col_u).astype(jnp.float32)
    eye_wc = (jax.lax.broadcasted_iota(jnp.int32, (_WC, _WC), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (_WC, _WC), 1)
              ).astype(jnp.float32)
    nlv = np_ + LANES
    lvec = jax.lax.broadcasted_iota(jnp.int32, (1, nlv), 1)
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    def svec_scalar(ref, j):
        """ref: (2, 1, np_+128) lane-vector cache; -> (re, im) at lane j."""
        m = (lvec == j).astype(jnp.float32)
        return jnp.sum(ref[0] * m), jnp.sum(ref[1] * m)

    def win_dma(b8, b128, direction):
        # lane-dim DMA offsets must be provably 128-divisible on TPU;
        # rows anchor at b8 (8-aligned), cols at b128 = floor(b8/128)*128
        # with the in-window column offset d8 = b8 - b128 <= 120.
        hbm = h_ref.at[:, pl.ds(pl.multiple_of(b8, 8), _WR),
                       pl.ds(pl.multiple_of(b128, LANES), _WC)]
        if direction == "in":
            return pltpu.make_async_copy(hbm, win, sems.at[0])
        return pltpu.make_async_copy(win, hbm, sems.at[0])

    def extract_caches(b8, b128, width):
        """Refresh diag/sub/sup caches for ks in [b8, b8+width) from the
        (already re-read) window scratch; window entry (r, c) holds the
        global element (b8 + r, b128 + c). Caches are (1, nlv) lane
        vectors: the 256-lane extraction is placed at its global offset
        with a dynamic lane roll, then merged under the k-range mask."""
        d8 = b8 - b128
        md = (col_w == row_w + d8).astype(jnp.float32)       # k = b128 + c
        ms = (col_w == row_w + d8 - 1).astype(jnp.float32)   # k = b128 + c
        mp = (col_w == row_w + d8 + 1).astype(jnp.float32)   # k = b128 + c - 1
        vmask = jnp.logical_and(lvec >= b8, lvec < b8 + width) \
            .astype(jnp.float32)
        for p in range(2):
            dlane = jnp.sum(win[p] * md, axis=0, keepdims=True)  # (1, WC)
            slane = jnp.sum(win[p] * ms, axis=0, keepdims=True)
            plane_ = jnp.sum(win[p] * mp, axis=0, keepdims=True)
            pad = ((0, 0), (0, nlv - _WC))
            dfull = pltpu.roll(jnp.pad(dlane, pad), b128, 1)
            sfull = pltpu.roll(jnp.pad(slane, pad), b128, 1)
            pfull = pltpu.roll(jnp.pad(plane_, pad), b128 + nlv - 1, 1)
            dc[p] = dc[p] * (1.0 - vmask) + dfull * vmask
            sc[p] = sc[p] * (1.0 - vmask) + sfull * vmask
            pc[p] = pc[p] * (1.0 - vmask) + pfull * vmask

    def refresh_block(b8, b128, width):
        d = win_dma(b8, b128, "in")
        d.start()
        d.wait()
        extract_caches(b8, b128, width)

    # ---- zero-init scratch that is later read through x*0 masks -------
    # (uninitialized VMEM can hold NaN; 0 * NaN = NaN would poison the
    # masked sums — the round-2 advisor found exactly this class of bug
    # in the in-VMEM kernel's q buffer)
    cs[...] = jnp.zeros((nblk_max, 8, LANES), jnp.float32)
    for _p in range(2):
        dc[_p] = jnp.zeros((1, nlv), jnp.float32)
        sc[_p] = jnp.zeros((1, nlv), jnp.float32)
        pc[_p] = jnp.zeros((1, nlv), jnp.float32)

    # ---- initial cache fill -------------------------------------------
    def init_blk(bi, carry):
        b8 = bi * _BS
        b128 = (b8 // LANES) * LANES

        @pl.when(b8 < n)
        def _():
            refresh_block(b8, b128, _BS)
        return carry

    jax.lax.fori_loop(0, nblk_max, init_blk, 0)

    def deflate_and_lo(hi):
        smag = jnp.sqrt(sc[0] * sc[0] + sc[1] * sc[1])       # (1, nlv)
        dmag = jnp.sqrt(dc[0] * dc[0] + dc[1] * dc[1])
        dmag_next = pltpu.roll(dmag, nlv - 1, 1)
        scale = jnp.maximum(dmag + dmag_next, one)
        neg = smag <= tol * scale                            # entry k: H[k+1,k]
        cand = jnp.where(jnp.logical_and(lvec < hi - 1,
                                         jnp.logical_not(neg)), lvec, -1)
        new_hi = jnp.max(cand).astype(jnp.int32) + 2
        cand2 = jnp.where(jnp.logical_and(lvec < new_hi - 1, neg), lvec, -1)
        lo = jnp.max(cand2).astype(jnp.int32) + 1
        return new_hi, lo

    def sweep_cond(c):
        hi, lo, sweeps = c
        return jnp.logical_and(hi > 1, sweeps < max_sweeps)

    def sweep_body(c):
        hi, lo, sweeps = c
        # Wilkinson shift from trailing active 2x2 (same math as
        # _qr_eig_kernel)
        a_r, a_i = svec_scalar(dc, hi - 2)
        d_r, d_i = svec_scalar(dc, hi - 1)
        c_r, c_i = svec_scalar(sc, hi - 2)
        b_r, b_i = svec_scalar(pc, hi - 2)
        delr, deli = (a_r - d_r) * 0.5, (a_i - d_i) * 0.5
        zr = delr * delr - deli * deli + b_r * c_r - b_i * c_i
        zi = 2.0 * delr * deli + b_r * c_i + b_i * c_r
        mz = jnp.sqrt(zr * zr + zi * zi)
        sqr = jnp.sqrt(jnp.maximum((mz + zr) * 0.5, 0.0))
        sqi_mag = jnp.sqrt(jnp.maximum((mz - zr) * 0.5, 0.0))
        sqi = jnp.where(zi >= 0.0, sqi_mag, -sqi_mag)
        mu1r, mu1i = d_r + delr + sqr, d_i + deli + sqi
        mu2r, mu2i = d_r + delr - sqr, d_i + deli - sqi
        m1 = (mu1r - d_r) ** 2 + (mu1i - d_i) ** 2
        m2 = (mu2r - d_r) ** 2 + (mu2i - d_i) ** 2
        pick1 = m1 < m2
        mur = jnp.where(pick1, mu1r, mu2r)
        mui = jnp.where(pick1, mu1i, mu2i)

        # explicit shift schedule overrides Wilkinson (AED shift cycling)
        use_sched = n_shifts > 0
        sidx = jnp.where(use_sched,
                         sweeps % jnp.maximum(n_shifts, 1), 0)
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        smask = (lane_s == sidx).astype(jnp.float32)
        mur = jnp.where(use_sched, jnp.sum(sh_ref[0] * smask), mur)
        mui = jnp.where(use_sched, jnp.sum(sh_ref[1] * smask), mui)

        lo8 = (lo // 8) * 8
        nblk = (hi - 1 - lo8 + _BS - 1) // _BS

        # ---------------- left pass ------------------------------------
        def left_blk(bi, carry):
            b8 = lo8 + bi * _BS
            b128 = (b8 // LANES) * LANES
            d8 = b8 - b128

            @pl.when(bi < nblk)
            def _():
                d = win_dma(b8, b128, "in")
                d.start()
                d.wait()
                gr = row_w + b8
                gc = col_w + b128
                # subtract the shift on each active diagonal entry exactly
                # once across blocks: block 0 covers [lo, lo8+136), block
                # i > 0 covers [b8+16, b8+136) (the previous window ended
                # at b8+16+120 = b8_prev+136)
                sub_lo = jnp.maximum(lo, jnp.where(bi > 0, b8 + 16, lo))
                dmask = jnp.logical_and(
                    jnp.logical_and(gr == gc, gc < b8 + _WR),
                    jnp.logical_and(gc >= sub_lo, gc < hi)
                ).astype(jnp.float32)
                win[0] = win[0] - mur * dmask
                win[1] = win[1] - mui * dmask
                U[0] = eye_u
                U[1] = jnp.zeros((_WR, _WR), jnp.float32)

                kstart = jnp.maximum(lo, b8)
                kend = jnp.minimum(b8 + _BS, hi - 1)

                def rot(k, _c):
                    lr = k - b8
                    base16 = pl.multiple_of((lr // 8) * 8, 8)
                    off = lr - base16
                    mk = (sub16 == off).astype(jnp.float32)
                    mk1 = (sub16 == off + 1).astype(jnp.float32)
                    Wr = win[0, pl.ds(base16, 16), :]
                    Wi = win[1, pl.ds(base16, 16), :]
                    ohk = (lane_wc == lr + d8).astype(jnp.float32)
                    ar = jnp.sum(jnp.sum(Wr * mk, 0, keepdims=True) * ohk)
                    ai = jnp.sum(jnp.sum(Wi * mk, 0, keepdims=True) * ohk)
                    br = jnp.sum(jnp.sum(Wr * mk1, 0, keepdims=True) * ohk)
                    bi_ = jnp.sum(jnp.sum(Wi * mk1, 0, keepdims=True) * ohk)
                    r2 = ar * ar + ai * ai + br * br + bi_ * bi_
                    iszero = r2 == 0.0
                    rinv = jax.lax.rsqrt(jnp.where(iszero, one, r2))
                    g00r = jnp.where(iszero, one, ar * rinv)
                    g00i = jnp.where(iszero, zero, -ai * rinv)
                    g01r = jnp.where(iszero, zero, br * rinv)
                    g01i = jnp.where(iszero, zero, -bi_ * rinv)
                    Wr2, Wi2 = _rot_rows(Wr, Wi, mk, mk1,
                                         g00r, g00i, g01r, g01i, False)
                    win[0, pl.ds(base16, 16), :] = Wr2
                    win[1, pl.ds(base16, 16), :] = Wi2
                    Ur = U[0, pl.ds(base16, 16), :]
                    Ui = U[1, pl.ds(base16, 16), :]
                    Ur2, Ui2 = _rot_rows(Ur, Ui, mk, mk1,
                                         g00r, g00i, g01r, g01i, False)
                    U[0, pl.ds(base16, 16), :] = Ur2
                    U[1, pl.ds(base16, 16), :] = Ui2
                    val = (g00r * (row8 == 0) + g00i * (row8 == 1)
                           + g01r * (row8 == 2) + g01i * (row8 == 3)
                           ).astype(jnp.float32)
                    cs[bi] = jnp.where(lane8 == k - b8, val, cs[bi])
                    return _c

                jax.lax.fori_loop(kstart, kend, rot, 0)
                d = win_dma(b8, b128, "out")
                d.start()
                d.wait()

                # slab pass: rows [b8, b8+136) x cols [b128+256, hi)
                # (eigenvalues-only) or through n (Schur/vectors mode —
                # the trailing coupling columns must stay consistent)
                col_end = n if accumulate_q else hi
                nch = jnp.maximum(col_end - (b128 + _WC) + _SC - 1, 0) // _SC

                def sl_dma(slot, ci, direction):
                    hbm = h_ref.at[:, pl.ds(pl.multiple_of(b8, 8), _WR),
                                   pl.ds(pl.multiple_of(
                                       b128 + _WC + ci * _SC, LANES), _SC)]
                    if direction == "in":
                        return pltpu.make_async_copy(hbm, slab.at[slot],
                                                     sems.at[1 + slot])
                    return pltpu.make_async_copy(slab.at[slot], hbm,
                                                 sems.at[1 + slot])

                @pl.when(nch > 0)
                def _():
                    sl_dma(0, 0, "in").start()

                    def sl_body(ci, _s):
                        cur = ci % 2

                        @pl.when(ci + 1 < nch)
                        def _():
                            sl_dma((ci + 1) % 2, ci + 1, "in").start()
                        sl_dma(cur, ci, "in").wait()
                        # new = U @ slab (complex)
                        cr_ = _dotg(U[0], slab[cur, 0], (((1,), (0,)))) \
                            - _dotg(U[1], slab[cur, 1], (((1,), (0,))))
                        ci_ = _dotg(U[0], slab[cur, 1], (((1,), (0,)))) \
                            + _dotg(U[1], slab[cur, 0], (((1,), (0,))))
                        slab[cur, 0] = cr_
                        slab[cur, 1] = ci_
                        wb = sl_dma(cur, ci, "out")
                        wb.start()
                        wb.wait()
                        return _s

                    jax.lax.fori_loop(0, nch, sl_body, 0)
            return carry

        jax.lax.fori_loop(0, nblk_max, left_blk, 0)

        # ---------------- right pass -----------------------------------
        def right_blk(bi, carry):
            b8 = lo8 + bi * _BS
            b128 = (b8 // LANES) * LANES
            d8 = b8 - b128

            @pl.when(bi < nblk)
            def _():
                # rebuild the block's right factor in window-local column
                # coordinates (col c of Ux = global column b128 + c)
                Ux[0] = eye_wc
                Ux[1] = jnp.zeros((_WC, _WC), jnp.float32)
                kstart = jnp.maximum(lo, b8)
                kend = jnp.minimum(b8 + _BS, hi - 1)

                def rrot(k, _c):
                    lr = k - b128
                    base16 = pl.multiple_of((lr // 8) * 8, 8)
                    off = lr - base16
                    mk = (sub16 == off).astype(jnp.float32)
                    mk1 = (sub16 == off + 1).astype(jnp.float32)
                    ohk8 = (lane8 == k - b8).astype(jnp.float32)
                    csb = cs[bi]
                    g00r = jnp.sum(csb * ohk8 * (row8 == 0))
                    g00i = jnp.sum(csb * ohk8 * (row8 == 1))
                    g01r = jnp.sum(csb * ohk8 * (row8 == 2))
                    g01i = jnp.sum(csb * ohk8 * (row8 == 3))
                    Ur = Ux[0, pl.ds(base16, 16), :]
                    Ui = Ux[1, pl.ds(base16, 16), :]
                    Ur2, Ui2 = _rot_rows(Ur, Ui, mk, mk1,
                                         g00r, g00i, g01r, g01i, False)
                    Ux[0, pl.ds(base16, 16), :] = Ur2
                    Ux[1, pl.ds(base16, 16), :] = Ui2
                    return _c

                jax.lax.fori_loop(kstart, kend, rrot, 0)

                nrc = (b8 + _WR + rc_rows - 1) // rc_rows

                def rc_dma(slot, ri, direction):
                    hbm = h_ref.at[:, pl.ds(ri * rc_rows, rc_rows),
                                   pl.ds(pl.multiple_of(b128, LANES), _WC)]
                    if direction == "in":
                        return pltpu.make_async_copy(hbm, rch.at[slot],
                                                     sems.at[3 + slot])
                    return pltpu.make_async_copy(rch.at[slot], hbm,
                                                 sems.at[3 + slot])

                rc_dma(0, 0, "in").start()

                def rc_body(ri, _s):
                    cur = ri % 2

                    @pl.when(ri + 1 < nrc)
                    def _():
                        rc_dma((ri + 1) % 2, ri + 1, "in").start()
                    rc_dma(cur, ri, "in").wait()
                    # whole chunk gets chunk @ Ux^H (Ux identity outside
                    # the block's rotation columns)
                    c0 = rch[cur, 0]
                    c1 = rch[cur, 1]
                    nr = _dotg(c0, Ux[0], (((1,), (1,)))) \
                        + _dotg(c1, Ux[1], (((1,), (1,))))
                    ni = _dotg(c1, Ux[0], (((1,), (1,)))) \
                        - _dotg(c0, Ux[1], (((1,), (1,))))
                    # re-add the shift on diagonal entries in this chunk
                    grow = jax.lax.broadcasted_iota(
                        jnp.int32, (rc_rows, _WC), 0) + ri * rc_rows
                    gcol = jax.lax.broadcasted_iota(
                        jnp.int32, (rc_rows, _WC), 1) + b128
                    # re-add exactly once: this block's 120 columns, plus
                    # the trailing diag entry hi-1 when its last toucher
                    # (rotation hi-2) lives in this block but hi-1 does not
                    in_rng = jnp.logical_and(gcol >= b8, gcol < b8 + _BS)
                    last_fix = jnp.logical_and(
                        gcol == hi - 1,
                        jnp.logical_and(hi - 1 >= b8 + _BS,
                                        jnp.logical_and(hi - 2 >= b8,
                                                        hi - 2 < b8 + _BS)))
                    dmask = jnp.logical_and(
                        jnp.logical_and(grow == gcol,
                                        jnp.logical_or(in_rng, last_fix)),
                        jnp.logical_and(grow >= lo, grow < hi)
                    ).astype(jnp.float32)
                    rch[cur, 0] = nr + mur * dmask
                    rch[cur, 1] = ni + mui * dmask
                    wb = rc_dma(cur, ri, "out")
                    wb.start()
                    wb.wait()
                    return _s

                jax.lax.fori_loop(0, nrc, rc_body, 0)

                if accumulate_q:
                    # Q[:, b128:b128+256] @= Ux^H over all n rows
                    nrq = (n + rc_rows - 1) // rc_rows

                    def q_dma(slot, ri, direction):
                        hbm = q_ref.at[:, pl.ds(ri * rc_rows, rc_rows),
                                       pl.ds(pl.multiple_of(b128, LANES),
                                             _WC)]
                        if direction == "in":
                            return pltpu.make_async_copy(
                                hbm, rch.at[slot], sems.at[3 + slot])
                        return pltpu.make_async_copy(
                            rch.at[slot], hbm, sems.at[3 + slot])

                    q_dma(0, 0, "in").start()

                    def q_body(ri, _s):
                        cur = ri % 2

                        @pl.when(ri + 1 < nrq)
                        def _():
                            q_dma((ri + 1) % 2, ri + 1, "in").start()
                        q_dma(cur, ri, "in").wait()
                        c0 = rch[cur, 0]
                        c1 = rch[cur, 1]
                        rch[cur, 0] = _dotg(c0, Ux[0], (((1,), (1,)))) \
                            + _dotg(c1, Ux[1], (((1,), (1,))))
                        rch[cur, 1] = _dotg(c1, Ux[0], (((1,), (1,)))) \
                            - _dotg(c0, Ux[1], (((1,), (1,))))
                        wb = q_dma(cur, ri, "out")
                        wb.start()
                        wb.wait()
                        return _s

                    jax.lax.fori_loop(0, nrq, q_body, 0)
                # refresh diag/sub/sup caches for this block's columns
                # (the final block also covers its last, fully-finalized
                # entries up to hi)
                width = jnp.where(bi == nblk - 1,
                                  jnp.minimum(hi - b8, _WR), _BS)
                refresh_block(b8, b128, width)
            return carry

        jax.lax.fori_loop(0, nblk_max, right_blk, 0)

        new_hi, new_lo = deflate_and_lo(hi)
        return new_hi, new_lo, sweeps + 1

    hi0, lo0 = deflate_and_lo(n)
    hi, lo, sweeps = jax.lax.while_loop(
        sweep_cond, sweep_body, (hi0, lo0, jnp.zeros((), jnp.int32)))

    eig_ref[0] = dc[0, :, pl.ds(0, np_)]
    eig_ref[1] = dc[1, :, pl.ds(0, np_)]
    stat_ref[0] = sweeps
    stat_ref[1] = hi


def _rc_rows(np_: int) -> int:
    # the np_-dependent scratch (cs blocks + diag caches) squeezes the
    # budget at np_ >= 16384 (over by 83 KB at rc_rows = 512, round-5
    # probe) — halving the right-pass chunk rows frees 1 MB; layout
    # padding stays _RC, only the streaming granularity changes
    return 256 if np_ >= 16384 else _RC


def _make_scratch(np_: int):
    return [
        pltpu.VMEM((2, _WR, _WC), jnp.float32),            # win
        pltpu.VMEM((2, _WR, _WR), jnp.float32),            # U
        pltpu.VMEM((2, _WC, _WC), jnp.float32),            # Ux
        pltpu.VMEM((np_ // _BS + 1, 8, LANES), jnp.float32),  # cs
        pltpu.VMEM((2, 1, np_ + LANES), jnp.float32),      # diag cache
        pltpu.VMEM((2, 1, np_ + LANES), jnp.float32),      # sub cache
        pltpu.VMEM((2, 1, np_ + LANES), jnp.float32),      # sup cache
        pltpu.VMEM((2, 2, _WR, _SC), jnp.float32),         # slab
        pltpu.VMEM((2, 2, _rc_rows(np_), _WC), jnp.float32),  # rchunk
        pltpu.SemaphoreType.DMA((5,)),
    ]


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0,))
def qr_eig_blocked_step(p: jax.Array, n: jax.Array, max_sweeps: jax.Array,
                        tol: jax.Array, shifts: jax.Array | None = None,
                        n_shifts: jax.Array | int = 0, *,
                        interpret: bool = False):
    """Run up to ``max_sweeps`` shifted-Givens sweeps on ALREADY-PADDED
    HBM planes ``p`` of shape (2, np_ + _RC, np_ + _SC) (the layout
    ``qr_eig_blocked_planes`` builds), without the per-call re-pad.

    ``shifts`` (2, 1, 128) with ``n_shifts > 0`` cycles an explicit
    complex shift schedule (AED Ritz values) instead of Wilkinson.

    Returns ``(p', eig_planes (2, 1, np_), sweeps, hi)`` with ``p``
    donated — the resumable entry the AED driver (qr_aed.py) iterates:
    the kernel re-derives the active window [lo, hi) from the subdiagonal
    scan at entry, so sweeps and deflation rounds can interleave freely.
    """
    if shifts is None:
        shifts = jnp.zeros((2, 1, LANES), jnp.float32)
    return _step_pallas(p, n, max_sweeps, tol, shifts, n_shifts,
                        interpret=interpret)


def _step_pallas_q(p, q, n, max_sweeps, tol, shifts, n_shifts, *,
                   interpret: bool = False):
    """Schur-mode step: like ``_step_pallas`` but with Q accumulation
    and live trailing columns (the kernel's accumulate_q path). Returns
    ``(p', q', eig, sweeps, hi)``."""
    np_ = p.shape[1] - _RC
    scal = jnp.stack([jnp.asarray(n, jnp.int32),
                      jnp.asarray(max_sweeps, jnp.int32),
                      jnp.asarray(n_shifts, jnp.int32)])
    tolv = jnp.asarray(tol, jnp.float32).reshape(1)
    eig, stat, h_out, q_out = pl.pallas_call(
        functools.partial(_qr_blocked_kernel, np_=np_, accumulate_q=True,
                          rc_rows=_rc_rows(np_)),
        out_shape=(jax.ShapeDtypeStruct((2, 1, np_), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.int32),
                   jax.ShapeDtypeStruct((2, np_ + _RC, np_ + _SC),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((2, np_ + _RC, np_ + _SC),
                                        jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        input_output_aliases={3: 2, 4: 3},
        scratch_shapes=_make_scratch(np_),
        interpret=interpret,
    )(scal, tolv, shifts, p, q)
    return h_out, q_out, eig, stat[0], stat[1]


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def qr_eig_blocked_step_q(p: jax.Array, q: jax.Array, n: jax.Array,
                          max_sweeps: jax.Array, tol: jax.Array,
                          shifts: jax.Array | None = None,
                          n_shifts: jax.Array | int = 0, *,
                          interpret: bool = False):
    """Schur-mode resumable step (Q accumulated, trailing columns live);
    see ``qr_eig_blocked_step``."""
    if shifts is None:
        shifts = jnp.zeros((2, 1, LANES), jnp.float32)
    return _step_pallas_q(p, q, n, max_sweeps, tol, shifts, n_shifts,
                          interpret=interpret)


def pad_q_identity(np_: int):
    """The blocked-layout identity Q the Schur-mode kernels start from."""
    qeye = jnp.zeros((2, np_ + _RC, np_ + _SC), jnp.float32)
    return qeye.at[0, :np_, :np_].set(jnp.eye(np_, dtype=jnp.float32))


def _step_pallas(p, n, max_sweeps, tol, shifts, n_shifts, *,
                 interpret: bool = False):
    """Raw (unjitted) body of ``qr_eig_blocked_step`` — also inlined by
    the fused AED round in qr_aed.py."""
    np_ = p.shape[1] - _RC
    scal = jnp.stack([jnp.asarray(n, jnp.int32),
                      jnp.asarray(max_sweeps, jnp.int32),
                      jnp.asarray(n_shifts, jnp.int32)])
    tolv = jnp.asarray(tol, jnp.float32).reshape(1)
    eig, stat, h_out = pl.pallas_call(
        functools.partial(_qr_blocked_kernel, np_=np_,
                          rc_rows=_rc_rows(np_)),
        out_shape=(jax.ShapeDtypeStruct((2, 1, np_), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.int32),
                   jax.ShapeDtypeStruct((2, np_ + _RC, np_ + _SC),
                                        jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        input_output_aliases={3: 2},
        scratch_shapes=_make_scratch(np_),
        interpret=interpret,
    )(scal, tolv, shifts, p)
    return h_out, eig, stat[0], stat[1]


def pad_for_blocked(planes: jax.Array):
    """Pad (2, m, m) — or (1, m, m) real, whose zero imaginary plane is
    folded into the SAME pad (no (2, m, m) intermediate: at m = 16384
    that materialized an extra 2.1 GB and tipped the device OOM) — to
    the blocked kernel's HBM layout (2, np_ + _RC, np_ + _SC); returns
    (padded, np_)."""
    n_planes, m, _ = planes.shape
    assert n_planes in (1, 2)
    np_ = max(_round_up(m, LANES), 2 * LANES)
    p = jnp.pad(planes.astype(jnp.float32),
                ((0, 2 - n_planes), (0, np_ + _RC - m),
                 (0, np_ + _SC - m)))
    return p, np_


@functools.partial(jax.jit, static_argnames=("interpret", "accumulate_q"))
def qr_eig_blocked_planes(planes: jax.Array, n: jax.Array,
                          max_sweeps: jax.Array, tol: jax.Array, *,
                          interpret: bool = False,
                          accumulate_q: bool = False):
    """All eigenvalues of an upper-Hessenberg matrix in split planes,
    HBM-blocked (any n HBM holds; VMEM footprint O(np_)).

    Same contract as ``qr_hessenberg_eig_planes``: returns
    ``(eig_planes (2, m), sweeps, hi)``, ``hi <= 1`` means converged —
    plus ``(t_planes, q_planes)`` (the Schur factors, H = Q T Q^H of the
    INPUT Hessenberg matrix) when ``accumulate_q``.
    """
    n_planes, m, _ = planes.shape
    assert n_planes == 2
    p, np_ = pad_for_blocked(planes)
    scratch = _make_scratch(np_)
    scal = jnp.stack([jnp.asarray(n, jnp.int32),
                      jnp.asarray(max_sweeps, jnp.int32),
                      jnp.zeros((), jnp.int32)])   # no shift schedule
    tolv = jnp.asarray(tol, jnp.float32).reshape(1)
    sh0 = jnp.zeros((2, 1, LANES), jnp.float32)
    if accumulate_q:
        qeye = jnp.zeros((2, np_ + _RC, np_ + _SC), jnp.float32)
        qeye = qeye.at[0, :np_, :np_].set(jnp.eye(np_, dtype=jnp.float32))
        eig, stat, h_out, q_out = pl.pallas_call(
            functools.partial(_qr_blocked_kernel, np_=np_,
                              accumulate_q=True, rc_rows=_rc_rows(np_)),
            out_shape=(jax.ShapeDtypeStruct((2, 1, np_), jnp.float32),
                       jax.ShapeDtypeStruct((2,), jnp.int32),
                       jax.ShapeDtypeStruct((2, np_ + _RC, np_ + _SC),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((2, np_ + _RC, np_ + _SC),
                                            jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.HBM),
                       pl.BlockSpec(memory_space=pltpu.HBM)),
            input_output_aliases={3: 2, 4: 3},
            scratch_shapes=scratch,
            interpret=interpret,
        )(scal, tolv, sh0, p, qeye)
        return (eig[:, 0, :m], stat[0], stat[1],
                h_out[:, :m, :m], q_out[:, :m, :m])
    eig, stat, _h = pl.pallas_call(
        functools.partial(_qr_blocked_kernel, np_=np_,
                          rc_rows=_rc_rows(np_)),
        out_shape=(jax.ShapeDtypeStruct((2, 1, np_), jnp.float32),
                   jax.ShapeDtypeStruct((2,), jnp.int32),
                   jax.ShapeDtypeStruct((2, np_ + _RC, np_ + _SC),
                                        jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        input_output_aliases={3: 2},
        scratch_shapes=scratch,
        interpret=interpret,
    )(scal, tolv, sh0, p)
    return eig[:, 0, :m], stat[0], stat[1]


# Schur-driver crossover for compute_vectors (round-5 measurements, see
# docs/PERF_NOTES.md): the monolithic whole-solve kernel beats the
# Schur-mode AED driver at 2048 (5.6 s vs 6.9 s) AND at 4096 (28.2 s vs
# 31.4 s) — Q-carrying sweeps shrink the AED sweep saving and the
# per-round syncs/strip GEMMs eat the rest, so the predicted 4096
# crossover did NOT materialize. The AED driver's ~linear sweep growth
# should still win once the monolithic sweep count doubles again;
# dispatch flips at 8192 (measured, PERF_NOTES round-5 table). Pinned by
# tests/test_qr_aed.py::test_schur_driver_dispatch.
_SCHUR_AED_MIN_N = 8192


def qr_eigenvalues_pallas_blocked(a: np.ndarray, max_sweeps: int,
                                  tol: float, *, interpret: bool = False,
                                  compute_vectors: bool = False,
                                  schur_driver: str = "auto"):
    """Accelerated QR eigenvalues fully on-chip for sizes beyond the
    in-VMEM kernels' caps: blocked Hessenberg + blocked shifted-Givens
    QR, both HBM-resident. Same return contract as
    ``qr_kernels.qr_eigenvalues_pallas`` (eigenvalues complex64, sweeps,
    converged — plus an (n, n) complex64 eigenvector matrix when
    ``compute_vectors``: both kernels accumulate the unitary similarity
    in HBM and the triangular eigenvectors come from Pallas blocked
    back-substitution on device, exactly like the in-VMEM path).

    ``schur_driver`` (compute_vectors only): "monolithic" (whole-solve
    Q-accumulating kernel), "aed" (Schur-mode AED rounds), or "auto"
    (by ``_SCHUR_AED_MIN_N`` — the measured crossover)."""
    from .hessenberg_blocked import hessenberg_blocked_planes
    from .qr_kernels import split_planes_f32
    n = a.shape[0]
    planes = split_planes_f32(a)
    if not compute_vectors:
        h = hessenberg_blocked_planes(planes, n, interpret=interpret)
        if h.shape[0] == 1:
            h = jnp.concatenate([h, jnp.zeros_like(h)])
        eig, sweeps, hi = qr_eig_blocked_planes(h, n, max_sweeps, tol,
                                                interpret=interpret)
        e = np.asarray(jax.device_get(eig))
        return ((e[0] + 1j * e[1])[:n].astype(np.complex64),
                int(sweeps), bool(int(hi) <= 1))
    if schur_driver not in ("auto", "monolithic", "aed"):
        raise ValueError(f"unknown schur_driver {schur_driver!r}")
    if schur_driver == "auto":
        schur_driver = "aed" if n >= _SCHUR_AED_MIN_N else "monolithic"
    if planes.shape[0] == 2 and n > 1024 and not interpret:
        # complex eigenpairs beyond the 2-plane Hessenberg compile cap
        # (round 5): the structure-preserving embedded reduction
        # accumulates Q as an embedding too, so the Schur-mode sweep
        # stack and device eigenvector finishing run natively at n
        from .hessenberg_blocked import hessenberg_blocked_embedded
        h, qh = hessenberg_blocked_embedded(planes, n, interpret=interpret,
                                            accumulate_q=True)
    else:
        h, qh = hessenberg_blocked_planes(planes, n, interpret=interpret,
                                          accumulate_q=True)
        if h.shape[0] == 1:
            h = jnp.concatenate([h, jnp.zeros_like(h)])
            qh = jnp.concatenate([qh, jnp.zeros_like(qh)])
    if schur_driver == "aed":
        from .qr_aed import qr_eig_blocked_aed_schur_planes
        eig, sweeps, hi, t_pl, qs = qr_eig_blocked_aed_schur_planes(
            h, n, max_sweeps, tol, interpret=interpret)
    else:
        eig, sweeps, hi, t_pl, qs = qr_eig_blocked_planes(
            h, n, max_sweeps, tol, interpret=interpret, accumulate_q=True)
    e = np.asarray(jax.device_get(eig))
    eigs = (e[0] + 1j * e[1])[:n].astype(np.complex64)
    # device-resident finishing (VERDICT r3 task 3): Q_hess @ Q_sweeps,
    # Pallas blocked back-substitution, column normalization — only the
    # final V transfers to host
    from .qr_kernels import finish_eigenvectors_device, plane_matmul
    V = finish_eigenvectors_device(t_pl, plane_matmul(qh, qs), n,
                                   interpret=interpret)
    return eigs, int(sweeps), bool(int(hi) <= 1), V
