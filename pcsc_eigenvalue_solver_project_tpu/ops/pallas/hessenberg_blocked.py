"""Pallas TPU kernel: blocked Hessenberg reduction with HBM-resident planes.

Lifts the n <= 768 VMEM cap of ``qr_kernels.hessenberg_planes`` (VERDICT
r2 task 7): the matrix planes stay in HBM (``pl.ANY``) and the kernel
streams row slabs through double-buffered VMEM windows, so f32/c64 inputs
run fully on-chip at n >= 2048 instead of silently rerouting to the host
CPU. Same similarity-transform semantics as the reference per-column
Householder reduction (/root/reference/src/qr_method/to_hessenberg.hpp:
23-80 — tail-zero skip :46-48, phase-correct sign :51-57, degenerate
skip :62-64), reorganised as the compact-WY blocked algorithm so the
trailing update is MXU GEMMs instead of per-column rank-2 updates:

Per panel of ``nb`` columns starting at k0 (validated against the
unblocked reduction in tools/… prototype and tests/test_qr_blocked.py):

1. Panel columns ``A0[:, k0:k0+nb]`` are DMA'd once into VMEM.
2. Per column j (k = k0+j): the current column is reconstructed from the
   panel copy plus compact-WY corrections
   ``c = A0 e_k - Z T V^H e_k``; ``c -= V T^H V^H c``; the reflector
   ``v_j`` (tau in {0,2}) is built exactly like the reference; T and V
   grow by one column; ``z_j = A0 v_j`` is THE streamed matvec (row
   slabs of A0 DMA'd from HBM, MXU matvec per slab).
3. Panel end: the trailing matrix update
   ``A := (I - V T^H V^H)(A0 - (Z T) V^H)`` is two streamed GEMM passes
   (P = V^H A0, then A -= Y V^H + V W with W = T^H P - (T^H V^H Y) V^H).

All matmuls run at HIGHEST precision; complex inputs are split re/im
planes with 4-real-product expansion (no complex dtypes in Pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _dotT(a, b):
    """a^T @ b without materializing the transpose (contract dim 0)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _dot_nt(a, b):
    """a @ b^T without materializing the transpose (contract dim 1)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _rT(a, M):
    """(1, k) row times M^T for M (m, k) -> (1, m); equals (M a^T)^T."""
    return jax.lax.dot_general(a, M, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _rM(a, M):
    """(1, k) row times M (k, m) -> (1, m)."""
    return jax.lax.dot_general(a, M, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _outer(a_row, b_row):
    """a^T b for (1, m) and (1, n) rows -> (m, n) rank-1 update."""
    return jax.lax.dot_general(a_row, b_row, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _cmul_mv(Ar, Ai, xr, xi, conj_a=False):
    """(Ar + i Ai) @ (xr + i xi) -> (re, im); conj_a conjugates A."""
    s = -1.0 if conj_a else 1.0
    re = _dot(Ar, xr) - s * _dot(Ai, xi)
    im = s * _dot(Ai, xr) + _dot(Ar, xi)
    return re, im


def _hess_blocked_kernel(scal_ref, h_ref, *refs, n_planes: int, np_: int,
                         nb: int, slab_r: int, accumulate_q: bool = False):
    """Whole blocked reduction in one kernel launch (grid=()).

    Scratch layouts (all f32):
      pan : (n_planes, np_, 128)  panel columns, DMA'd at 128-aligned base
      V   : (n_planes, np_, nb)   reflectors (col j = v_{k0+j})
      Z   : (n_planes, np_, nb)   Z = A0 V ; becomes Y = Z T at panel end
      W   : (n_planes, nb, np_)   P = V^H A0 then W
      T   : (n_planes, nb, nb)    compact-WY T (tau = 2 on diag)
      slab: (2, n_planes, slab_r, np_) double-buffered row-slab windows
    """
    if accumulate_q:
        # inputs: (scal, h, q_eye); outputs: (h, n, q); then scratch
        (q_in, out_ref, nout_ref, q_ref,
         pan, V, Z, W, T, slab, sems) = refs
        del q_in  # aliased with q_ref
    else:
        out_ref, nout_ref, pan, V, Z, W, T, slab, sems = refs
        q_ref = None
    n = scal_ref[0]
    two = n_planes == 2
    n_slabs = np_ // slab_r
    n_panels = np_ // nb

    lane_np = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    lane_nb = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    del h_ref  # aliased with out_ref — all access goes through out_ref

    def slab_dma(buf_slot, si, direction, ref=None):
        """HBM<->VMEM copy of row slab si (both planes as one copy)."""
        hbm = (out_ref if ref is None else ref) \
            .at[:, pl.ds(si * slab_r, slab_r), :]
        dst = slab.at[buf_slot]
        if direction == "in":
            return pltpu.make_async_copy(hbm, dst, sems.at[buf_slot])
        return pltpu.make_async_copy(dst, hbm, sems.at[buf_slot])

    def panel_body(pi, _carry):
        k0 = pi * nb
        base = (k0 // LANES) * LANES      # 128-aligned panel DMA base
        half = k0 - base                  # 0 or 64 when nb == 64

        @pl.when(k0 < jnp.maximum(n - 2, 0))
        def _():
            # ---- 1. fetch panel columns --------------------------------
            pdma = pltpu.make_async_copy(
                out_ref.at[:, :, pl.ds(base, LANES)],
                pan, sems.at[2])
            pdma.start()
            pdma.wait()
            for p in range(n_planes):
                V[p] = jnp.zeros((np_, nb), jnp.float32)
                Z[p] = jnp.zeros((np_, nb), jnp.float32)
                T[p] = jnp.zeros((nb, nb), jnp.float32)

            # ---- 2. reflector loop -------------------------------------
            # Every plane-length vector lives in (1, np_) LANE-ROW form:
            # an (np_, 1) column occupies 128x its bytes in (8, 128)
            # tiling, and ~10 live column temporaries blew the 16 MB
            # scoped-VMEM budget at n = 2048. Contractions use
            # dot_general so no transpose is ever materialized.
            def col_body(j, _c):
                k = k0 + j
                e_pan = ((jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                          == half + j)).astype(jnp.float32)
                e_nb = (lane_nb == j).astype(jnp.float32)   # (1, nb)
                cr = _rT(e_pan, pan[0])                     # (1, np_)
                ci = _rT(e_pan, pan[1]) if two else None

                # compact-WY corrections: c -= Z T V^H e_k ; c -= V T^H V^H c
                # Complex runs every plane-pair product as ONE stacked
                # contraction (operands concatenated along the free dim,
                # results sliced): each HIGHEST-precision matmul instance
                # keeps hi/lo bf16 operand splits on the Mosaic stack,
                # and the unfused 4-product complex form blew the 16 MB
                # scoped-VMEM budget at n >= 1024.
                e_k = (lane_np == k).astype(jnp.float32)    # (1, np_)
                if two:
                    TcatR = jnp.concatenate([T[0], T[1]], axis=0)  # (2nb, nb)
                    TcatC = jnp.concatenate([T[0], T[1]], axis=1)  # (nb, 2nb)
                    VcatC = jnp.concatenate([V[0], V[1]], axis=1)  # (np_, 2nb)
                    VcatR = jnp.concatenate([V[0], V[1]], axis=0)  # (2np_, nb)
                    ZcatR = jnp.concatenate([Z[0], Z[1]], axis=0)  # (2np_, nb)
                    vv = _rM(e_k, VcatC)                   # [V0[k,:] | V1[k,:]]
                    ar, ai = vv[:, 0:nb], -vv[:, nb:]
                    # t1 = conj(V[k,:]) @ T^T
                    p_ar = _rT(ar, TcatR)                  # [arT0^T | arT1^T]
                    p_ai = _rT(ai, TcatR)
                    t1r = p_ar[:, 0:nb] - p_ai[:, nb:]
                    t1i = p_ar[:, nb:] + p_ai[:, 0:nb]
                    q_r = _rT(t1r, ZcatR)                  # (1, 2np_)
                    q_i = _rT(t1i, ZcatR)
                    cr = cr - (q_r[:, 0:np_] - q_i[:, np_:])
                    ci = ci - (q_r[:, np_:] + q_i[:, 0:np_])
                    # u = c @ conj(V)
                    u_r = _rM(cr, VcatC)
                    u_i = _rM(ci, VcatC)
                    ur = u_r[:, 0:nb] + u_i[:, nb:]
                    ui = u_i[:, 0:nb] - u_r[:, nb:]
                    # t2 = u @ conj(T)
                    w_r = _rM(ur, TcatC)
                    w_i = _rM(ui, TcatC)
                    t2r = w_r[:, 0:nb] + w_i[:, nb:]
                    t2i = w_i[:, 0:nb] - w_r[:, nb:]
                    s_r = _rT(t2r, VcatR)                  # (1, 2np_)
                    s_i = _rT(t2i, VcatR)
                    cr = cr - (s_r[:, 0:np_] - s_i[:, np_:])
                    ci = ci - (s_r[:, np_:] + s_i[:, 0:np_])
                else:
                    vrow_r = _rM(e_k, V[0])                # (1, nb): V[k,:]
                    t1 = _rT(vrow_r, T[0])
                    cr = cr - _rT(t1, Z[0])
                    u = _rM(cr, V[0])
                    cr = cr - _rT(_rM(u, T[0]), V[0])

                # reflector (to_hessenberg.hpp:38-77 semantics)
                mask_tail = (lane_np >= k + 1).astype(jnp.float32)
                xr = cr * mask_tail
                xi = ci * mask_tail if two else None
                nrm2 = jnp.sum(xr * xr) + (jnp.sum(xi * xi) if two else 0.0)
                norm_x = jnp.sqrt(nrm2)
                mask_t2 = (lane_np >= k + 2).astype(jnp.float32)
                tail2 = jnp.sum(cr * cr * mask_t2) + (
                    jnp.sum(ci * ci * mask_t2) if two else 0.0)
                tail_zero = tail2 == 0.0
                e_k1 = (lane_np == k + 1).astype(jnp.float32)
                x0r = jnp.sum(cr * e_k1)
                x0i = jnp.sum(ci * e_k1) if two else zero
                m0 = jnp.sqrt(x0r * x0r + x0i * x0i)
                has0 = m0 > 0.0
                m0s = jnp.where(has0, m0, one)
                sgr = jnp.where(has0, x0r / m0s, one)
                sgi = jnp.where(has0, x0i / m0s, zero)
                vr = xr + sgr * norm_x * e_k1               # (1, np_)
                vi = (xi + sgi * norm_x * e_k1) if two else None
                vn2 = jnp.sum(vr * vr) + (jnp.sum(vi * vi) if two else 0.0)
                degenerate = vn2 == 0.0
                vinv = jax.lax.rsqrt(jnp.where(degenerate, one, vn2))
                tau = jnp.where(jnp.logical_or(tail_zero, degenerate),
                                zero, 2.0 * one)
                vr = vr * vinv * jnp.where(tau > 0, one, zero)
                if two:
                    vi = vi * vinv * jnp.where(tau > 0, one, zero)

                # T[:, j] = -tau * T @ (V^H v);  T[j, j] = tau
                if two:
                    m_r = _rM(vr, VcatC)
                    m_i = _rM(vi, VcatC)
                    sr_ = m_r[:, 0:nb] + m_i[:, nb:]
                    si_ = m_i[:, 0:nb] - m_r[:, nb:]
                    n_r = _rT(sr_, TcatR)
                    n_i = _rT(si_, TcatR)
                    tcr = -tau * (n_r[:, 0:nb] - n_i[:, nb:])
                    tci = -tau * (n_r[:, nb:] + n_i[:, 0:nb])
                else:
                    sr_ = _rM(vr, V[0])
                    tcr = -tau * _rT(sr_, T[0])
                below_j = (lane_nb < j).astype(jnp.float32)   # (1, nb)
                diag_j = tau * e_nb
                T[0] = T[0] + _outer(tcr * below_j + diag_j, e_nb)
                if two:
                    T[1] = T[1] + _outer(tci * below_j, e_nb)

                # V[:, j] = v
                V[0] = V[0] + _outer(vr, e_nb)
                if two:
                    V[1] = V[1] + _outer(vi, e_nb)

                # z_j = A0 v_j : streamed row slabs, double-buffered
                slab_dma(0, 0, "in").start()

                def mv_slab(si, acc):
                    cur = si % 2
                    @pl.when(si + 1 < n_slabs)
                    def _():
                        slab_dma((si + 1) % 2, si + 1, "in").start()
                    slab_dma(cur, si, "in").wait()
                    rows = pl.ds(si * slab_r, slab_r)
                    keep = (1.0 - e_nb)
                    if two:
                        # ONE stacked contraction per plane: Mosaic
                        # rejects dotA - dotB matvec chains ("only
                        # constant accumulators supported"); P_p =
                        # slab_p @ [vr; vi]^T gives both products and
                        # the combine is elementwise
                        v2 = jnp.concatenate([vr, vi], axis=0)  # (2, np_)
                        p0 = _dot_nt(slab[cur, 0], v2)          # (slab_r, 2)
                        p1 = _dot_nt(slab[cur, 1], v2)
                        zr_s = p0[:, 0:1] - p1[:, 1:2]
                        zi_s = p0[:, 1:2] + p1[:, 0:1]
                        Z[0, rows] = Z[0, rows] * keep + _dot(zr_s, e_nb)
                        Z[1, rows] = Z[1, rows] * keep + _dot(zi_s, e_nb)
                    else:
                        z_s = _dot_nt(slab[cur, 0], vr)
                        Z[0, rows] = Z[0, rows] * keep + _dot(z_s, e_nb)
                    return acc

                jax.lax.fori_loop(0, n_slabs, mv_slab, 0)
                return _c

            nb_live = jnp.clip(n - 2 - k0, 0, nb)
            jax.lax.fori_loop(0, nb_live, col_body, 0)

            # ---- 3. blocked trailing update ----------------------------
            # P = V^H A0 (streamed); accumulate into W
            for p in range(n_planes):
                W[p] = jnp.zeros((nb, np_), jnp.float32)
            slab_dma(0, 0, "in").start()

            def p_slab(si, acc):
                cur = si % 2
                @pl.when(si + 1 < n_slabs)
                def _():
                    slab_dma((si + 1) % 2, si + 1, "in").start()
                slab_dma(cur, si, "in").wait()
                rows = pl.ds(si * slab_r, slab_r)
                if two:
                    vs2 = jnp.concatenate([V[0, rows], V[1, rows]],
                                          axis=1)           # (slab_r, 2nb)
                    p0 = _dotT(vs2, slab[cur, 0])           # (2nb, np_)
                    p1 = _dotT(vs2, slab[cur, 1])
                    W[0] = W[0] + p0[0:nb] + p1[nb:]
                    W[1] = W[1] + p1[0:nb] - p0[nb:]
                else:
                    W[0] = W[0] + _dotT(V[0, rows], slab[cur, 0])
                return acc

            jax.lax.fori_loop(0, n_slabs, p_slab, 0)

            # Y = Z T (overwrite Z); G2 = T^H (V^H Y); W = T^H P - G2 V^H
            # (complex: stacked single contractions — see col_body note)
            if two:
                Tc = jnp.concatenate([T[0], T[1]], axis=1)   # (nb, 2nb)
                Vc = jnp.concatenate([V[0], V[1]], axis=1)   # (np_, 2nb)
                y0 = _dot(Z[0], Tc)                          # (np_, 2nb)
                y1 = _dot(Z[1], Tc)
                Z[0] = y0[:, 0:nb] - y1[:, nb:]
                Z[1] = y0[:, nb:] + y1[:, 0:nb]
                g0 = _dotT(Vc, Z[0])                         # (2nb, nb)
                g1 = _dotT(Vc, Z[1])
                vyr = g0[0:nb] + g1[nb:]
                vyi = g1[0:nb] - g0[nb:]
                h0 = _dotT(Tc, vyr)                          # (2nb, nb)
                h1 = _dotT(Tc, vyi)
                g2r = h0[0:nb] + h1[nb:]
                g2i = h1[0:nb] - h0[nb:]
                pw0 = _dotT(Tc, W[0])                        # (2nb, np_)
                pw1 = _dotT(Tc, W[1])
                pr = pw0[0:nb] + pw1[nb:]
                pi_ = pw1[0:nb] - pw0[nb:]
                W[0] = pr - _dot_nt(jnp.concatenate([g2r, g2i], axis=1), Vc)
                W[1] = pi_ - _dot_nt(jnp.concatenate([g2i, -g2r], axis=1),
                                     Vc)
            else:
                Z[0] = _dot(Z[0], T[0])
                g2 = _dot(T[0].T, _dotT(V[0], Z[0]))
                W[0] = _dotT(T[0], W[0]) - _dot_nt(g2, V[0])

            # A := A0 - Y V^H - V W  (streamed read-modify-write)
            slab_dma(0, 0, "in").start()

            row_in_slab = jax.lax.broadcasted_iota(
                jnp.int32, (slab_r, np_), 0)
            col_in_slab = jax.lax.broadcasted_iota(
                jnp.int32, (slab_r, np_), 1)

            def upd_slab(si, acc):
                cur = si % 2
                @pl.when(si + 1 < n_slabs)
                def _():
                    slab_dma((si + 1) % 2, si + 1, "in").start()
                slab_dma(cur, si, "in").wait()
                rows = pl.ds(si * slab_r, slab_r)
                if two:
                    # Y V^H and V W as stacked contractions
                    vcu = jnp.concatenate([V[0], V[1]], axis=1)  # (np_, 2nb)
                    ar = _dot_nt(jnp.concatenate(
                        [Z[0, rows], Z[1, rows]], axis=1), vcu)
                    ai = _dot_nt(jnp.concatenate(
                        [Z[1, rows], -Z[0, rows]], axis=1), vcu)
                    vr2 = jnp.concatenate([V[0, rows], V[1, rows]], axis=1)
                    br = _dot(vr2, jnp.concatenate([W[0], -W[1]], axis=0))
                    bi = _dot(vr2, jnp.concatenate([W[1], W[0]], axis=0))
                    slab[cur, 0] = slab[cur, 0] - ar - br
                    slab[cur, 1] = slab[cur, 1] - ai - bi
                else:
                    slab[cur, 0] = slab[cur, 0] - _dot_nt(Z[0, rows], V[0]) \
                        - _dot(V[0, rows], W[0])
                # exact zeros below the subdiagonal of the panel columns
                # (the blocked GEMM update leaves f32 noise there; the
                # reference's eliminated entries are computed zeros)
                grow = si * slab_r + row_in_slab
                in_panel = jnp.logical_and(
                    col_in_slab >= k0,
                    col_in_slab < jnp.minimum(k0 + nb, n - 2))
                keep_z = jnp.logical_not(jnp.logical_and(
                    in_panel, grow >= col_in_slab + 2)).astype(jnp.float32)
                slab[cur, 0] = slab[cur, 0] * keep_z
                if two:
                    slab[cur, 1] = slab[cur, 1] * keep_z
                wb = slab_dma(cur, si, "out")
                wb.start()
                wb.wait()
                return acc

            jax.lax.fori_loop(0, n_slabs, upd_slab, 0)

            if accumulate_q:
                # Q := Q (I - V T V^H) = Q - (Q V) T V^H.
                # pass A: QV = Q @ V accumulated into the free pan buffer
                for p_ in range(n_planes):
                    pan[p_, :, 0:nb] = jnp.zeros((np_, nb), jnp.float32)
                slab_dma(0, 0, "in", q_ref).start()

                def qv_slab(si, acc):
                    cur = si % 2
                    @pl.when(si + 1 < n_slabs)
                    def _():
                        slab_dma((si + 1) % 2, si + 1, "in", q_ref).start()
                    slab_dma(cur, si, "in", q_ref).wait()
                    rows = pl.ds(si * slab_r, slab_r)
                    if two:
                        pan[0, rows, 0:nb] = _dot(slab[cur, 0], V[0]) \
                            - _dot(slab[cur, 1], V[1])
                        pan[1, rows, 0:nb] = _dot(slab[cur, 0], V[1]) \
                            + _dot(slab[cur, 1], V[0])
                    else:
                        pan[0, rows, 0:nb] = _dot(slab[cur, 0], V[0])
                    return acc

                jax.lax.fori_loop(0, n_slabs, qv_slab, 0)
                # M = (Q V) T, overwrite the pan slice
                if two:
                    mr = _dot(pan[0, :, 0:nb], T[0]) \
                        - _dot(pan[1, :, 0:nb], T[1])
                    mi = _dot(pan[0, :, 0:nb], T[1]) \
                        + _dot(pan[1, :, 0:nb], T[0])
                    pan[0, :, 0:nb] = mr
                    pan[1, :, 0:nb] = mi
                else:
                    pan[0, :, 0:nb] = _dot(pan[0, :, 0:nb], T[0])
                # pass B: Q -= M V^H
                slab_dma(0, 0, "in", q_ref).start()

                def qupd_slab(si, acc):
                    cur = si % 2
                    @pl.when(si + 1 < n_slabs)
                    def _():
                        slab_dma((si + 1) % 2, si + 1, "in", q_ref).start()
                    slab_dma(cur, si, "in", q_ref).wait()
                    rows = pl.ds(si * slab_r, slab_r)
                    if two:
                        ar = _dot_nt(pan[0, rows, 0:nb], V[0]) \
                            + _dot_nt(pan[1, rows, 0:nb], V[1])
                        ai = _dot_nt(pan[1, rows, 0:nb], V[0]) \
                            - _dot_nt(pan[0, rows, 0:nb], V[1])
                        slab[cur, 0] = slab[cur, 0] - ar
                        slab[cur, 1] = slab[cur, 1] - ai
                    else:
                        slab[cur, 0] = slab[cur, 0] \
                            - _dot_nt(pan[0, rows, 0:nb], V[0])
                    wb = slab_dma(cur, si, "out", q_ref)
                    wb.start()
                    wb.wait()
                    return acc

                jax.lax.fori_loop(0, n_slabs, qupd_slab, 0)

        return _carry

    jax.lax.fori_loop(0, n_panels, panel_body, 0)
    nout_ref[0] = n


@functools.partial(jax.jit, static_argnames=("interpret", "accumulate_q",
                                             "nb", "slab_r",
                                             "phase_split", "chunk"))
def hessenberg_blocked_planes(planes: jax.Array, n: jax.Array, *,
                              interpret: bool = False,
                              accumulate_q: bool = False,
                              nb: int | None = None,
                              slab_r: int | None = None,
                              phase_split: bool | None = None,
                              chunk: int | None = None):
    """Blocked Hessenberg reduction of split planes, HBM-resident.

    ``planes``: (n_planes, m, m) f32 (1 = real, 2 = re/im), live region
    the top-left (n, n), padding zero. Returns planes of the same shape —
    or ``(h_planes, q_planes)`` with ``A = Q H Q^H`` when
    ``accumulate_q`` (Q updated per panel as two extra streamed GEMM
    passes). Handles any m the chip's HBM holds (VMEM is O(n * nb)).
    """
    n_planes, m, _ = planes.shape
    np_ = max(_round_up(m, LANES), 2 * LANES)
    nb_defaulted = nb is None
    if nb_defaulted:
        nb = 64
    # complex n=2048 overflows the 16 MB scoped-VMEM stack by ~0.8 MB at
    # slab_r=64 (even with the fused plane-pair matmuls); halving the
    # slab window buys ~1.3 MB of declared buffer + slab temporaries
    slab_defaulted = slab_r is None
    if slab_defaulted:
        slab_r = 64 if n_planes == 1 else 32
    if chunk is None and n_planes == 1 and np_ > 4096:
        # round-5 per-phase sub-splitting: beyond the proven 4096 real
        # ceiling, chunk every np_-operand matmul so static instance
        # splits stay bounded; shrink the slab window so the remaining
        # whole-slab DMA buffers fit the budget too. At np_ >= 16384 the
        # DECLARED buffers dominate (pan alone is np_ * 512 B = 8 MB) —
        # nb/slab_r drop to 16 (probed: compiles at 16384)
        chunk = next(c for c in (1024, 896, 768, 640, 512, 384, 256, 128)
                     if np_ % c == 0)
        if slab_defaulted:
            slab_r = 16 if np_ >= 16384 else 32
        if nb_defaulted and np_ >= 16384:
            nb = 16
    if np_ % nb != 0:
        raise ValueError(
            f"hessenberg_blocked_planes: nb ({nb}) must divide the "
            f"padded size ({np_}) — the panel loop would truncate")
    if np_ % slab_r != 0:
        raise ValueError(
            f"hessenberg_blocked_planes: slab_r ({slab_r}) must divide "
            f"the padded size ({np_}) — the slab loop would truncate")
    p = jnp.pad(planes.astype(jnp.float32),
                ((0, 0), (0, np_ - m), (0, np_ - m)))
    if phase_split is None:
        # the monolithic kernel's HIGHEST-precision operand splits crash
        # the remote compiler beyond these sizes (round-4 diagnosis)
        phase_split = (n_planes == 2 and np_ > 1024) or \
            (n_planes == 1 and np_ > 2048) or chunk is not None
        if phase_split and nb_defaulted:
            nb = min(nb, 32)   # halves the per-instance split footprint
    if chunk is not None and not phase_split:
        raise ValueError("chunk requires phase_split")
    if phase_split:
        q0 = None
        if accumulate_q:
            q0 = jnp.zeros((n_planes, np_, np_), jnp.float32)
            q0 = q0.at[0].set(jnp.eye(np_, dtype=jnp.float32))
        h, q = _phase_split_reduce(
            p, n, n_planes=n_planes, np_=np_, nb=nb, slab_r=slab_r,
            accumulate_q=accumulate_q, interpret=interpret, q0=q0,
            chunk=chunk)
        if accumulate_q:
            return h[:, :m, :m], q[:, :m, :m]
        return h[:, :m, :m]
    scratch = [
        pltpu.VMEM((n_planes, np_, LANES), jnp.float32),   # pan
        pltpu.VMEM((n_planes, np_, nb), jnp.float32),      # V
        pltpu.VMEM((n_planes, np_, nb), jnp.float32),      # Z
        pltpu.VMEM((n_planes, nb, np_), jnp.float32),      # W
        pltpu.VMEM((n_planes, nb, nb), jnp.float32),       # T
        pltpu.VMEM((2, n_planes, slab_r, np_), jnp.float32),  # slab
        pltpu.SemaphoreType.DMA((3,)),
    ]
    if accumulate_q:
        eye = jnp.zeros((n_planes, np_, np_), jnp.float32)
        eye = eye.at[0].set(jnp.eye(np_, dtype=jnp.float32))
        out, _, q = pl.pallas_call(
            functools.partial(_hess_blocked_kernel, n_planes=n_planes,
                              np_=np_, nb=nb, slab_r=slab_r,
                              accumulate_q=True),
            out_shape=(jax.ShapeDtypeStruct((n_planes, np_, np_),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((1,), jnp.int32),
                       jax.ShapeDtypeStruct((n_planes, np_, np_),
                                            jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                       pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.HBM)),
            input_output_aliases={1: 0, 2: 2},
            scratch_shapes=scratch,
            interpret=interpret,
        )(jnp.asarray(n, jnp.int32).reshape(1), p, eye)
        return out[:, :m, :m], q[:, :m, :m]
    out, _ = pl.pallas_call(
        functools.partial(_hess_blocked_kernel, n_planes=n_planes, np_=np_,
                          nb=nb, slab_r=slab_r),
        out_shape=(jax.ShapeDtypeStruct((n_planes, np_, np_), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        input_output_aliases={1: 0},
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray(n, jnp.int32).reshape(1), p)
    return out[:, :m, :m]


@functools.partial(jax.jit, static_argnames=("interpret", "nb", "slab_r",
                                             "chunk", "accumulate_q"))
def hessenberg_blocked_embedded(planes: jax.Array, n: jax.Array, *,
                                interpret: bool = False,
                                nb: int | None = None,
                                slab_r: int | None = None,
                                chunk: int | None = None,
                                accumulate_q: bool = False):
    """Complex Hessenberg reduction via the structure-preserving real
    embedding (round 5, VERDICT task 2): builds A_e = [[Re, -Im],
    [Im, Re]] (ONE real plane, 2nph x 2nph) and reduces it with COMPLEX
    paired-column reflectors (_hess_panelA_emb_kernel), so the output is
    exactly embed(complex Hessenberg) and the split planes feed the
    native 2-plane AED sweep stack with no conjugation ambiguity — this
    replaces the two full rotated-spectrum solves of
    ``qr_aed._complex_via_real_embedding`` with ONE reduction at 2n.
    The 1-plane kernels compile to np_ = 8192 (chunked), i.e. complex
    n <= 4096 fully on-chip.

    ``planes``: (2, m, m) f32 re/im. Returns (2, m, m) split planes of
    the complex Hessenberg form (same similarity semantics as
    ``hessenberg_blocked_planes`` on the 2-plane path)."""
    n_planes, m, _ = planes.shape
    if n_planes != 2:
        raise ValueError("hessenberg_blocked_embedded: planes must be "
                         "(2, m, m) re/im")
    nph = max(_round_up(m, LANES), 2 * LANES)
    np2 = 2 * nph
    if nb is None:
        # nbc = nb/2 complex columns per panel; np2 >= 16384 (complex
        # n >= 8192) needs the lean tiling (probed: compiles)
        nb = 16 if np2 >= 16384 else 32
    if slab_r is None:
        slab_r = 16 if np2 >= 16384 else 32
    if chunk is None:
        chunk = next(c for c in (1024, 896, 768, 640, 512, 384, 256, 128)
                     if nph % c == 0)
    pr = jnp.pad(planes[0].astype(jnp.float32),
                 ((0, nph - m), (0, nph - m)))
    pi_ = jnp.pad(planes[1].astype(jnp.float32),
                  ((0, nph - m), (0, nph - m)))
    a_e = jnp.concatenate([
        jnp.concatenate([pr, -pi_], axis=1),
        jnp.concatenate([pi_, pr], axis=1)], axis=0)[None]
    q0 = None
    if accumulate_q:
        # embed(I) = I_{2nph}; phase C's real update Q -= (Q V) T V^T is
        # embed(Q_c (I - V T V^H)) by the homomorphism, so Q stays an
        # embedding and the complex Q planes are its blocks
        q0 = jnp.eye(np2, dtype=jnp.float32)[None]
    h, q = _phase_split_reduce(
        a_e, n, n_planes=1, np_=np2, nb=nb, slab_r=slab_r,
        accumulate_q=accumulate_q, interpret=interpret, chunk=chunk,
        emb=True, q0=q0)
    h_pl = jnp.stack([h[0, :m, :m], h[0, nph:nph + m, :m]])
    if accumulate_q:
        return h_pl, jnp.stack([q[0, :m, :m], q[0, nph:nph + m, :m]])
    return h_pl


# ---------------------------------------------------------------------------
# Phase-split variant: one panel per kernel pair, for sizes where the
# monolithic kernel's HIGHEST-precision matmul operand splits exceed the
# remote compiler's scoped-VMEM budget (diagnosed round 4: complex
# np_ >= 1152 and real np_ >= 3072 crash the tpu_compile_helper at
# HIGHEST precision but compile instantly at DEFAULT — the per-instance
# hi/lo bf16 splits are the driver, so halving the instances per program
# by splitting the panel-reflector and trailing-update phases into
# separate pallas_calls restores compilation with identical numerics).
# ---------------------------------------------------------------------------

def _hess_panelA_kernel(scal_ref, h_hbm, V, Z, T, pan, slab, *rest,
                        n_planes: int, np_: int, nb: int, slab_r: int,
                        chunk: int | None = None):
    """Phase A of one panel: build reflectors V, compact-WY T, and
    Z = A0 V (streamed matvec). Reads h only; writes the VMEM outputs.

    ``chunk`` (per-phase sub-splitting, round-5): when set, every matmul
    whose operand carries an np_-sized dimension runs as a ``fori`` over
    ``chunk``-row/col slices, so each STATIC matmul instance's
    HIGHEST-precision hi/lo bf16 operand splits are bounded by the chunk
    size instead of np_.  The remote compiler keeps per-instance splits
    live for the whole program (round-4 diagnosis) — at np_ = 8192 the
    unchunked phase kernels' cumulative splits plus declared scratch
    exceed the 16 MB scoped-VMEM budget and the compile helper dies;
    chunking makes the budget O(instances * chunk * nb), np_-independent.
    1-plane (real) path only; requires chunk % 128 == 0 and
    np_ % chunk == 0."""
    if chunk is not None:
        rowbuf, sems = rest
    else:
        (sems,) = rest
        rowbuf = None
    k0 = scal_ref[0]
    n = scal_ref[1]
    two = n_planes == 2
    n_slabs = np_ // slab_r
    base = (k0 // LANES) * LANES
    half = k0 - base
    lane_np = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    lane_nb = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    for p in range(n_planes):
        V[p] = jnp.zeros((np_, nb), jnp.float32)
        Z[p] = jnp.zeros((np_, nb), jnp.float32)
        T[p] = jnp.zeros((nb, nb), jnp.float32)

    def slab_in(buf_slot, si):
        hbm = h_hbm.at[:, pl.ds(si * slab_r, slab_r), :]
        return pltpu.make_async_copy(hbm, slab.at[buf_slot],
                                     sems.at[buf_slot])

    n_ch = np_ // chunk if chunk is not None else 0

    def _lane_ds(rc):
        return pl.ds(pl.multiple_of(rc * chunk, LANES), chunk)

    def _row_ds(rc):
        return pl.ds(rc * chunk, chunk)

    @pl.when(k0 < jnp.maximum(n - 2, 0))
    def _():
        pdma = pltpu.make_async_copy(
            h_hbm.at[:, :, pl.ds(pl.multiple_of(base, LANES), LANES)],
            pan, sems.at[2])
        pdma.start()
        pdma.wait()

        def col_body_chunked(j, _c):
            # 1-plane sub-split column step: identical math to col_body's
            # real branch, with every np_-operand matmul chunked (see
            # kernel docstring). rowbuf holds the live (1, np_) column.
            k = k0 + j
            e_pan = ((jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                      == half + j)).astype(jnp.float32)
            e_nb = (lane_nb == j).astype(jnp.float32)

            def ext_step(rc, _):
                rowbuf[:, _lane_ds(rc)] = _rT(e_pan, pan[0, _row_ds(rc), :])
                return _
            jax.lax.fori_loop(0, n_ch, ext_step, 0)

            def vrow_step(rc, acc):
                ek_ch = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, chunk), 1) + rc * chunk
                    == k).astype(jnp.float32)
                return acc + _rM(ek_ch, V[0, _row_ds(rc), :])
            vrow_r = jax.lax.fori_loop(0, n_ch, vrow_step,
                                       jnp.zeros((1, nb), jnp.float32))
            t1 = _rT(vrow_r, T[0])

            def zt_step(rc, _):
                rowbuf[:, _lane_ds(rc)] = rowbuf[:, _lane_ds(rc)] \
                    - _rT(t1, Z[0, _row_ds(rc), :])
                return _
            jax.lax.fori_loop(0, n_ch, zt_step, 0)

            def u_step(rc, acc):
                return acc + _rM(rowbuf[:, _lane_ds(rc)],
                                 V[0, _row_ds(rc), :])
            u = jax.lax.fori_loop(0, n_ch, u_step,
                                  jnp.zeros((1, nb), jnp.float32))
            t3 = _rM(u, T[0])

            def vt_step(rc, _):
                rowbuf[:, _lane_ds(rc)] = rowbuf[:, _lane_ds(rc)] \
                    - _rT(t3, V[0, _row_ds(rc), :])
                return _
            jax.lax.fori_loop(0, n_ch, vt_step, 0)

            cr = rowbuf[:, :]                       # (1, np_)

            mask_tail = (lane_np >= k + 1).astype(jnp.float32)
            xr = cr * mask_tail
            norm_x = jnp.sqrt(jnp.sum(xr * xr))
            mask_t2 = (lane_np >= k + 2).astype(jnp.float32)
            tail_zero = jnp.sum(cr * cr * mask_t2) == 0.0
            e_k1 = (lane_np == k + 1).astype(jnp.float32)
            x0r = jnp.sum(cr * e_k1)
            has0 = jnp.abs(x0r) > 0.0
            sgr = jnp.where(has0, jnp.sign(x0r), one)
            vr = xr + sgr * norm_x * e_k1
            vn2 = jnp.sum(vr * vr)
            degenerate = vn2 == 0.0
            vinv = jax.lax.rsqrt(jnp.where(degenerate, one, vn2))
            tau = jnp.where(jnp.logical_or(tail_zero, degenerate),
                            zero, 2.0 * one)
            vr = vr * vinv * jnp.where(tau > 0, one, zero)

            rowbuf[:, :] = vr

            def s_step(rc, acc):
                return acc + _rM(rowbuf[:, _lane_ds(rc)],
                                 V[0, _row_ds(rc), :])
            sr_ = jax.lax.fori_loop(0, n_ch, s_step,
                                    jnp.zeros((1, nb), jnp.float32))
            tcr = -tau * _rT(sr_, T[0])
            below_j = (lane_nb < j).astype(jnp.float32)
            T[0] = T[0] + _outer(tcr * below_j + tau * e_nb, e_nb)

            # V[:, j] = v chunk-wise: an _outer with a (1, np_) operand
            # materializes the TRANSPOSED (np_, 1) column on the Mosaic
            # stack — (8, 128)-tiling pads it to np_ * 512 B (4 MB at
            # 8192) plus its hi/lo splits, the single biggest stack item
            # (probed round 5); per-chunk outers cap it at chunk * 512 B
            def vw_step(rc, _):
                V[0, _row_ds(rc), :] = V[0, _row_ds(rc), :] \
                    + _outer(rowbuf[:, _lane_ds(rc)], e_nb)
                return _
            jax.lax.fori_loop(0, n_ch, vw_step, 0)

            slab_in(0, 0).start()

            def mv_slab(si, acc):
                cur = si % 2

                @pl.when(si + 1 < n_slabs)
                def _():
                    slab_in((si + 1) % 2, si + 1).start()
                slab_in(cur, si).wait()
                rows = pl.ds(si * slab_r, slab_r)
                keep = (1.0 - e_nb)

                def mch(rc, acc):
                    return acc + _dot_nt(slab[cur, 0, :, _lane_ds(rc)],
                                         rowbuf[:, _lane_ds(rc)])
                z_s = jax.lax.fori_loop(
                    0, n_ch, mch, jnp.zeros((slab_r, 1), jnp.float32))
                Z[0, rows] = Z[0, rows] * keep + _dot(z_s, e_nb)
                return acc

            jax.lax.fori_loop(0, n_slabs, mv_slab, 0)
            return _c

        def col_body(j, _c):
            k = k0 + j
            e_pan = ((jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                      == half + j)).astype(jnp.float32)
            e_nb = (lane_nb == j).astype(jnp.float32)
            cr = _rT(e_pan, pan[0])
            ci = _rT(e_pan, pan[1]) if two else None
            e_k = (lane_np == k).astype(jnp.float32)
            if two:
                TcatR = jnp.concatenate([T[0], T[1]], axis=0)
                TcatC = jnp.concatenate([T[0], T[1]], axis=1)
                VcatC = jnp.concatenate([V[0], V[1]], axis=1)
                VcatR = jnp.concatenate([V[0], V[1]], axis=0)
                ZcatR = jnp.concatenate([Z[0], Z[1]], axis=0)
                vv = _rM(e_k, VcatC)
                ar, ai = vv[:, 0:nb], -vv[:, nb:]
                # pairs sharing a big operand run as ONE stacked-lhs
                # instance so the operand's hi/lo bf16 split is paid
                # once (the remote compiler keeps per-instance splits
                # live for the whole program — round-4 diagnosis)
                p_a = _rT(jnp.concatenate([ar, ai], axis=0), TcatR)
                p_ar, p_ai = p_a[0:1], p_a[1:2]
                t1r = p_ar[:, 0:nb] - p_ai[:, nb:]
                t1i = p_ar[:, nb:] + p_ai[:, 0:nb]
                q_ = _rT(jnp.concatenate([t1r, t1i], axis=0), ZcatR)
                q_r, q_i = q_[0:1], q_[1:2]
                cr = cr - (q_r[:, 0:np_] - q_i[:, np_:])
                ci = ci - (q_r[:, np_:] + q_i[:, 0:np_])
                u_ = _rM(jnp.concatenate([cr, ci], axis=0), VcatC)
                u_r, u_i = u_[0:1], u_[1:2]
                ur = u_r[:, 0:nb] + u_i[:, nb:]
                ui = u_i[:, 0:nb] - u_r[:, nb:]
                w_ = _rM(jnp.concatenate([ur, ui], axis=0), TcatC)
                w_r, w_i = w_[0:1], w_[1:2]
                t2r = w_r[:, 0:nb] + w_i[:, nb:]
                t2i = w_i[:, 0:nb] - w_r[:, nb:]
                s_ = _rT(jnp.concatenate([t2r, t2i], axis=0), VcatR)
                s_r, s_i = s_[0:1], s_[1:2]
                cr = cr - (s_r[:, 0:np_] - s_i[:, np_:])
                ci = ci - (s_r[:, np_:] + s_i[:, 0:np_])
            else:
                vrow_r = _rM(e_k, V[0])
                t1 = _rT(vrow_r, T[0])
                cr = cr - _rT(t1, Z[0])
                u = _rM(cr, V[0])
                cr = cr - _rT(_rM(u, T[0]), V[0])

            mask_tail = (lane_np >= k + 1).astype(jnp.float32)
            xr = cr * mask_tail
            xi = ci * mask_tail if two else None
            nrm2 = jnp.sum(xr * xr) + (jnp.sum(xi * xi) if two else 0.0)
            norm_x = jnp.sqrt(nrm2)
            mask_t2 = (lane_np >= k + 2).astype(jnp.float32)
            tail2 = jnp.sum(cr * cr * mask_t2) + (
                jnp.sum(ci * ci * mask_t2) if two else 0.0)
            tail_zero = tail2 == 0.0
            e_k1 = (lane_np == k + 1).astype(jnp.float32)
            x0r = jnp.sum(cr * e_k1)
            x0i = jnp.sum(ci * e_k1) if two else zero
            m0 = jnp.sqrt(x0r * x0r + x0i * x0i)
            has0 = m0 > 0.0
            m0s = jnp.where(has0, m0, one)
            sgr = jnp.where(has0, x0r / m0s, one)
            sgi = jnp.where(has0, x0i / m0s, zero)
            vr = xr + sgr * norm_x * e_k1
            vi = (xi + sgi * norm_x * e_k1) if two else None
            vn2 = jnp.sum(vr * vr) + (jnp.sum(vi * vi) if two else 0.0)
            degenerate = vn2 == 0.0
            vinv = jax.lax.rsqrt(jnp.where(degenerate, one, vn2))
            tau = jnp.where(jnp.logical_or(tail_zero, degenerate),
                            zero, 2.0 * one)
            vr = vr * vinv * jnp.where(tau > 0, one, zero)
            if two:
                vi = vi * vinv * jnp.where(tau > 0, one, zero)

            if two:
                VcatC2 = jnp.concatenate([V[0], V[1]], axis=1)
                TcatR2 = jnp.concatenate([T[0], T[1]], axis=0)
                m_ = _rM(jnp.concatenate([vr, vi], axis=0), VcatC2)
                m_r, m_i = m_[0:1], m_[1:2]
                sr_ = m_r[:, 0:nb] + m_i[:, nb:]
                si_ = m_i[:, 0:nb] - m_r[:, nb:]
                n_ = _rT(jnp.concatenate([sr_, si_], axis=0), TcatR2)
                n_r, n_i = n_[0:1], n_[1:2]
                tcr = -tau * (n_r[:, 0:nb] - n_i[:, nb:])
                tci = -tau * (n_r[:, nb:] + n_i[:, 0:nb])
            else:
                sr_ = _rM(vr, V[0])
                tcr = -tau * _rT(sr_, T[0])
            below_j = (lane_nb < j).astype(jnp.float32)
            diag_j = tau * e_nb
            T[0] = T[0] + _outer(tcr * below_j + diag_j, e_nb)
            if two:
                T[1] = T[1] + _outer(tci * below_j, e_nb)
            V[0] = V[0] + _outer(vr, e_nb)
            if two:
                V[1] = V[1] + _outer(vi, e_nb)

            slab_in(0, 0).start()

            def mv_slab(si, acc):
                cur = si % 2

                @pl.when(si + 1 < n_slabs)
                def _():
                    slab_in((si + 1) % 2, si + 1).start()
                slab_in(cur, si).wait()
                rows = pl.ds(si * slab_r, slab_r)
                keep = (1.0 - e_nb)
                if two:
                    v2 = jnp.concatenate([vr, vi], axis=0)
                    p0 = _dot_nt(slab[cur, 0], v2)
                    p1 = _dot_nt(slab[cur, 1], v2)
                    zr_s = p0[:, 0:1] - p1[:, 1:2]
                    zi_s = p0[:, 1:2] + p1[:, 0:1]
                    Z[0, rows] = Z[0, rows] * keep + _dot(zr_s, e_nb)
                    Z[1, rows] = Z[1, rows] * keep + _dot(zi_s, e_nb)
                else:
                    z_s = _dot_nt(slab[cur, 0], vr)
                    Z[0, rows] = Z[0, rows] * keep + _dot(z_s, e_nb)
                return acc

            jax.lax.fori_loop(0, n_slabs, mv_slab, 0)
            return _c

        nb_live = jnp.clip(n - 2 - k0, 0, nb)
        jax.lax.fori_loop(0, nb_live,
                          col_body_chunked if chunk is not None else col_body,
                          0)


def _hess_panelA_emb_kernel(scal_ref, h_hbm, V, Z, T, pan, slab, rowbuf,
                            sems, *, np_: int, nb: int, slab_r: int,
                            chunk: int):
    """Phase A, complex-embedded mode (round 5, VERDICT task 2).

    The matrix is the real embedding A_e = [[Re, -Im], [Im, Re]] of a
    complex A, ONE plane of size np_ = 2 * nph. Reflectors are COMPLEX
    (phase-correct sign, to_hessenberg.hpp:51-57) represented as PAIRED
    embedded columns: complex reflector v -> V_e columns j = [vr; vi]
    and nbc + j = [-vi; vr], with T_e = [[Tr, -Ti], [Ti, Tr]] (block
    arrangement, nb = 2 * nbc).  Because embed is a *-algebra
    homomorphism (embed(XY) = embed(X)embed(Y), embed(X^H) = embed(X)^T)
    the compact-WY corrections and the ENTIRE trailing update (phases
    B/C) are the unchanged real formulas on embedded operands — only the
    reflector construction and the V/Z/T column writes are
    complex-aware.  The transforms commute with J = [[0,-I],[I,0]], so
    the reduction PRESERVES the embedding and the output is
    embed(complex Hessenberg): the split planes feed the native 2-plane
    AED sweep stack directly — no conjugation ambiguity, no second
    solve (replaces _complex_via_real_embedding's rotated re-solve,
    qr_aed.py).  The streamed matvec runs ONCE per complex column:
    z_pair = A_e (J v_e) = J z by commutation, a swap-negate of halves.

    Always chunked (embedded sizes start beyond the unchunked compile
    ceiling); requires chunk | nph."""
    nph = np_ // 2
    nbc = nb // 2
    k0 = scal_ref[0]          # complex column index of the panel start
    n = scal_ref[1]           # complex live size
    n_slabs = np_ // slab_r
    n_ch = np_ // chunk
    n_ch_h = nph // chunk
    base = (k0 // LANES) * LANES
    half = k0 - base
    lane_np = jax.lax.broadcasted_iota(jnp.int32, (1, nph), 1)
    lane_nbe = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    lane_nbc = jax.lax.broadcasted_iota(jnp.int32, (1, nbc), 1)
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    V[0] = jnp.zeros((np_, nb), jnp.float32)
    Z[0] = jnp.zeros((np_, nb), jnp.float32)
    T[0] = jnp.zeros((nb, nb), jnp.float32)

    def _lane_ds(rc):
        return pl.ds(pl.multiple_of(rc * chunk, LANES), chunk)

    def _row_ds(rc):
        return pl.ds(rc * chunk, chunk)

    def slab_in(slot, si):
        return pltpu.make_async_copy(
            h_hbm.at[:, pl.ds(si * slab_r, slab_r), :],
            slab.at[slot], sems.at[slot])

    @pl.when(k0 < jnp.maximum(n - 2, 0))
    def _():
        pdma = pltpu.make_async_copy(
            h_hbm.at[:, :, pl.ds(pl.multiple_of(base, LANES), LANES)],
            pan, sems.at[2])
        pdma.start()
        pdma.wait()

        def col_body(j, _c):
            k = k0 + j
            e_pan = ((jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
                      == half + j)).astype(jnp.float32)
            e_j = (lane_nbe == j).astype(jnp.float32)            # (1, nb)
            e_pj = (lane_nbe == nbc + j).astype(jnp.float32)

            # ---- embedded column k into rowbuf -------------------------
            def ext_step(rc, _):
                rowbuf[:, _lane_ds(rc)] = _rT(e_pan, pan[0, _row_ds(rc), :])
                return _
            jax.lax.fori_loop(0, n_ch, ext_step, 0)

            # ---- compact-WY corrections: REAL formulas on embedded ----
            def vrow_step(rc, acc):
                ek_ch = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, chunk), 1) + rc * chunk
                    == k).astype(jnp.float32)
                return acc + _rM(ek_ch, V[0, _row_ds(rc), :])
            vrow_r = jax.lax.fori_loop(0, n_ch, vrow_step,
                                       jnp.zeros((1, nb), jnp.float32))
            t1 = _rT(vrow_r, T[0])

            def zt_step(rc, _):
                rowbuf[:, _lane_ds(rc)] = rowbuf[:, _lane_ds(rc)] \
                    - _rT(t1, Z[0, _row_ds(rc), :])
                return _
            jax.lax.fori_loop(0, n_ch, zt_step, 0)

            def u_step(rc, acc):
                return acc + _rM(rowbuf[:, _lane_ds(rc)],
                                 V[0, _row_ds(rc), :])
            u = jax.lax.fori_loop(0, n_ch, u_step,
                                  jnp.zeros((1, nb), jnp.float32))
            t3 = _rM(u, T[0])

            def vt_step(rc, _):
                rowbuf[:, _lane_ds(rc)] = rowbuf[:, _lane_ds(rc)] \
                    - _rT(t3, V[0, _row_ds(rc), :])
                return _
            jax.lax.fori_loop(0, n_ch, vt_step, 0)

            # ---- complex reflector from the lane halves ---------------
            cr = rowbuf[:, 0:nph]
            ci = rowbuf[:, nph:np_]
            mask_tail = (lane_np >= k + 1).astype(jnp.float32)
            xr = cr * mask_tail
            xi = ci * mask_tail
            norm_x = jnp.sqrt(jnp.sum(xr * xr) + jnp.sum(xi * xi))
            mask_t2 = (lane_np >= k + 2).astype(jnp.float32)
            tail_zero = (jnp.sum(cr * cr * mask_t2)
                         + jnp.sum(ci * ci * mask_t2)) == 0.0
            e_k1 = (lane_np == k + 1).astype(jnp.float32)
            x0r = jnp.sum(cr * e_k1)
            x0i = jnp.sum(ci * e_k1)
            m0 = jnp.sqrt(x0r * x0r + x0i * x0i)
            has0 = m0 > 0.0
            m0s = jnp.where(has0, m0, one)
            sgr = jnp.where(has0, x0r / m0s, one)
            sgi = jnp.where(has0, x0i / m0s, zero)
            vr = xr + sgr * norm_x * e_k1
            vi = xi + sgi * norm_x * e_k1
            vn2 = jnp.sum(vr * vr) + jnp.sum(vi * vi)
            degenerate = vn2 == 0.0
            vinv = jax.lax.rsqrt(jnp.where(degenerate, one, vn2))
            tau = jnp.where(jnp.logical_or(tail_zero, degenerate),
                            zero, 2.0 * one)
            live = jnp.where(tau > 0, one, zero)
            vr = vr * vinv * live
            vi = vi * vinv * live

            # ---- T update: real formula on embedded operands ----------
            # m_e = V_e^T v_e  ==  embed rep of V_c^H v  (block columns)
            rowbuf[:, 0:nph] = vr
            rowbuf[:, nph:np_] = vi

            def s_step(rc, acc):
                return acc + _rM(rowbuf[:, _lane_ds(rc)],
                                 V[0, _row_ds(rc), :])
            s_e = jax.lax.fori_loop(0, n_ch, s_step,
                                    jnp.zeros((1, nb), jnp.float32))
            tc_e = -tau * _rT(s_e, T[0])            # embed rep of T_c m
            tcr = tc_e[:, 0:nbc]
            tci = tc_e[:, nbc:nb]
            below = (lane_nbc < j).astype(jnp.float32)
            diag_j = tau * (lane_nbc == j).astype(jnp.float32)
            colj = jnp.concatenate([tcr * below + diag_j, tci * below],
                                   axis=1)
            colpj = jnp.concatenate([-tci * below, tcr * below + diag_j],
                                    axis=1)
            T[0] = T[0] + _outer(colj, e_j) + _outer(colpj, e_pj)

            # ---- V columns j and nbc+j (paired) -----------------------
            def vw_step(rc, _):
                V[0, _row_ds(rc), :] = V[0, _row_ds(rc), :] \
                    + _outer(rowbuf[:, _lane_ds(rc)], e_j)
                return _
            jax.lax.fori_loop(0, n_ch, vw_step, 0)

            # ---- z_j = A_e v_e (streamed), then z_pair = J z ----------
            def mv_slab(si, acc):
                cur = si % 2

                @pl.when(si + 1 < n_slabs)
                def _():
                    slab_in((si + 1) % 2, si + 1).start()
                slab_in(cur, si).wait()
                rows = pl.ds(si * slab_r, slab_r)
                keep = 1.0 - e_j - e_pj

                def mch(rc, acc2):
                    return acc2 + _dot_nt(slab[cur, 0, :, _lane_ds(rc)],
                                          rowbuf[:, _lane_ds(rc)])
                z_s = jax.lax.fori_loop(
                    0, n_ch, mch, jnp.zeros((slab_r, 1), jnp.float32))
                Z[0, rows] = Z[0, rows] * keep + _dot(z_s, e_j)
                return acc

            slab_in(0, 0).start()
            jax.lax.fori_loop(0, n_slabs, mv_slab, 0)

            # paired column: rows [0, nph) get -z[nph:], rows [nph, 2nph)
            # get +z[:nph]  (J z — no second matvec, B commutes with J)
            ej_row = e_j

            def pair_step(rc, _):
                t_off = rc * chunk
                src = jnp.where(t_off < nph, t_off + nph, t_off - nph)
                sgn = jnp.where(t_off < nph, -one, one)
                zc = _dot_nt(Z[0, pl.ds(pl.multiple_of(src, LANES), chunk),
                               :], ej_row)                  # (chunk, 1)
                Z[0, _row_ds(rc), :] = Z[0, _row_ds(rc), :] \
                    + _dot(sgn * zc, e_pj)
                return _
            jax.lax.fori_loop(0, n_ch, pair_step, 0)

            # rewrite rowbuf to the paired reflector and write V col nbc+j
            rowbuf[:, 0:nph] = -vi
            rowbuf[:, nph:np_] = vr

            def vw2_step(rc, _):
                V[0, _row_ds(rc), :] = V[0, _row_ds(rc), :] \
                    + _outer(rowbuf[:, _lane_ds(rc)], e_pj)
                return _
            jax.lax.fori_loop(0, n_ch, vw2_step, 0)
            return _c

        nb_live = jnp.clip(n - 2 - k0, 0, nbc)
        jax.lax.fori_loop(0, nb_live, col_body, 0)


def _hess_panelB_kernel(scal_ref, V, Z, T, h_in, h_ref, W, Y, slab, sems,
                        *, n_planes: int, np_: int, nb: int, slab_r: int,
                        chunk: int | None = None, emb: bool = False):
    """Phase B of one panel: the blocked trailing update
    A := (I - V T^H V^H)(A - (Z T) V^H) streamed over row slabs.
    ``chunk``: per-phase sub-splitting of the np_-operand matmuls (see
    _hess_panelA_kernel docstring); 1-plane only.
    ``emb``: complex-embedded mode (_hess_panelA_emb_kernel) — the GEMM
    update is the unchanged real math (embed is a homomorphism); only
    the exact-zero enforcement differs: an eliminated complex entry
    H[i, k] = 0 zeroes embedded rows i (Re block) AND nph + i (Im
    block), with k0/n counted in COMPLEX columns (nbc = nb // 2)."""
    k0 = scal_ref[0]
    n = scal_ref[1]
    two = n_planes == 2
    n_slabs = np_ // slab_r
    n_ch = np_ // chunk if chunk is not None else 0

    def _lane_ds(rc):
        return pl.ds(pl.multiple_of(rc * chunk, LANES), chunk)

    def _row_ds(rc):
        return pl.ds(rc * chunk, chunk)
    del h_in  # aliased with h_ref

    def slab_dma(buf_slot, si, direction):
        hbm = h_ref.at[:, pl.ds(si * slab_r, slab_r), :]
        if direction == "in":
            return pltpu.make_async_copy(hbm, slab.at[buf_slot],
                                         sems.at[buf_slot])
        return pltpu.make_async_copy(slab.at[buf_slot], hbm,
                                     sems.at[buf_slot])

    @pl.when(k0 < jnp.maximum(n - 2, 0))
    def _():
        for p in range(n_planes):
            W[p] = jnp.zeros((nb, np_), jnp.float32)
        slab_dma(0, 0, "in").start()

        def p_slab(si, acc):
            cur = si % 2

            @pl.when(si + 1 < n_slabs)
            def _():
                slab_dma((si + 1) % 2, si + 1, "in").start()
            slab_dma(cur, si, "in").wait()
            rows = pl.ds(si * slab_r, slab_r)
            if two:
                vs2 = jnp.concatenate([V[0, rows], V[1, rows]], axis=1)
                p0 = _dotT(vs2, slab[cur, 0])
                p1 = _dotT(vs2, slab[cur, 1])
                W[0] = W[0] + p0[0:nb] + p1[nb:]
                W[1] = W[1] + p1[0:nb] - p0[nb:]
            elif chunk is not None:
                def pch(rc, _):
                    W[0, :, _lane_ds(rc)] = W[0, :, _lane_ds(rc)] \
                        + _dotT(V[0, rows], slab[cur, 0, :, _lane_ds(rc)])
                    return _
                jax.lax.fori_loop(0, n_ch, pch, 0)
            else:
                W[0] = W[0] + _dotT(V[0, rows], slab[cur, 0])
            return acc

        jax.lax.fori_loop(0, n_slabs, p_slab, 0)

        # Y = Z T ; G2 = T^H (V^H Y) ; W = T^H P - G2 V^H
        if two:
            Tc = jnp.concatenate([T[0], T[1]], axis=1)
            Vc = jnp.concatenate([V[0], V[1]], axis=1)
            # Z rows stacked: ONE instance shares Tc's split
            yc = _dot(jnp.concatenate([Z[0], Z[1]], axis=0), Tc)
            y0, y1 = yc[0:np_], yc[np_:]
            Y[0] = y0[:, 0:nb] - y1[:, nb:]
            Y[1] = y0[:, nb:] + y1[:, 0:nb]
            gc = _dotT(Vc, jnp.concatenate([Y[0], Y[1]], axis=1))
            g0, g1 = gc[:, 0:nb], gc[:, nb:]
            vyr = g0[0:nb] + g1[nb:]
            vyi = g1[0:nb] - g0[nb:]
            hc = _dotT(Tc, jnp.concatenate([vyr, vyi], axis=1))
            h0, h1 = hc[:, 0:nb], hc[:, nb:]
            g2r = h0[0:nb] + h1[nb:]
            g2i = h1[0:nb] - h0[nb:]
            pwc = _dotT(Tc, jnp.concatenate([W[0], W[1]], axis=1))
            pw0, pw1 = pwc[:, 0:np_], pwc[:, np_:]
            pr = pw0[0:nb] + pw1[nb:]
            pi_ = pw1[0:nb] - pw0[nb:]
            wuc = _dot_nt(jnp.concatenate(
                [jnp.concatenate([g2r, g2i], axis=1),
                 jnp.concatenate([g2i, -g2r], axis=1)], axis=0), Vc)
            W[0] = pr - wuc[0:nb]
            W[1] = pi_ - wuc[nb:]
        elif chunk is not None:
            # sub-split: Y rows, the V^H Y contraction, and the W update
            # all run chunk-wise so no instance carries an np_ operand
            def y_step(rc, _):
                Y[0, _row_ds(rc), :] = _dot(Z[0, _row_ds(rc), :], T[0])
                return _
            jax.lax.fori_loop(0, n_ch, y_step, 0)

            def vy_step(rc, acc):
                return acc + _dotT(V[0, _row_ds(rc), :],
                                   Y[0, _row_ds(rc), :])
            vy = jax.lax.fori_loop(0, n_ch, vy_step,
                                   jnp.zeros((nb, nb), jnp.float32))
            g2 = _dot(T[0].T, vy)

            def w_step(rc, _):
                W[0, :, _lane_ds(rc)] = _dotT(T[0], W[0, :, _lane_ds(rc)]) \
                    - _dot_nt(g2, V[0, _row_ds(rc), :])
                return _
            jax.lax.fori_loop(0, n_ch, w_step, 0)
        else:
            Y[0] = _dot(Z[0], T[0])
            g2 = _dot(T[0].T, _dotT(V[0], Y[0]))
            W[0] = _dotT(T[0], W[0]) - _dot_nt(g2, V[0])

        slab_dma(0, 0, "in").start()
        row_in_slab = jax.lax.broadcasted_iota(jnp.int32, (slab_r, np_), 0)
        col_in_slab = jax.lax.broadcasted_iota(jnp.int32, (slab_r, np_), 1)

        def upd_slab(si, acc):
            cur = si % 2

            @pl.when(si + 1 < n_slabs)
            def _():
                slab_dma((si + 1) % 2, si + 1, "in").start()
            slab_dma(cur, si, "in").wait()
            rows = pl.ds(si * slab_r, slab_r)
            if two:
                vcu = jnp.concatenate([V[0], V[1]], axis=1)
                ac = _dot_nt(jnp.concatenate(
                    [jnp.concatenate([Y[0, rows], Y[1, rows]], axis=1),
                     jnp.concatenate([Y[1, rows], -Y[0, rows]], axis=1)],
                    axis=0), vcu)
                ar, ai = ac[0:slab_r], ac[slab_r:]
                vr2 = jnp.concatenate([V[0, rows], V[1, rows]], axis=1)
                bc = _dot(vr2, jnp.concatenate(
                    [jnp.concatenate([W[0], -W[1]], axis=0),
                     jnp.concatenate([W[1], W[0]], axis=0)], axis=1))
                br, bi = bc[:, 0:np_], bc[:, np_:]
                slab[cur, 0] = slab[cur, 0] - ar - br
                slab[cur, 1] = slab[cur, 1] - ai - bi
            elif chunk is not None:
                def uch(rc, _):
                    a = _dot_nt(Y[0, rows], V[0, _row_ds(rc), :])
                    b = _dot(V[0, rows], W[0, :, _lane_ds(rc)])
                    slab[cur, 0, :, _lane_ds(rc)] = \
                        slab[cur, 0, :, _lane_ds(rc)] - a - b
                    return _
                jax.lax.fori_loop(0, n_ch, uch, 0)
            else:
                slab[cur, 0] = slab[cur, 0] - _dot_nt(Y[0, rows], V[0]) \
                    - _dot(V[0, rows], W[0])
            grow = si * slab_r + row_in_slab
            if emb:
                nph = np_ // 2
                nbc = nb // 2
                # embedded column c < nph is complex column c; column
                # nph + c is its mirror [-Im; Re] — both carry the
                # eliminated zeros of complex column c
                ccol = jnp.where(col_in_slab >= nph,
                                 col_in_slab - nph, col_in_slab)
                in_panel = jnp.logical_and(
                    ccol >= k0,
                    ccol < jnp.minimum(k0 + nbc, n - 2))
                below = jnp.logical_or(
                    jnp.logical_and(grow >= ccol + 2, grow < nph),
                    grow >= nph + ccol + 2)
            else:
                in_panel = jnp.logical_and(
                    col_in_slab >= k0,
                    col_in_slab < jnp.minimum(k0 + nb, n - 2))
                below = grow >= col_in_slab + 2
            keep_z = jnp.logical_not(jnp.logical_and(
                in_panel, below)).astype(jnp.float32)
            slab[cur, 0] = slab[cur, 0] * keep_z
            if two:
                slab[cur, 1] = slab[cur, 1] * keep_z
            wb = slab_dma(cur, si, "out")
            wb.start()
            wb.wait()
            return acc

        jax.lax.fori_loop(0, n_slabs, upd_slab, 0)


def _hess_panelC_kernel(scal_ref, V, T, q_in, q_ref, qv, slab, sems, *,
                        n_planes: int, np_: int, nb: int, slab_r: int,
                        chunk: int | None = None):
    """Phase C (accumulate_q): Q := Q - (Q V) T V^H streamed.
    ``chunk``: per-phase sub-splitting (see _hess_panelA_kernel)."""
    k0 = scal_ref[0]
    n = scal_ref[1]
    two = n_planes == 2
    n_slabs = np_ // slab_r
    n_ch = np_ // chunk if chunk is not None else 0

    def _lane_ds(rc):
        return pl.ds(pl.multiple_of(rc * chunk, LANES), chunk)

    def _row_ds(rc):
        return pl.ds(rc * chunk, chunk)
    del q_in

    def slab_dma(buf_slot, si, direction):
        hbm = q_ref.at[:, pl.ds(si * slab_r, slab_r), :]
        if direction == "in":
            return pltpu.make_async_copy(hbm, slab.at[buf_slot],
                                         sems.at[buf_slot])
        return pltpu.make_async_copy(slab.at[buf_slot], hbm,
                                     sems.at[buf_slot])

    @pl.when(k0 < jnp.maximum(n - 2, 0))
    def _():
        for p in range(n_planes):
            qv[p] = jnp.zeros((np_, nb), jnp.float32)
        slab_dma(0, 0, "in").start()

        def qv_slab(si, acc):
            cur = si % 2

            @pl.when(si + 1 < n_slabs)
            def _():
                slab_dma((si + 1) % 2, si + 1, "in").start()
            slab_dma(cur, si, "in").wait()
            rows = pl.ds(si * slab_r, slab_r)
            if two:
                qv[0, rows] = _dot(slab[cur, 0], V[0]) \
                    - _dot(slab[cur, 1], V[1])
                qv[1, rows] = _dot(slab[cur, 0], V[1]) \
                    + _dot(slab[cur, 1], V[0])
            elif chunk is not None:
                def qch(rc, acc):
                    return acc + _dot(slab[cur, 0, :, _lane_ds(rc)],
                                      V[0, _row_ds(rc), :])
                qv[0, rows] = jax.lax.fori_loop(
                    0, n_ch, qch, jnp.zeros((slab_r, nb), jnp.float32))
            else:
                qv[0, rows] = _dot(slab[cur, 0], V[0])
            return acc

        jax.lax.fori_loop(0, n_slabs, qv_slab, 0)
        if two:
            mr = _dot(qv[0], T[0]) - _dot(qv[1], T[1])
            mi = _dot(qv[0], T[1]) + _dot(qv[1], T[0])
            qv[0] = mr
            qv[1] = mi
        elif chunk is not None:
            def qt_step(rc, _):
                qv[0, _row_ds(rc), :] = _dot(qv[0, _row_ds(rc), :], T[0])
                return _
            jax.lax.fori_loop(0, n_ch, qt_step, 0)
        else:
            qv[0] = _dot(qv[0], T[0])
        slab_dma(0, 0, "in").start()

        def qupd_slab(si, acc):
            cur = si % 2

            @pl.when(si + 1 < n_slabs)
            def _():
                slab_dma((si + 1) % 2, si + 1, "in").start()
            slab_dma(cur, si, "in").wait()
            rows = pl.ds(si * slab_r, slab_r)
            if two:
                ar = _dot_nt(qv[0, rows], V[0]) + _dot_nt(qv[1, rows], V[1])
                ai = _dot_nt(qv[1, rows], V[0]) - _dot_nt(qv[0, rows], V[1])
                slab[cur, 0] = slab[cur, 0] - ar
                slab[cur, 1] = slab[cur, 1] - ai
            elif chunk is not None:
                def qu_step(rc, _):
                    slab[cur, 0, :, _lane_ds(rc)] = \
                        slab[cur, 0, :, _lane_ds(rc)] \
                        - _dot_nt(qv[0, rows], V[0, _row_ds(rc), :])
                    return _
                jax.lax.fori_loop(0, n_ch, qu_step, 0)
            else:
                slab[cur, 0] = slab[cur, 0] - _dot_nt(qv[0, rows], V[0])
            wb = slab_dma(cur, si, "out")
            wb.start()
            wb.wait()
            return acc

        jax.lax.fori_loop(0, n_slabs, qupd_slab, 0)


def _phase_split_reduce(p: jax.Array, n: jax.Array, *, n_planes: int,
                        np_: int, nb: int, slab_r: int,
                        accumulate_q: bool, interpret: bool,
                        q0: jax.Array | None = None,
                        chunk: int | None = None,
                        emb: bool = False):
    """fori over panels, two (three with Q) pallas_calls per panel.
    ``chunk``: per-phase sub-splitting of np_-operand matmuls (1-plane
    only) — the round-5 mitigation that lifts the real path past the
    np_ = 4096 cumulative-split compile ceiling.
    ``emb``: complex-embedded mode — 1-plane np_ = 2 * nph embedding
    with complex paired-column reflectors (_hess_panelA_emb_kernel);
    the panel loop counts COMPLEX columns (nbc = nb // 2 per panel) and
    ``n`` is the complex live size."""
    n_panels = (np_ // 2) // (nb // 2) if emb else np_ // nb
    if emb and chunk is None:
        raise ValueError("embedded phase-split requires chunk")
    if chunk is not None:
        if n_planes != 1:
            raise ValueError("chunked phase-split is 1-plane (real) only")
        if chunk % LANES != 0 or np_ % chunk != 0 or \
                (emb and (np_ // 2) % chunk != 0):
            raise ValueError(
                f"chunk ({chunk}) must be a multiple of {LANES} dividing "
                f"the padded size ({np_})")
    sc_vec = [pltpu.SemaphoreType.DMA((3,))]
    shapes_vzt = (jax.ShapeDtypeStruct((n_planes, np_, nb), jnp.float32),
                  jax.ShapeDtypeStruct((n_planes, np_, nb), jnp.float32),
                  jax.ShapeDtypeStruct((n_planes, nb, nb), jnp.float32))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    a_scratch = [pltpu.VMEM((n_planes, np_, LANES), jnp.float32),  # pan
                 pltpu.VMEM((2, n_planes, slab_r, np_), jnp.float32)]
    if chunk is not None:
        a_scratch.append(pltpu.VMEM((1, np_), jnp.float32))        # rowbuf

    def body(pi, carry):
        h, q = carry
        scal = jnp.stack([(pi * (nb // 2 if emb else nb)).astype(jnp.int32),
                          jnp.asarray(n, jnp.int32)])
        if emb:
            V, Z, T = pl.pallas_call(
                functools.partial(_hess_panelA_emb_kernel, np_=np_, nb=nb,
                                  slab_r=slab_r, chunk=chunk),
                out_shape=shapes_vzt,
                in_specs=[smem, hbm],
                out_specs=(vmem, vmem, vmem),
                scratch_shapes=a_scratch + sc_vec,
                interpret=interpret,
            )(scal, h)
        else:
            V, Z, T = pl.pallas_call(
                functools.partial(_hess_panelA_kernel, n_planes=n_planes,
                                  np_=np_, nb=nb, slab_r=slab_r,
                                  chunk=chunk),
                out_shape=shapes_vzt,
                in_specs=[smem, hbm],
                out_specs=(vmem, vmem, vmem),
                scratch_shapes=a_scratch + sc_vec,
                interpret=interpret,
            )(scal, h)
        h = pl.pallas_call(
            functools.partial(_hess_panelB_kernel, n_planes=n_planes,
                              np_=np_, nb=nb, slab_r=slab_r, chunk=chunk,
                              emb=emb),
            out_shape=jax.ShapeDtypeStruct(h.shape, jnp.float32),
            in_specs=[smem, vmem, vmem, vmem, hbm],
            out_specs=hbm,
            input_output_aliases={4: 0},
            scratch_shapes=[
                pltpu.VMEM((n_planes, nb, np_), jnp.float32),   # W
                pltpu.VMEM((n_planes, np_, nb), jnp.float32),   # Y
                pltpu.VMEM((2, n_planes, slab_r, np_), jnp.float32),
            ] + sc_vec,
            interpret=interpret,
        )(scal, V, Z, T, h)
        if accumulate_q:
            q = pl.pallas_call(
                functools.partial(_hess_panelC_kernel, n_planes=n_planes,
                                  np_=np_, nb=nb, slab_r=slab_r,
                                  chunk=chunk),
                out_shape=jax.ShapeDtypeStruct(q.shape, jnp.float32),
                in_specs=[smem, vmem, vmem, hbm],
                out_specs=hbm,
                input_output_aliases={3: 0},
                scratch_shapes=[
                    pltpu.VMEM((n_planes, np_, nb), jnp.float32),  # qv
                    pltpu.VMEM((2, n_planes, slab_r, np_), jnp.float32),
                ] + sc_vec,
                interpret=interpret,
            )(scal, V, T, q)
        return (h, q)

    if q0 is None:
        q0 = jnp.zeros((1, 1, 1), jnp.float32)   # unused carry slot
    h, q = jax.lax.fori_loop(0, n_panels, body, (p, q0))
    return h, q
