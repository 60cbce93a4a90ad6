"""Pallas TPU kernels for the dense QR eigenvalue stack.

TPU-resident replacements for the two hot phases of
``qr_eigenvalues`` (reference: /root/reference/src/qr_method/
qr_eigenvalues.hpp:40-108):

1. ``hessenberg_planes`` — the full Householder similarity reduction
   (to_hessenberg.hpp:23-80) as ONE kernel: a ``fori_loop`` over columns
   whose body is pure masked matvec / rank-1 MXU work (no dynamic
   slicing at all), in split re/im planes so complex matrices run on a
   backend with no complex dtypes.

2. ``qr_hessenberg_eig_planes`` — the ENTIRE accelerated eigenvalue
   iteration (Wilkinson-shifted Givens sweeps on the Hessenberg form +
   bottom deflation + active-window tracking) as ONE kernel launch: an
   outer ``lax.while_loop`` over sweeps with scalar (SMEM) carries, row
   rotations applied through aligned 16-row VMEM windows (Mosaic requires
   dynamic sublane stores at multiples of 8), and the right (column)
   rotations applied as row operations on the in-place transposed planes.

Why kernels and not plain XLA loops: the axon remote XLA compiler wedges
on jitted per-column/sweep loop nests at n >= ~40 (round-1 finding, see
solvers/hessenberg.py), while the Mosaic pipeline compiles these kernels
in ~1 s and runs sequential loop steps with sub-microsecond overhead.
This is also the SURVEY §7 step-5 design (Pallas Givens sweeps).

Precision: f32 planes (the TPU-native dtype). f64/c128 inputs stay on
the XLA/host path in ``solvers/qr_eigenvalues.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_WIN = 16          # aligned row window: holds rows k, k+1 for any k
_TINY = 1e-30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# kernel 1: Hessenberg reduction in split planes
# ---------------------------------------------------------------------------

def _hessenberg_kernel(scal_ref, in_ref, out_ref, q_ref=None, *,
                       n_planes: int, np_: int, accumulate_q: bool = False):
    """Householder Hessenberg reduction, matvec formulation.

    All index-dependent selection is mask arithmetic; each column does
    O(1) MXU matvecs / rank-1 updates on the full (np_, np_) planes.
    Matches to_hessenberg.hpp:38-77 semantics: tail-zero skip (:46-48),
    phase-correct sign (:51-57), degenerate-reflector skip (:62-64).
    """
    n = scal_ref[0]
    for p in range(n_planes):
        out_ref[p] = in_ref[p]
    if accumulate_q:
        eye = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
               ).astype(jnp.float32)
        q_ref[0] = eye
        if n_planes == 2:
            q_ref[1] = jnp.zeros((np_, np_), jnp.float32)

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)

    def body(k, _):
        Hr = out_ref[0]
        Hi = out_ref[1] if n_planes == 2 else None
        e_k = (col_idx == k).astype(jnp.float32)
        e_k1 = (col_idx == k + 1).astype(jnp.float32)

        colr = jnp.dot(Hr, e_k, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        coli = (jnp.dot(Hi, e_k, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                if n_planes == 2 else None)

        mask_tail = (col_idx >= k + 1).astype(jnp.float32)
        xr = colr * mask_tail
        xi = coli * mask_tail if n_planes == 2 else None
        nrm2 = jnp.sum(xr * xr) + (jnp.sum(xi * xi) if n_planes == 2 else 0.0)
        norm_x = jnp.sqrt(nrm2)

        mask_t2 = (col_idx >= k + 2).astype(jnp.float32)
        tail2 = jnp.sum(colr * colr * mask_t2) + (
            jnp.sum(coli * coli * mask_t2) if n_planes == 2 else 0.0)
        tail_zero = tail2 == 0.0

        x0r = jnp.sum(colr * e_k1)
        x0i = jnp.sum(coli * e_k1) if n_planes == 2 else zero
        m0 = jnp.sqrt(x0r * x0r + x0i * x0i)
        has0 = m0 > 0.0
        m0s = jnp.where(has0, m0, one)
        sgr = jnp.where(has0, x0r / m0s, one)
        sgi = jnp.where(has0, x0i / m0s, zero)
        alphar = -sgr * norm_x
        alphai = -sgi * norm_x

        vr = xr - alphar * e_k1
        vn2 = jnp.sum(vr * vr)
        if n_planes == 2:
            vi = xi - alphai * e_k1
            vn2 = vn2 + jnp.sum(vi * vi)
        degenerate = vn2 == 0.0
        vinv = jax.lax.rsqrt(jnp.where(degenerate, one, vn2))
        vr = vr * vinv
        if n_planes == 2:
            vi = vi * vinv

        lane_ge_k = (jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
                     >= k).astype(jnp.float32)
        # Skip columns that are already reduced (tail_zero) or whose
        # reflector degenerates — as a multiplicative factor on the rank-1
        # updates instead of a full-matrix select, so the originals need
        # not stay live (VMEM pressure at n=512 complex).
        factor = jnp.where(jnp.logical_or(tail_zero, degenerate), zero,
                           2.0 * one)
        # w = v^H H restricted to cols >= k (to_hessenberg.hpp:69-71)
        if n_planes == 2:
            wr = (jnp.dot(vr.T, Hr, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                  + jnp.dot(vi.T, Hi, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))
            wi = (jnp.dot(vr.T, Hi, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                  - jnp.dot(vi.T, Hr, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))
            wr = wr * lane_ge_k
            wi = wi * lane_ge_k
            out_ref[0] = Hr - factor * (
                jnp.dot(vr, wr, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                - jnp.dot(vi, wi, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))
            out_ref[1] = Hi - factor * (
                jnp.dot(vr, wi, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                + jnp.dot(vi, wr, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))
            Hr1 = out_ref[0]
            Hi1 = out_ref[1]
            # u = H v ; H -= 2 u v^H (to_hessenberg.hpp:74-76)
            ur = (jnp.dot(Hr1, vr, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                  - jnp.dot(Hi1, vi, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))
            ui = (jnp.dot(Hr1, vi, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                  + jnp.dot(Hi1, vr, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))
            out_ref[0] = Hr1 - factor * (
                jnp.dot(ur, vr.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                + jnp.dot(ui, vi.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))
            out_ref[1] = Hi1 - factor * (
                jnp.dot(ui, vr.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                - jnp.dot(ur, vi.T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))
        else:
            wr = jnp.dot(vr.T, Hr, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) * lane_ge_k
            out_ref[0] = Hr - factor * jnp.dot(
                vr, wr, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            Hr1 = out_ref[0]
            ur = jnp.dot(Hr1, vr, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            out_ref[0] = Hr1 - factor * jnp.dot(
                ur, vr.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        if accumulate_q:
            # Q <- Q (I - factor v v^H): the accumulated similarity with
            # A = Q H Q^H
            if n_planes == 2:
                uqr = (jnp.dot(q_ref[0], vr, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                       - jnp.dot(q_ref[1], vi, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST))
                uqi = (jnp.dot(q_ref[0], vi, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                       + jnp.dot(q_ref[1], vr, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST))
                q_ref[0] = q_ref[0] - factor * jnp.dot(
                    uqr, vr.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                q_ref[0] = q_ref[0] - factor * jnp.dot(
                    uqi, vi.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                q_ref[1] = q_ref[1] - factor * jnp.dot(
                    uqi, vr.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                q_ref[1] = q_ref[1] + factor * jnp.dot(
                    uqr, vi.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                uq = jnp.dot(q_ref[0], vr, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                q_ref[0] = q_ref[0] - factor * jnp.dot(
                    uq, vr.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return _

    jax.lax.fori_loop(0, jnp.maximum(n - 2, 0), body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "accumulate_q"))
def hessenberg_planes(planes: jax.Array, n: jax.Array, *,
                      interpret: bool = False, accumulate_q: bool = False):
    """Hessenberg-reduce split planes.

    ``planes``: (n_planes, m, m) f32, n_planes 1 (real) or 2 (re/im);
    the live matrix occupies the top-left (n, n) block (n traced, n <= m,
    rest must be zero). Returns planes of the same shape — or
    ``(h_planes, q_planes)`` with ``A = Q H Q^H`` when ``accumulate_q``.
    """
    n_planes, m, _ = planes.shape
    np_ = max(_round_up(m, LANES), LANES)
    p = jnp.pad(planes.astype(jnp.float32),
                ((0, 0), (0, np_ - m), (0, np_ - m)))
    if accumulate_q:
        out, q = pl.pallas_call(
            functools.partial(_hessenberg_kernel, n_planes=n_planes,
                              np_=np_, accumulate_q=True),
            out_shape=(jax.ShapeDtypeStruct((n_planes, np_, np_), jnp.float32),
                       jax.ShapeDtypeStruct((n_planes, np_, np_), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            input_output_aliases={1: 0},
            interpret=interpret,
        )(jnp.asarray(n, jnp.int32).reshape(1), p)
        return out[:, :m, :m], q[:, :m, :m]
    out = pl.pallas_call(
        functools.partial(_hessenberg_kernel, n_planes=n_planes, np_=np_),
        out_shape=jax.ShapeDtypeStruct((n_planes, np_, np_), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.asarray(n, jnp.int32).reshape(1), p)
    return out[:, :m, :m]


# ---------------------------------------------------------------------------
# kernel 2: the whole accelerated QR eigenvalue iteration
# ---------------------------------------------------------------------------

def _rot_rows(Wr, Wi, mk, mk1, g00r, g00i, g01r, g01i, conj_mode: bool):
    """Apply one 2x2 complex rotation to the two masked rows of a window.

    conj_mode False (left pass, _givens_sweep left_body):
        rk'  =  g00 rk + g01 rk1 ;  rk1' = -conj(g01) rk + conj(g00) rk1
    conj_mode True (right pass on the transpose, right_body):
        tk'  =  conj(g00) tk + conj(g01) tk1 ;  tk1' = -g01 tk + g00 tk1
    """
    rkr = jnp.sum(Wr * mk, axis=0, keepdims=True)
    rki = jnp.sum(Wi * mk, axis=0, keepdims=True)
    rk1r = jnp.sum(Wr * mk1, axis=0, keepdims=True)
    rk1i = jnp.sum(Wi * mk1, axis=0, keepdims=True)
    if conj_mode:
        a_r, a_i, b_r, b_i = g00r, -g00i, g01r, -g01i
        c_r, c_i, d_r, d_i = -g01r, -g01i, g00r, g00i
    else:
        a_r, a_i, b_r, b_i = g00r, g00i, g01r, g01i
        c_r, c_i, d_r, d_i = -g01r, g01i, g00r, -g00i
    nkr = a_r * rkr - a_i * rki + b_r * rk1r - b_i * rk1i
    nki = a_r * rki + a_i * rkr + b_r * rk1i + b_i * rk1r
    nk1r = c_r * rkr - c_i * rki + d_r * rk1r - d_i * rk1i
    nk1i = c_r * rki + c_i * rkr + d_r * rk1i + d_i * rk1r
    Wr = Wr + mk * (nkr - rkr) + mk1 * (nk1r - rk1r)
    Wi = Wi + mk * (nki - rki) + mk1 * (nk1i - rk1i)
    return Wr, Wi


def _qr_eig_kernel(scal_i_ref, scal_f_ref, in_ref, h_ref, out_ref,
                   q_ref=None, *, np_: int, accumulate_q: bool = False):
    """Wilkinson-shifted Givens QR with deflation, whole solve in-kernel."""
    n = scal_i_ref[0]
    max_sweeps = scal_i_ref[1]
    tol = scal_f_ref[0]

    h_ref[0] = in_ref[0]
    h_ref[1] = in_ref[1]

    sub16 = jax.lax.broadcasted_iota(jnp.int32, (_WIN, np_), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, np_), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, np_), 0)
    row_sq = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    col_sq = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eye_m = (row_sq == col_sq).astype(jnp.float32)
    sub_m = (row_sq == col_sq + 1).astype(jnp.float32)   # picks H[c+1, c]
    sup_m = (row_sq + 1 == col_sq).astype(jnp.float32)   # picks H[c-1, c]
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    if accumulate_q:
        # Q^T lives in q_ref across sweeps (Q only ever takes RIGHT
        # rotation factors, which are row operations in transpose space);
        # transposed back to Q after the loop.
        q_ref[0, pl.ds(0, np_), :] = eye_m
        q_ref[1, pl.ds(0, np_), :] = jnp.zeros((np_, np_), jnp.float32)
        # The right-pass 16-row windows read-modify-write rows >= np_
        # whenever a rotation index lands within _WIN of np_; those rows
        # must be zero (not uninitialized VMEM: 0 * NaN = NaN would poison
        # the masked sums nondeterministically on hardware).
        q_ref[0, pl.ds(np_, _WIN), :] = jnp.zeros((_WIN, np_), jnp.float32)
        q_ref[1, pl.ds(np_, _WIN), :] = jnp.zeros((_WIN, np_), jnp.float32)

    def diag_sub():
        Hr = h_ref[0, pl.ds(0, np_), :]
        Hi = h_ref[1, pl.ds(0, np_), :]
        dr = jnp.sum(Hr * eye_m, axis=0, keepdims=True)
        di = jnp.sum(Hi * eye_m, axis=0, keepdims=True)
        sr = jnp.sum(Hr * sub_m, axis=0, keepdims=True)
        si = jnp.sum(Hi * sub_m, axis=0, keepdims=True)
        return dr, di, sr, si

    def lane_scalar(vec, j):
        return jnp.sum(vec * (lane1 == j).astype(jnp.float32))

    def deflate_and_lo(dr, di, sr, si, hi):
        smag = jnp.sqrt(sr * sr + si * si)
        dmag = jnp.sqrt(dr * dr + di * di)
        dmag_next = pltpu.roll(dmag, np_ - 1, 1)  # entry c -> dmag[c+1]
        scale = jnp.maximum(dmag + dmag_next, one)
        neg = smag <= tol * scale
        lanes = lane1
        cand = jnp.where(jnp.logical_and(lanes < hi - 1,
                                         jnp.logical_not(neg)), lanes, -1)
        new_hi = jnp.max(cand).astype(jnp.int32) + 2
        cand2 = jnp.where(jnp.logical_and(lanes < new_hi - 1, neg), lanes, -1)
        lo = jnp.max(cand2).astype(jnp.int32) + 1
        return new_hi, lo

    def cond(c):
        hi, lo, sweeps = c
        return jnp.logical_and(hi > 1, sweeps < max_sweeps)

    def body(c):
        hi, lo, sweeps = c
        dr, di, sr, si = diag_sub()
        Hi_full = h_ref[1, pl.ds(0, np_), :]
        supi_r = jnp.sum(h_ref[0, pl.ds(0, np_), :] * sup_m, axis=0, keepdims=True)
        supi_i = jnp.sum(Hi_full * sup_m, axis=0, keepdims=True)

        # Wilkinson shift from the trailing active 2x2 (qr_eigenvalues.py
        # _wilkinson_shift semantics, in plane arithmetic)
        a_r, a_i = lane_scalar(dr, hi - 2), lane_scalar(di, hi - 2)
        d_r, d_i = lane_scalar(dr, hi - 1), lane_scalar(di, hi - 1)
        b_r, b_i = lane_scalar(supi_r, hi - 1), lane_scalar(supi_i, hi - 1)
        c_r, c_i = lane_scalar(sr, hi - 2), lane_scalar(si, hi - 2)
        delr, deli = (a_r - d_r) * 0.5, (a_i - d_i) * 0.5
        # z = delta^2 + b*c
        zr = delr * delr - deli * deli + b_r * c_r - b_i * c_i
        zi = 2.0 * delr * deli + b_r * c_i + b_i * c_r
        # complex sqrt of z
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

        win_eye = eye_m * jnp.logical_and(row_sq >= lo,
                                          row_sq < hi).astype(jnp.float32)
        h_ref[0, pl.ds(0, np_), :] = h_ref[0, pl.ds(0, np_), :] - mur * win_eye
        h_ref[1, pl.ds(0, np_), :] = h_ref[1, pl.ds(0, np_), :] - mui * win_eye

        # ---- left pass: R = (G_{hi-2} ... G_lo)(H - mu I) -----------------
        def left_body(k, cs):
            base = pl.multiple_of((k // 8) * 8, 8)
            off = k - base
            Wr = h_ref[0, pl.ds(base, _WIN), :]
            Wi = h_ref[1, pl.ds(base, _WIN), :]
            mk = (sub16 == off).astype(jnp.float32)
            mk1 = (sub16 == off + 1).astype(jnp.float32)
            rkr = jnp.sum(Wr * mk, axis=0, keepdims=True)
            rki = jnp.sum(Wi * mk, axis=0, keepdims=True)
            rk1r = jnp.sum(Wr * mk1, axis=0, keepdims=True)
            rk1i = jnp.sum(Wi * mk1, axis=0, keepdims=True)
            ohk = (lane1 == k).astype(jnp.float32)
            ar = jnp.sum(rkr * ohk)
            ai = jnp.sum(rki * ohk)
            br = jnp.sum(rk1r * ohk)
            bi = jnp.sum(rk1i * ohk)
            r2 = ar * ar + ai * ai + br * br + bi * bi
            iszero = r2 == 0.0
            rinv = jax.lax.rsqrt(jnp.where(iszero, one, r2))
            g00r = jnp.where(iszero, one, ar * rinv)
            g00i = jnp.where(iszero, zero, -ai * rinv)
            g01r = jnp.where(iszero, zero, br * rinv)
            g01i = jnp.where(iszero, zero, -bi * rinv)
            Wr2, Wi2 = _rot_rows(Wr, Wi, mk, mk1,
                                 g00r, g00i, g01r, g01i, False)
            h_ref[0, pl.ds(base, _WIN), :] = Wr2
            h_ref[1, pl.ds(base, _WIN), :] = Wi2
            val = (g00r * (row8 == 0) + g00i * (row8 == 1)
                   + g01r * (row8 == 2) + g01i * (row8 == 3)).astype(jnp.float32)
            return jnp.where(lane8 == k, val, cs)

        cs = jax.lax.fori_loop(lo, hi - 1, left_body,
                               jnp.zeros((8, np_), jnp.float32))

        # ---- right pass: H := R Q, as row ops on the transpose ------------
        h_ref[0, pl.ds(0, np_), :] = h_ref[0, pl.ds(0, np_), :].T
        h_ref[1, pl.ds(0, np_), :] = h_ref[1, pl.ds(0, np_), :].T

        def right_body(k, carry):
            ohk8 = (lane8 == k).astype(jnp.float32)
            g00r = jnp.sum(cs * ohk8 * (row8 == 0))
            g00i = jnp.sum(cs * ohk8 * (row8 == 1))
            g01r = jnp.sum(cs * ohk8 * (row8 == 2))
            g01i = jnp.sum(cs * ohk8 * (row8 == 3))
            base = pl.multiple_of((k // 8) * 8, 8)
            off = k - base
            Wr = h_ref[0, pl.ds(base, _WIN), :]
            Wi = h_ref[1, pl.ds(base, _WIN), :]
            mk = (sub16 == off).astype(jnp.float32)
            mk1 = (sub16 == off + 1).astype(jnp.float32)
            Wr2, Wi2 = _rot_rows(Wr, Wi, mk, mk1,
                                 g00r, g00i, g01r, g01i, True)
            h_ref[0, pl.ds(base, _WIN), :] = Wr2
            h_ref[1, pl.ds(base, _WIN), :] = Wi2
            if accumulate_q:
                Qr = q_ref[0, pl.ds(base, _WIN), :]
                Qi = q_ref[1, pl.ds(base, _WIN), :]
                Qr2, Qi2 = _rot_rows(Qr, Qi, mk, mk1,
                                     g00r, g00i, g01r, g01i, True)
                q_ref[0, pl.ds(base, _WIN), :] = Qr2
                q_ref[1, pl.ds(base, _WIN), :] = Qi2
            return carry

        jax.lax.fori_loop(lo, hi - 1, right_body, 0)

        h_ref[0, pl.ds(0, np_), :] = h_ref[0, pl.ds(0, np_), :].T + mur * win_eye
        h_ref[1, pl.ds(0, np_), :] = h_ref[1, pl.ds(0, np_), :].T + mui * win_eye

        dr, di, sr, si = diag_sub()
        new_hi, new_lo = deflate_and_lo(dr, di, sr, si, hi)
        return new_hi, new_lo, sweeps + 1

    dr, di, sr, si = diag_sub()
    hi0, lo0 = deflate_and_lo(dr, di, sr, si, n)
    hi, lo, sweeps = jax.lax.while_loop(
        cond, body, (hi0, lo0, jnp.zeros((), jnp.int32)))
    out_ref[0] = sweeps
    out_ref[1] = hi
    if accumulate_q:
        q_ref[0, pl.ds(0, np_), :] = q_ref[0, pl.ds(0, np_), :].T
        q_ref[1, pl.ds(0, np_), :] = q_ref[1, pl.ds(0, np_), :].T


@functools.partial(jax.jit, static_argnames=("interpret", "accumulate_q"))
def qr_hessenberg_eig_planes(planes: jax.Array, n: jax.Array,
                             max_sweeps: jax.Array, tol: jax.Array, *,
                             interpret: bool = False,
                             accumulate_q: bool = False):
    """All eigenvalues of an upper-Hessenberg matrix held in split planes.

    ``planes``: (2, m, m) f32 (real input -> zero imaginary plane), live
    in the top-left (n, n). Returns ``(eig_planes (2, m), sweeps, hi)``
    where ``hi <= 1`` means converged (same contract as
    ``_qr_eigenvalues_accel``; deflation rule: |H[i,i-1]| <=
    tol * max(|H[i-1,i-1]| + |H[i,i]|, 1)).
    """
    _, m, _ = planes.shape
    np_ = max(_round_up(m, LANES), LANES)
    nr = np_ + _WIN
    p = jnp.pad(planes.astype(jnp.float32),
                ((0, 0), (0, nr - m), (0, np_ - m)))
    out_shape = [jax.ShapeDtypeStruct((2, nr, np_), jnp.float32),
                 jax.ShapeDtypeStruct((2,), jnp.int32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
    if accumulate_q:
        out_shape.append(jax.ShapeDtypeStruct((2, nr, np_), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_qr_eig_kernel, np_=np_, accumulate_q=accumulate_q),
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.stack([jnp.asarray(n, jnp.int32),
                 jnp.asarray(max_sweeps, jnp.int32)]),
      jnp.asarray(tol, jnp.float32).reshape(1), p)
    h_out, scal = outs[0], outs[1]
    eig = jnp.stack([jnp.diagonal(h_out[0, :m, :m]),
                     jnp.diagonal(h_out[1, :m, :m])])
    if accumulate_q:
        return eig, scal[0], scal[1], h_out[:, :m, :m], outs[2][:, :m, :m]
    return eig, scal[0], scal[1]


# ---------------------------------------------------------------------------
# high-level helpers used by solvers/qr_eigenvalues.py
# ---------------------------------------------------------------------------

def plane_matmul(A: jax.Array, B: jax.Array) -> jax.Array:
    """Split-plane complex matmul (2, m, k) @ (2, k, n) on device."""
    HI = jax.lax.Precision.HIGHEST

    def d(x, y):
        return jnp.dot(x, y, precision=HI,
                       preferred_element_type=jnp.float32)

    return jnp.stack([d(A[0], B[0]) - d(A[1], B[1]),
                      d(A[0], B[1]) + d(A[1], B[0])])


def finish_eigenvectors_device(t_planes: jax.Array, q_planes: jax.Array,
                               n: int, *, interpret: bool = False):
    """Device-resident eigenvector finishing for the compute_vectors
    paths (VERDICT r3 task 3): Y from the Pallas blocked triangular
    back-substitution, V = Q Y composed and column-normalized on device.
    Only the final V transfers to host. Returns complex64 (n, n)."""
    from .trisolve_vec import triangular_eigenvectors_planes
    scale = jnp.maximum(jnp.sqrt(jnp.max(t_planes[0] * t_planes[0]
                                         + t_planes[1] * t_planes[1])),
                        1.0)
    eps = jnp.float32(np.finfo(np.float32).eps) * scale
    Y = triangular_eigenvectors_planes(t_planes, n, eps,
                                       interpret=interpret)
    V = plane_matmul(q_planes, Y)
    n2 = jnp.sum(V * V, axis=(0, 1))
    V = V / jnp.maximum(jnp.sqrt(n2), 1e-30)[None, None, :]
    v = np.asarray(jax.device_get(V))
    return (v[0] + 1j * v[1])[:n, :n].astype(np.complex64)


def split_planes_f32(a) -> jax.Array:
    """(n, n) real/complex array -> (1 | 2, n, n) f32 split planes.

    A device-resident REAL jax array is cast and stacked ON DEVICE — no
    host round-trip (VERDICT r3 task 10: the public QR entries used to
    ``np.asarray`` every input, pulling device matrices to host and
    re-uploading per call). Complex inputs go through the host: the
    accelerator backend has no complex dtypes, so a complex array is
    host/CPU-resident by construction and must be split before upload.
    """
    if isinstance(a, jax.Array) and a.dtype.kind != "c":
        return a.astype(jnp.float32)[None]
    a_np = np.asarray(a)
    if np.iscomplexobj(a_np):
        return jnp.asarray(np.stack([a_np.real, a_np.imag])
                           .astype(np.float32))
    return jnp.asarray(a_np.astype(np.float32))[None]


def qr_eigenvalues_pallas(a: np.ndarray, max_sweeps: int, tol: float, *,
                          interpret: bool = False,
                          compute_vectors: bool = False):
    """Accelerated QR eigenvalues of a dense (real or complex) matrix,
    entirely on-device: Pallas Hessenberg + Pallas shifted-Givens QR.

    Returns ``(eigenvalues complex64 np.ndarray, sweeps int, converged
    bool)`` — plus an ``(n, n)`` complex64 eigenvector matrix (column i
    pairs with ``eigenvalues[i]``) when ``compute_vectors``: both kernels
    accumulate the unitary similarity (Schur ``A = Q T Q^H``) and the
    triangular eigenvectors come from host back-substitution.
    Input may be any square np/jnp array; computation is f32. A
    device-resident real jax array is consumed without a host round-trip
    (split_planes_f32).
    """
    n = a.shape[0]
    # real inputs reduce in ONE plane (half the VMEM and flops);
    # widened to the 2-plane eigenvalue kernel afterwards
    planes = split_planes_f32(a)
    if not compute_vectors:
        h = hessenberg_planes(planes, n, interpret=interpret)
        if h.shape[0] == 1:
            h = jnp.concatenate([h, jnp.zeros_like(h)])
        eig, sweeps, hi = qr_hessenberg_eig_planes(
            h, n, max_sweeps, tol, interpret=interpret)
        e = np.asarray(jax.device_get(eig))
        return ((e[0] + 1j * e[1])[:n].astype(np.complex64),
                int(sweeps), bool(int(hi) <= 1))
    h, qh = hessenberg_planes(planes, n, interpret=interpret,
                              accumulate_q=True)
    if h.shape[0] == 1:  # real input: widen to the 2-plane eig kernel
        h = jnp.concatenate([h, jnp.zeros_like(h)])
        qh = jnp.concatenate([qh, jnp.zeros_like(qh)])
    eig, sweeps, hi, t_pl, qs = qr_hessenberg_eig_planes(
        h, n, max_sweeps, tol, interpret=interpret, accumulate_q=True)
    e = np.asarray(jax.device_get(eig))
    eigs = (e[0] + 1j * e[1])[:n].astype(np.complex64)
    # device-resident finishing: Q_hess @ Q_sweeps, blocked triangular
    # back-substitution, and column normalization all on the accelerator
    # (VERDICT r3 task 3); only the final V transfers to host
    V = finish_eigenvectors_device(t_pl, plane_matmul(qh, qs), n,
                                   interpret=interpret)
    return eigs, int(sweeps), bool(int(hi) <= 1), V


def triangular_eigenvectors(T: np.ndarray,
                            source_real_dtype=np.float32) -> np.ndarray:
    """Eigenvectors of an upper-triangular matrix by back-substitution.

    Column k solves ``(T - T[k,k] I) y = 0`` with ``y[k] = 1`` and zeros
    below; tiny pivots are perturbed to epsilon scale of the precision the
    Schur form was COMPUTED in (``source_real_dtype`` — f32 for the Pallas
    kernels, f64 for the x64 XLA path), the standard LAPACK trick for
    repeated eigenvalues. T itself always arrives as complex128.
    """
    n = T.shape[0]
    V = np.zeros((n, n), np.complex128)
    diag = np.diagonal(T)
    scale = max(np.abs(T).max(), 1.0)
    eps = np.finfo(np.dtype(source_real_dtype)).eps * scale
    for k in range(n):
        lam = diag[k]
        y = np.zeros(n, np.complex128)
        y[k] = 1.0
        for i in range(k - 1, -1, -1):
            denom = diag[i] - lam
            if abs(denom) < eps:
                denom = eps
            y[i] = -(T[i, i + 1:k + 1] @ y[i + 1:k + 1]) / denom
        V[:, k] = y
    return V


# ---------------------------------------------------------------------------
# kernel 3: Householder QR decompose + the reference parity iteration
# ---------------------------------------------------------------------------

def _hh_qr_step(rq_ref, k, np_: int, n_planes: int):
    """One Householder column step of A = QR on the plane stack
    ``rq_ref``: planes [0..n_planes) hold R, planes [n_planes..2*n_planes)
    hold Q. Mirrors qr_decompose.hpp:51-84 semantics (tail-zero and
    degenerate skips, phase-correct sign)."""
    two = n_planes == 2
    HI = jax.lax.Precision.HIGHEST
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)

    e_k = (col_idx == k).astype(jnp.float32)
    colr = jnp.dot(rq_ref[0], e_k, preferred_element_type=jnp.float32,
                   precision=HI)
    coli = (jnp.dot(rq_ref[1], e_k, preferred_element_type=jnp.float32,
                    precision=HI) if two else None)

    mask_ge_k = (col_idx >= k).astype(jnp.float32)
    xr = colr * mask_ge_k
    xi = coli * mask_ge_k if two else None
    nrm2 = jnp.sum(xr * xr) + (jnp.sum(xi * xi) if two else 0.0)
    norm_x = jnp.sqrt(nrm2)

    mask_t = (col_idx >= k + 1).astype(jnp.float32)
    tail2 = jnp.sum(colr * colr * mask_t) + (
        jnp.sum(coli * coli * mask_t) if two else 0.0)
    tail_zero = tail2 == 0.0

    x0r = jnp.sum(colr * e_k)
    x0i = jnp.sum(coli * e_k) if two else zero
    m0 = jnp.sqrt(x0r * x0r + x0i * x0i)
    has0 = m0 > 0.0
    m0s = jnp.where(has0, m0, one)
    sgr = jnp.where(has0, x0r / m0s, one)
    sgi = jnp.where(has0, x0i / m0s, zero)
    alphar = -sgr * norm_x
    alphai = -sgi * norm_x

    vr = xr - alphar * e_k
    vn2 = jnp.sum(vr * vr)
    if two:
        vi = xi - alphai * e_k
        vn2 = vn2 + jnp.sum(vi * vi)
    degenerate = vn2 == 0.0
    vinv = jax.lax.rsqrt(jnp.where(degenerate, one, vn2))
    vr = vr * vinv
    if two:
        vi = vi * vinv

    factor = jnp.where(jnp.logical_or(tail_zero, degenerate), zero, 2.0 * one)
    lane_ge_k = (jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
                 >= k).astype(jnp.float32)

    if two:
        # R -= 2 v (v^H R), cols >= k (qr_decompose.hpp:77-79). Every
        # update is staged as a separate read-modify-write through the ref
        # so at most ~2 full matrices are live at once (VMEM budget).
        wr = (jnp.dot(vr.T, rq_ref[0], preferred_element_type=jnp.float32,
                      precision=HI)
              + jnp.dot(vi.T, rq_ref[1], preferred_element_type=jnp.float32,
                        precision=HI))
        wi = (jnp.dot(vr.T, rq_ref[1], preferred_element_type=jnp.float32,
                      precision=HI)
              - jnp.dot(vi.T, rq_ref[0], preferred_element_type=jnp.float32,
                        precision=HI))
        wr = wr * lane_ge_k
        wi = wi * lane_ge_k
        rq_ref[0] = rq_ref[0] - factor * jnp.dot(
            vr, wr, preferred_element_type=jnp.float32, precision=HI)
        rq_ref[0] = rq_ref[0] + factor * jnp.dot(
            vi, wi, preferred_element_type=jnp.float32, precision=HI)
        rq_ref[1] = rq_ref[1] - factor * jnp.dot(
            vr, wi, preferred_element_type=jnp.float32, precision=HI)
        rq_ref[1] = rq_ref[1] - factor * jnp.dot(
            vi, wr, preferred_element_type=jnp.float32, precision=HI)
        # Q -= 2 (Q v) v^H (qr_decompose.hpp:82-84)
        ur = (jnp.dot(rq_ref[2], vr, preferred_element_type=jnp.float32,
                      precision=HI)
              - jnp.dot(rq_ref[3], vi, preferred_element_type=jnp.float32,
                        precision=HI))
        ui = (jnp.dot(rq_ref[2], vi, preferred_element_type=jnp.float32,
                      precision=HI)
              + jnp.dot(rq_ref[3], vr, preferred_element_type=jnp.float32,
                        precision=HI))
        rq_ref[2] = rq_ref[2] - factor * jnp.dot(
            ur, vr.T, preferred_element_type=jnp.float32, precision=HI)
        rq_ref[2] = rq_ref[2] - factor * jnp.dot(
            ui, vi.T, preferred_element_type=jnp.float32, precision=HI)
        rq_ref[3] = rq_ref[3] - factor * jnp.dot(
            ui, vr.T, preferred_element_type=jnp.float32, precision=HI)
        rq_ref[3] = rq_ref[3] + factor * jnp.dot(
            ur, vi.T, preferred_element_type=jnp.float32, precision=HI)
    else:
        wr = jnp.dot(vr.T, rq_ref[0], preferred_element_type=jnp.float32,
                     precision=HI) * lane_ge_k
        rq_ref[0] = rq_ref[0] - factor * jnp.dot(
            vr, wr, preferred_element_type=jnp.float32, precision=HI)
        ur = jnp.dot(rq_ref[1], vr, preferred_element_type=jnp.float32,
                     precision=HI)
        rq_ref[1] = rq_ref[1] - factor * jnp.dot(
            ur, vr.T, preferred_element_type=jnp.float32, precision=HI)


def _qr_decompose_kernel(scal_ref, in_ref, rq_ref, *, n_planes: int,
                         np_: int):
    """Single QR decomposition: rq planes <- (R..., Q...)."""
    kmax = scal_ref[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
           ).astype(jnp.float32)
    for p in range(n_planes):
        rq_ref[p] = in_ref[p]
    rq_ref[n_planes] = eye
    if n_planes == 2:
        rq_ref[3] = jnp.zeros((np_, np_), jnp.float32)

    def body(k, carry):
        _hh_qr_step(rq_ref, k, np_, n_planes)
        return carry

    jax.lax.fori_loop(0, kmax, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def qr_decompose_planes(planes: jax.Array, kmax: jax.Array, *,
                        interpret: bool = False):
    """Householder QR of square split planes: returns (R_planes, Q_planes),
    each (n_planes, m, m) f32. ``kmax`` = number of columns to eliminate
    (min(m_true, n_true) of the live region)."""
    n_planes, m, _ = planes.shape
    np_ = max(_round_up(m, LANES), LANES)
    p = jnp.pad(planes.astype(jnp.float32),
                ((0, 0), (0, np_ - m), (0, np_ - m)))
    rq = pl.pallas_call(
        functools.partial(_qr_decompose_kernel, n_planes=n_planes, np_=np_),
        out_shape=jax.ShapeDtypeStruct((2 * n_planes, np_, np_), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(kmax, jnp.int32).reshape(1), p)
    return rq[:n_planes, :m, :m], rq[n_planes:, :m, :m]


def _qr_parity_kernel(scal_i_ref, scal_f_ref, in_ref, h_ref, out_ref,
                      rq_ref, *, np_: int, n_planes: int):
    """The reference parity iteration (qr_eigenvalues.hpp:69-94) on
    device: full Householder QR of H each sweep, H := R Q, stop when
    max |H(i,i-1)| <= tol * (1 + ||H||_F). Complex split planes."""
    n = scal_i_ref[0]
    max_it = scal_i_ref[1]
    tol = scal_f_ref[0]
    HI = jax.lax.Precision.HIGHEST

    for pp in range(n_planes):
        h_ref[pp] = in_ref[pp]

    row_sq = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    col_sq = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eye = (row_sq == col_sq).astype(jnp.float32)
    sub_m = (row_sq == col_sq + 1).astype(jnp.float32)

    def cond(c):
        it, converged, maxsub = c
        return jnp.logical_and(it < max_it, jnp.logical_not(converged))

    def body(c):
        it, converged, _ = c
        for pp in range(n_planes):
            rq_ref[pp] = h_ref[pp]
        rq_ref[n_planes] = eye
        if n_planes == 2:
            rq_ref[3] = jnp.zeros((np_, np_), jnp.float32)

        def dstep(k, carry):
            _hh_qr_step(rq_ref, k, np_, n_planes)
            return carry

        jax.lax.fori_loop(0, n, dstep, 0)

        # H := R Q (qr_eigenvalues.hpp:74), staged per product
        if n_planes == 2:
            h_ref[0] = jnp.dot(rq_ref[0], rq_ref[2],
                               preferred_element_type=jnp.float32, precision=HI)
            h_ref[0] = h_ref[0] - jnp.dot(rq_ref[1], rq_ref[3],
                                          preferred_element_type=jnp.float32,
                                          precision=HI)
            h_ref[1] = jnp.dot(rq_ref[0], rq_ref[3],
                               preferred_element_type=jnp.float32, precision=HI)
            h_ref[1] = h_ref[1] + jnp.dot(rq_ref[1], rq_ref[2],
                                          preferred_element_type=jnp.float32,
                                          precision=HI)
            mag2 = h_ref[0] * h_ref[0] + h_ref[1] * h_ref[1]
        else:
            h_ref[0] = jnp.dot(rq_ref[0], rq_ref[1],
                               preferred_element_type=jnp.float32, precision=HI)
            mag2 = h_ref[0] * h_ref[0]
        maxsub = jnp.sqrt(jnp.max(mag2 * sub_m))
        fro = jnp.sqrt(jnp.sum(mag2))
        conv = maxsub <= tol * (1.0 + fro)
        return it + 1, conv, maxsub

    it, converged, maxsub = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.asarray(False),
                     jnp.zeros((), jnp.float32)))
    out_ref[0] = it.astype(jnp.float32)
    out_ref[1] = converged.astype(jnp.float32)
    out_ref[2] = maxsub


@functools.partial(jax.jit, static_argnames=("interpret",))
def qr_parity_planes(planes: jax.Array, n: jax.Array, max_it: jax.Array,
                     tol: jax.Array, *, interpret: bool = False):
    """Reference-parity unshifted QR iteration on Hessenberg split planes.

    Returns ``(h_planes, it, converged, last_maxsub)``; the caller applies
    the reference's iteration-count quirk (iterations = it when converged
    else max_iterations + 1, qr_eigenvalues.hpp:69,104).
    """
    n_planes, m, _ = planes.shape
    np_ = max(_round_up(m, LANES), LANES)
    p = jnp.pad(planes.astype(jnp.float32),
                ((0, 0), (0, np_ - m), (0, np_ - m)))
    h_out, scal = pl.pallas_call(
        functools.partial(_qr_parity_kernel, np_=np_, n_planes=n_planes),
        out_shape=(jax.ShapeDtypeStruct((n_planes, np_, np_), jnp.float32),
                   jax.ShapeDtypeStruct((3,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((2 * n_planes, np_, np_), jnp.float32)],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(jnp.stack([jnp.asarray(n, jnp.int32),
                 jnp.asarray(max_it, jnp.int32)]),
      jnp.asarray(tol, jnp.float32).reshape(1), p)
    return (h_out[:, :m, :m], scal[0].astype(jnp.int32),
            scal[1] > 0.5, scal[2])


def qr_parity_pallas(a: np.ndarray, max_iterations: int, tol: float, *,
                     interpret: bool = False):
    """Reference-parity QR eigenvalues fully on-device: Pallas Hessenberg
    + Pallas unshifted full-Householder sweeps. Returns (eigenvalues
    complex64, iterations, converged, last_maxsub) with the reference's
    iteration-count semantics."""
    n = a.shape[0]
    planes = split_planes_f32(a)   # real path: 1 plane, device-resident
    h = hessenberg_planes(planes, n, interpret=interpret)
    h2, it, conv, maxsub = qr_parity_planes(h, n, max_iterations, tol,
                                            interpret=interpret)
    e = np.asarray(jax.device_get(h2))
    ei = np.diagonal(e[1]) if e.shape[0] == 2 else 0.0
    eigs = (np.diagonal(e[0]) + 1j * ei)[:n].astype(np.complex64)
    it = int(it)
    conv = bool(conv)
    iterations = it if conv else max_iterations + 1
    return eigs, iterations, conv, float(maxsub)
