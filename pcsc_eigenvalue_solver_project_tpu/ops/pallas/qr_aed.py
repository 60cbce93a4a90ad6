"""Aggressive early deflation (AED) for the HBM-blocked QR iteration.

The blocked Wilkinson-shifted sweep kernel (``qr_eig_blocked.py``)
deflates one eigenvalue every ~2 sweeps from the bottom of the active
window — ~2n sweeps for a generic spectrum (measured ~4.6K sweeps /
~11 s at n = 2048, docs/PERF_NOTES.md). This module adds the
LAPACK-style AED round (Braman/Byers/Mathias) between batches of
sweeps, which deflates eigenvalues in BULK:

1. Slice the trailing ``w x w`` deflation window ``W = H[s:hi, s:hi]``
   (``s = hi - w``) and compute its Schur form ``W = V T V^H`` entirely
   in VMEM with the existing windowed kernel
   (``qr_kernels.qr_hessenberg_eig_planes`` with ``accumulate_q``).
2. The similarity ``diag(I, V)`` turns the window's Hessenberg edge
   ``beta = H[s, s-1]`` into the **spike** column
   ``u = beta * conj(V[0, :])``. Every trailing eigenvalue whose spike
   entry is negligible (``|u_j| <= tol * max(|T_jj|, 1)``) deflates
   immediately — no sweeps spent converging it.
3. The ``kk`` undeflatable window rows are returned to Hessenberg form:
   a Householder ``Z1`` collapses the surviving spike to
   ``alpha e_1``, the in-VMEM blocked Householder kernel
   (``qr_kernels.hessenberg_planes``) re-reduces ``Z1^H T[:kk,:kk] Z1``,
   and the window block, spike column, and the coupling strip
   ``H[0:s, s:hi] (V Z)`` are written back with one dynamic-slice
   update. The result is exactly Hessenberg (masked), so the sweep
   kernel resumes with no special casing — it re-derives its active
   window from the subdiagonal scan at entry.

Everything runs in split re/im planes (complex64 logical arithmetic on
a backend with no complex dtypes) and under one ``jax.jit`` per round:
the host loop only reads back ``hi`` (a scalar) to decide when to stop.

Outclasses /root/reference/src/qr_method/qr_eigenvalues.hpp:69-94
(unshifted, undeflated, full re-decomposition per sweep) per SURVEY §7
step 5; VERDICT r3 task 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .qr_eig_blocked import (_RC, _SC, _step_pallas, _step_pallas_q,
                             pad_for_blocked, pad_q_identity,
                             qr_eig_blocked_step, qr_eig_blocked_step_q)
from .qr_kernels import hessenberg_planes, qr_hessenberg_eig_planes

LANES = 128

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, precision=_HI, preferred_element_type=jnp.float32)


def _pmm(A, B):
    """Split-plane complex matmul: (2, m, k) @ (2, k, n) -> (2, m, n)."""
    return jnp.stack([_dot(A[0], B[0]) - _dot(A[1], B[1]),
                      _dot(A[0], B[1]) + _dot(A[1], B[0])])


def _pmm_h(A, B):
    """A^H @ B in split planes."""
    return jnp.stack([_dot(A[0].T, B[0]) + _dot(A[1].T, B[1]),
                      _dot(A[0].T, B[1]) - _dot(A[1].T, B[0])])


def _aed_round_core(p: jax.Array, hi: jax.Array, tol: jax.Array, *, w: int,
                    interpret: bool = False, q: jax.Array | None = None):
    """One AED round on padded blocked-layout planes ``p``.

    Caller guarantees ``hi >= w + 2`` (so the window start ``s = hi - w``
    leaves a spike column ``s - 1 >= 1``). Returns
    ``(p', d, hi_w, shifts, ns)``: the updated planes, the number of
    eigenvalues deflated this round, the window solve's residual active
    size (<=1 means the window Schur fully converged), and the shift
    schedule — the bottom-most undeflated window Ritz values packed into
    a (2, 1, 128) lane vector for the sweep kernel's shift cycling.
    """
    s = jnp.asarray(hi, jnp.int32) - w
    z32 = jnp.zeros((), jnp.int32)
    idx = jnp.arange(w)
    one = jnp.ones((), jnp.float32)

    # 1. windowed Schur in VMEM: W = V T V^H
    W = jax.lax.dynamic_slice(p, (z32, s, s), (2, w, w))
    _eig, _sw, hi_w, T, V = qr_hessenberg_eig_planes(
        W, jnp.asarray(w, jnp.int32), jnp.asarray(40 * w, jnp.int32), tol,
        interpret=interpret, accumulate_q=True)

    # 2. spike u = beta * conj(V[0, :]), deflation count d
    beta_r = p[0, s, s - 1]
    beta_i = p[1, s, s - 1]
    u_r = beta_r * V[0, 0, :] + beta_i * V[1, 0, :]
    u_i = beta_i * V[0, 0, :] - beta_r * V[1, 0, :]
    umag = jnp.sqrt(u_r * u_r + u_i * u_i)
    tdr = jnp.diagonal(T[0])
    tdi = jnp.diagonal(T[1])
    dmag = jnp.sqrt(tdr * tdr + tdi * tdi)
    ok = jnp.logical_and(umag <= tol * jnp.maximum(dmag, one),
                         idx >= hi_w)  # only window-converged rows deflate
    d = jnp.sum(jnp.cumprod(jnp.flip(ok.astype(jnp.int32)))).astype(jnp.int32)
    kk = w - d

    # 3a. Householder Z1 collapsing the surviving spike to alpha e1
    keep = (idx < kk).astype(jnp.float32)
    um_r = u_r * keep
    um_i = u_i * keep
    nrm = jnp.sqrt(jnp.sum(um_r * um_r + um_i * um_i))
    u0r, u0i = um_r[0], um_i[0]
    m0 = jnp.sqrt(u0r * u0r + u0i * u0i)
    has0 = m0 > 0.0
    m0s = jnp.where(has0, m0, one)
    sgr = jnp.where(has0, u0r / m0s, one)
    sgi = jnp.where(has0, u0i / m0s, jnp.zeros((), jnp.float32))
    alpha_r = -sgr * nrm
    alpha_i = -sgi * nrm
    e1 = (idx == 0).astype(jnp.float32)
    v_r = um_r - alpha_r * e1
    v_i = um_i - alpha_i * e1
    vn2 = jnp.sum(v_r * v_r + v_i * v_i)
    degenerate = vn2 == 0.0
    f = jnp.where(degenerate, 0.0, 2.0 / jnp.where(degenerate, one, vn2))
    eye = jnp.eye(w, dtype=jnp.float32)
    # Z1 = I - f v v^H (Hermitian)
    Z1 = jnp.stack([eye - f * (jnp.outer(v_r, v_r) + jnp.outer(v_i, v_i)),
                    -f * (jnp.outer(v_i, v_r) - jnp.outer(v_r, v_i))])

    # 3b. re-Hessenberg the undeflated block: B1 = Z1^H T_mask Z1
    m2 = (keep[:, None] * keep[None, :])
    Tm = T * m2[None]
    B1 = _pmm_h(Z1, _pmm(Tm, Z1))
    _Hb, Z2 = hessenberg_planes(B1, kk, interpret=interpret,
                                accumulate_q=True)

    # 3c. assemble: Z = Z1 Z2 (identity outside the leading kk block),
    # new window = hessenberg-masked Z^H T Z, spike = alpha e1
    Z = _pmm(Z1, Z2)
    Wnew = _pmm_h(Z, _pmm(T, Z))
    hmask = (idx[:, None] <= idx[None, :] + 1).astype(jnp.float32)
    Wnew = Wnew * hmask[None]
    VZ = _pmm(V, Z)

    # 4. strip writebacks. Schur mode (q given): trailing columns are
    # LIVE, so the row strip [s, s+w) x [0, C) takes the left transform
    # (VZ)^H first; eigenvalues-only mode skips it (cols >= hi stale by
    # contract). Then cols [s, s+w) over all rows take the right @ VZ,
    # the window block is overwritten with the exactly-Hessenberg
    # T-based assembly, and the spike column is set to alpha e1.
    R = p.shape[1]
    if q is not None:
        C = p.shape[2]
        rstrip = jax.lax.dynamic_slice(p, (z32, s, z32), (2, w, C))
        rstrip = _pmm_h(VZ, rstrip)
        p = jax.lax.dynamic_update_slice(p, rstrip, (z32, s, z32))
    strip = jax.lax.dynamic_slice(p, (z32, z32, s), (2, R, w))
    strip = _pmm(strip, VZ)
    strip = jax.lax.dynamic_update_slice(strip, Wnew, (z32, s, z32))
    p = jax.lax.dynamic_update_slice(p, strip, (z32, z32, s))
    spike = jnp.stack([alpha_r * e1, alpha_i * e1]).reshape(2, w, 1)
    p = jax.lax.dynamic_update_slice(p, spike, (z32, s, s - 1))
    if q is not None:
        qstrip = jax.lax.dynamic_slice(q, (z32, z32, s), (2, R, w))
        qstrip = _pmm(qstrip, VZ)
        q = jax.lax.dynamic_update_slice(q, qstrip, (z32, z32, s))

    # shift schedule: bottom-most undeflated Ritz values, T[kk-1-j, kk-1-j]
    lane = jnp.arange(LANES)
    src = jnp.clip(kk - 1 - lane, 0, w - 1)
    ns = jnp.minimum(kk, LANES)
    valid = (lane < ns).astype(jnp.float32)
    shifts = jnp.stack([jnp.take(tdr, src) * valid,
                        jnp.take(tdi, src) * valid]).reshape(2, 1, LANES)
    if q is not None:
        return p, q, d, hi_w, shifts, ns
    return p, d, hi_w, shifts, ns


@functools.partial(jax.jit, static_argnames=("w", "interpret"),
                   donate_argnums=(0,))
def _aed_round(p: jax.Array, hi: jax.Array, tol: jax.Array, *, w: int,
               interpret: bool = False):
    """Standalone jitted AED round (no sweeps) — see _aed_round_core."""
    return _aed_round_core(p, hi, tol, w=w, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("w", "interpret"),
                   donate_argnums=(0, 1))
def _aed_sweep_round_q(p: jax.Array, q: jax.Array, hi: jax.Array,
                       n: jax.Array, budget: jax.Array, tol: jax.Array,
                       *, w: int, interpret: bool = False):
    """Schur-mode fused round: AED (with left-row-strip + Q updates)
    then up to ``budget`` Q-accumulating sweeps with shift cycling."""
    p, q, d, hi_w, shifts, ns = _aed_round_core(p, hi, tol, w=w,
                                                interpret=interpret, q=q)
    p, q, eig, sweeps, hi2 = _step_pallas_q(p, q, n, budget, tol, shifts,
                                            ns, interpret=interpret)
    return p, q, eig, sweeps, hi2, d, hi_w


@functools.partial(jax.jit, static_argnames=("w", "interpret"),
                   donate_argnums=(0,))
def _aed_sweep_round(p: jax.Array, hi: jax.Array, n: jax.Array,
                     budget: jax.Array, tol: jax.Array, *, w: int,
                     interpret: bool = False):
    """Fused round: one AED pass, then up to ``budget`` sweeps cycling
    the AED's undeflated Ritz values as shifts — a single device dispatch
    (the per-round host sync costs ~30 ms through the axon tunnel, which
    dominated the un-fused loop). Returns
    ``(p', eig, sweeps, hi', d, hi_w)``."""
    p, d, hi_w, shifts, ns = _aed_round_core(p, hi, tol, w=w,
                                             interpret=interpret)
    p, eig, sweeps, hi2 = _step_pallas(p, n, budget, tol, shifts, ns,
                                       interpret=interpret)
    return p, eig, sweeps, hi2, d, hi_w


@functools.partial(jax.jit, static_argnames=("w", "interpret"),
                   donate_argnums=(0,))
def _aed_sweep_round2(p: jax.Array, hi: jax.Array, n: jax.Array,
                      budget: jax.Array, tol: jax.Array, *, w: int,
                      interpret: bool = False):
    """Megakernel round (round-5, VERDICT task 3): TWO fused
    (AED + sweep-batch) rounds per dispatch — the second AED reads the
    post-sweep ``hi`` from the first ON DEVICE, so the ~30 ms tunnel
    dispatch plus the host round-trip is paid once per two rounds.
    Used while the active window is deep (hi >> w); the tail keeps the
    single-round driver so the host can shrink w. Returns the same
    tuple as ``_aed_sweep_round`` with sweeps/deflations summed."""
    p, d1, hw1, shifts, ns = _aed_round_core(p, hi, tol, w=w,
                                             interpret=interpret)
    p, eig, sw1, hi2 = _step_pallas(p, n, budget, tol, shifts, ns,
                                    interpret=interpret)

    # the AED core requires hi >= w + 2 (window start leaves a spike
    # column); after the first sweep batch hi2 may have collapsed below
    # that — guard the second round on device instead of syncing
    def second(args):
        p, eig, hi2 = args
        p2, d2, hw2, shifts2, ns2 = _aed_round_core(p, hi2, tol, w=w,
                                                    interpret=interpret)
        p2, eig2, sw2, hi3 = _step_pallas(p2, n, budget, tol, shifts2,
                                          ns2, interpret=interpret)
        return p2, eig2, sw2, hi3, d2, hw2

    def skip(args):
        p, eig, hi2 = args
        return (p, eig, jnp.zeros((), jnp.int32), hi2,
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    p, eig, sw2, hi3, d2, hw2 = jax.lax.cond(
        hi2 >= w + 2, second, skip, (p, eig, hi2))
    return p, eig, sw1 + sw2, hi3, d1 + d2, hw2


@functools.partial(jax.jit, static_argnames=("w", "interpret"),
                   donate_argnums=(0,))
def _aed_deep_phase(p: jax.Array, hi: jax.Array, n: jax.Array,
                    budget: jax.Array, max_total: jax.Array,
                    max_rounds: jax.Array, tol: jax.Array, *, w: int,
                    interpret: bool = False):
    """Round-5 deep-phase driver: the WHOLE sequence of (AED round +
    sweep batch) iterations while the active window stays deep
    (hi >= w + 2) runs as ONE jitted ``lax.while_loop`` — one ~30 ms
    tunnel dispatch for what the host loop paid per round. The loop
    condition IS the AED core's precondition, so no ``lax.cond`` is
    needed (a cond-guarded second round was measured to defeat buffer
    donation and copy the planes every round — PERF_NOTES round 5).
    ``max_rounds`` bounds the loop when sweeps stop advancing (budget
    exhaustion mid-round). Returns ``(p', eig, total_sweeps, hi')``."""
    eig0 = jnp.zeros((2, 1, p.shape[1] - _RC), jnp.float32)

    def cond(c):
        p_, hi_, eig_, total, rounds = c
        return jnp.logical_and(
            jnp.logical_and(hi_ >= w + 2, total < max_total),
            rounds < max_rounds)

    def body(c):
        p_, hi_, eig_, total, rounds = c
        b = jnp.minimum(budget, max_total - total)
        p_, d, hw, shifts, ns = _aed_round_core(p_, hi_, tol, w=w,
                                                interpret=interpret)
        p_, eig_, sw, hi2 = _step_pallas(p_, n, b, tol, shifts, ns,
                                         interpret=interpret)
        return p_, hi2, eig_, total + sw, rounds + 1

    p, hi, eig, total, _r = jax.lax.while_loop(
        cond, body, (p, jnp.asarray(hi, jnp.int32), eig0,
                     jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))
    return p, eig, total, hi


def qr_eig_blocked_aed_planes(h_planes: jax.Array, n: int,
                              max_sweeps: int, tol: float, *,
                              w: int = 256, sweeps_per_round: int = 96,
                              interpret: bool = False, log=None):
    """All eigenvalues of an upper-Hessenberg split-plane matrix via the
    HBM-blocked shifted sweeps + AED rounds. Same return contract as
    ``qr_eig_blocked_planes``: ``(eig_planes (2, m), sweeps, hi)`` with
    ``hi <= 1`` meaning converged; ``sweeps`` counts Givens sweeps only
    (AED rounds are extra work but deflate without sweeping).
    """
    n_planes, m, _ = h_planes.shape
    assert n_planes in (1, 2)   # (1, m, m) real: zero plane folded into
    tolv = jnp.asarray(tol, jnp.float32)    # the pad (16384 OOM fix)
    nv = jnp.asarray(n, jnp.int32)
    p, np_ = pad_for_blocked(h_planes)
    del h_planes
    # a short Wilkinson warm-up matures the bottom of the window before
    # the first AED pass (nothing deflates from a cold Hessenberg)
    warmup = min(sweeps_per_round, max_sweeps)
    p, eig, sweeps, hi_j = qr_eig_blocked_step(
        p, nv, jnp.asarray(warmup, jnp.int32), tolv, interpret=interpret)
    total = int(sweeps)
    hi = int(hi_j)
    cur_s = sweeps_per_round
    while hi > 1 and total < max_sweeps:
        # shrink the AED window with the active region so the deflation
        # rounds keep firing down to hi ~ 66 (a w-sized tail would
        # otherwise fall back to one-eigenvalue-per-2-sweeps deflation)
        w_eff = w
        while w_eff > 64 and hi < w_eff + 2:
            w_eff //= 2
        if hi < w_eff + 2:
            # small remainder: plain Wilkinson sweeps only
            p, eig, sweeps, hi_j = qr_eig_blocked_step(
                p, nv, jnp.asarray(max_sweeps - total, jnp.int32), tolv,
                interpret=interpret)
            total += int(sweeps)
            hi = int(hi_j)
            break
        # round 5: the whole deep phase at this window size runs as ONE
        # jitted while_loop of (AED + sweep batch) rounds — one tunnel
        # dispatch instead of one per round (the loop condition is the
        # AED core's hi >= w + 2 precondition, so donation survives; a
        # cond-guarded megakernel variant was measured to copy the
        # planes every round, PERF_NOTES round 5). At np_ >= 16384 the
        # while carry's double-buffered 2.3 GB planes crash the worker
        # (single host-driven rounds run fine) — and the ~85 ms/round
        # host overhead is noise against a multi-minute solve there, so
        # the per-round loop is the better trade anyway.
        budget = min(cur_s, max_sweeps - total)
        remaining = max_sweeps - total
        if np_ >= 16384:
            p, eig, sweeps, hi_j, d, hi_w = _aed_sweep_round(
                p, jnp.asarray(hi, jnp.int32), nv,
                jnp.asarray(budget, jnp.int32), tolv, w=w_eff,
                interpret=interpret)
        else:
            max_rounds = remaining // max(budget, 1) + 8
            p, eig, sweeps, hi_j = _aed_deep_phase(
                p, jnp.asarray(hi, jnp.int32), nv,
                jnp.asarray(budget, jnp.int32),
                jnp.asarray(remaining, jnp.int32),
                jnp.asarray(max_rounds, jnp.int32), tolv, w=w_eff,
                interpret=interpret)
        total += int(sweeps)
        new_hi = int(hi_j)
        if log is not None:
            log(f"aed-deep(w={w_eff}, S={cur_s}): hi {hi}->{new_hi}, "
                f"sweeps={total}")
        # Fixed sweep batches measured best on-chip: harvest-adaptive S
        # (grow on poor rounds, shrink on rich ones) was tried and LOST
        # ~2x — rich harvests cluster late, so shrinking S there just
        # multiplies the ~85 ms/round AED+dispatch overhead.
        if new_hi == hi and int(sweeps) == 0:
            break  # no progress possible (budget exhausted edge)
        hi = new_hi
    return eig[:, 0, :m], total, hi


# The 2-plane blocked Hessenberg crashes the remote AOT compile helper
# for np_ >= 1152 at ANY block size, slab size, or phase split (round-4
# diagnosis: a plane-count-specific compiler fault — DEFAULT-precision
# builds compile instantly and the 1-plane kernel runs to >= 4096 after
# the phase-split + shared-operand fusion fix, so it is neither VMEM nor
# instance count alone). Complex inputs beyond this cap run the REAL
# 2n x 2n embedding below.
_COMPLEX_BLOCKED_MAX_N = 1024


def _conj_pair_reps(ev: np.ndarray) -> np.ndarray:
    """Greedily match the 2n embedded eigenvalues into conjugate pairs;
    return the n canonical (+imag) representatives."""
    order = np.lexsort((ev.imag, ev.real))
    ev = ev[order]
    used = np.zeros(len(ev), bool)
    reps = []
    for i in range(len(ev)):
        if used[i]:
            continue
        used[i] = True
        rest = np.flatnonzero(~used)
        if len(rest) == 0:
            reps.append(ev[i])
            break
        j = rest[np.argmin(np.abs(ev[rest] - np.conj(ev[i])))]
        used[j] = True
        reps.append(ev[i] if ev[i].imag >= ev[j].imag else ev[j])
    return np.asarray(reps)


def _complex_via_real_embedding(planes, n, max_sweeps, tol, *, w,
                                sweeps_per_round, log,
                                interpret: bool = False):
    """On-chip eigenvalues of a complex matrix beyond the 2-plane kernel
    cap: solve the real embedding R = [[Re, -Im], [Im, Re]] (spectrum
    {lam} U {conj lam}) at 2n on the (working) 1-plane blocked path.

    The embedded spectrum determines each eigenvalue only up to
    conjugation, and that ambiguity is NOT resolvable from one run when
    A itself contains conjugate pairs. A second run on e^{i theta} A
    (a plane rotation; its embedding is equally real) breaks the
    symmetry: for each canonical pair representative c, exactly one of
    {e^{i theta} c, e^{i theta} conj(c)} appears in the rotated
    spectrum, identifying lam = c or conj(c).

    FALLBACK PATH ONLY (round 5): the main complex path is now the
    structure-preserving ``hessenberg_blocked_embedded`` + native
    2-plane sweeps, which has no conjugation ambiguity. Known limit of
    THIS fallback (round-4 advisor): the greedy nearest-neighbor pair
    matching can mis-assign when inter-eigenvalue spacing is comparable
    to the f32 solver error (clustered spectra), silently flipping an
    imaginary-part sign; do not route clustered complex inputs here."""
    theta = 0.7321
    ct, st = np.cos(theta), np.sin(theta)

    def solve_planes(pr, pi):
        emb = jnp.concatenate([
            jnp.concatenate([pr, -pi], axis=1),
            jnp.concatenate([pi, pr], axis=1)], axis=0)[None]
        from .hessenberg_blocked import hessenberg_blocked_planes
        h = hessenberg_blocked_planes(emb, 2 * n, interpret=interpret)
        h = jnp.concatenate([h, jnp.zeros_like(h)])
        eig, sweeps, hi = qr_eig_blocked_aed_planes(
            h, 2 * n, 2 * max_sweeps, tol, w=w,
            sweeps_per_round=sweeps_per_round, log=log,
            interpret=interpret)
        e = np.asarray(jax.device_get(eig))
        return ((e[0] + 1j * e[1])[:2 * n].astype(np.complex64),
                int(sweeps), int(hi) <= 1)

    ev0, sweeps0, conv0 = solve_planes(planes[0], planes[1])
    ev1, sweeps1, conv1 = solve_planes(ct * planes[0] - st * planes[1],
                                       st * planes[0] + ct * planes[1])
    reps = _conj_pair_reps(ev0)
    rot = np.sort_complex(_conj_pair_reps(ev1))
    rot_re = rot  # sorted canonical reps of the rotated spectrum
    phase = np.exp(1j * theta)

    def canon(z):
        return z if z.imag >= 0 else np.conj(z)

    out = np.empty(n, np.complex64)
    for i, c in enumerate(reps):
        t1 = canon(phase * c)
        t2 = canon(phase * np.conj(c))
        d1 = np.abs(rot_re - t1).min()
        d2 = np.abs(rot_re - t2).min()
        out[i] = c if d1 <= d2 else np.conj(c)
    return out, sweeps0 + sweeps1, bool(conv0 and conv1)


@functools.partial(jax.jit, static_argnames=("w", "interpret"),
                   donate_argnums=(0, 1))
def _aed_deep_phase_q(p: jax.Array, q: jax.Array, hi: jax.Array,
                      n: jax.Array, budget: jax.Array,
                      max_total: jax.Array, max_rounds: jax.Array,
                      tol: jax.Array, *, w: int,
                      interpret: bool = False):
    """Schur-mode deep phase: like ``_aed_deep_phase`` but every AED
    round and sweep batch maintains the full Schur factorization (Q
    accumulated, trailing columns live). One dispatch per window size."""
    eig0 = jnp.zeros((2, 1, p.shape[1] - _RC), jnp.float32)

    def cond(c):
        p_, q_, hi_, eig_, total, rounds = c
        return jnp.logical_and(
            jnp.logical_and(hi_ >= w + 2, total < max_total),
            rounds < max_rounds)

    def body(c):
        p_, q_, hi_, eig_, total, rounds = c
        b = jnp.minimum(budget, max_total - total)
        p_, q_, d, hw, shifts, ns = _aed_round_core(
            p_, hi_, tol, w=w, interpret=interpret, q=q_)
        p_, q_, eig_, sw, hi2 = _step_pallas_q(
            p_, q_, n, b, tol, shifts, ns, interpret=interpret)
        return p_, q_, hi2, eig_, total + sw, rounds + 1

    p, q, hi, eig, total, _r = jax.lax.while_loop(
        cond, body, (p, q, jnp.asarray(hi, jnp.int32), eig0,
                     jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))
    return p, q, eig, total, hi


def qr_eig_blocked_aed_schur_planes(h_planes: jax.Array, n: int,
                                    max_sweeps: int, tol: float, *,
                                    w: int = 256,
                                    sweeps_per_round: int = 96,
                                    interpret: bool = False, log=None):
    """Schur-mode AED driver: like ``qr_eig_blocked_aed_planes`` but the
    sweeps and AED rounds maintain the full Schur factorization
    (H = Q T Q^H of the INPUT Hessenberg planes). Returns
    ``(eig, sweeps, hi, t_planes (2, m, m), q_planes (2, m, m))`` —
    the contract of ``qr_eig_blocked_planes(accumulate_q=True)``."""
    n_planes, m, _ = h_planes.shape
    assert n_planes == 2
    tolv = jnp.asarray(tol, jnp.float32)
    nv = jnp.asarray(n, jnp.int32)
    p, np_ = pad_for_blocked(h_planes)
    q = pad_q_identity(np_)
    warmup = min(sweeps_per_round, max_sweeps)
    p, q, eig, sweeps, hi_j = qr_eig_blocked_step_q(
        p, q, nv, jnp.asarray(warmup, jnp.int32), tolv,
        interpret=interpret)
    total = int(sweeps)
    hi = int(hi_j)
    while hi > 1 and total < max_sweeps:
        w_eff = w
        while w_eff > 64 and hi < w_eff + 2:
            w_eff //= 2
        if hi < w_eff + 2:
            p, q, eig, sweeps, hi_j = qr_eig_blocked_step_q(
                p, q, nv, jnp.asarray(max_sweeps - total, jnp.int32),
                tolv, interpret=interpret)
            total += int(sweeps)
            hi = int(hi_j)
            break
        # round 5: whole deep phase per window size in ONE dispatch
        # (same while_loop fusion as the eigenvalues driver)
        budget = min(sweeps_per_round, max_sweeps - total)
        remaining = max_sweeps - total
        max_rounds = remaining // max(budget, 1) + 8
        p, q, eig, sweeps, hi_j = _aed_deep_phase_q(
            p, q, jnp.asarray(hi, jnp.int32), nv,
            jnp.asarray(budget, jnp.int32),
            jnp.asarray(remaining, jnp.int32),
            jnp.asarray(max_rounds, jnp.int32), tolv, w=w_eff,
            interpret=interpret)
        total += int(sweeps)
        new_hi = int(hi_j)
        if log is not None:
            log(f"aed-schur-deep(w={w_eff}): hi {hi}->{new_hi}, "
                f"sweeps={total}")
        if new_hi == hi and int(sweeps) == 0:
            break
        hi = new_hi
    return (eig[:, 0, :m], total, hi, p[:, :m, :m], q[:, :m, :m])


def qr_eigenvalues_pallas_blocked_aed(a, max_sweeps: int, tol: float, *,
                                      w: int = 256,
                                      sweeps_per_round: int = 96,
                                      interpret: bool = False, log=None):
    """Accelerated QR eigenvalues with AED, fully on-chip for any
    HBM-sized n: blocked Hessenberg + blocked shifted-Givens sweeps +
    in-VMEM AED rounds. Same return contract as
    ``qr_eig_blocked.qr_eigenvalues_pallas_blocked`` (eigenvalues
    complex64, sweeps, converged)."""
    from .hessenberg_blocked import (hessenberg_blocked_embedded,
                                     hessenberg_blocked_planes)
    from .qr_kernels import split_planes_f32
    n = a.shape[0]
    planes = split_planes_f32(a)
    if planes.shape[0] == 2 and n > _COMPLEX_BLOCKED_MAX_N \
            and not interpret:
        # round 5: ONE structure-preserving embedded reduction (complex
        # paired-column reflectors on the real 2n x 2n embedding) gives
        # the native complex Hessenberg; the 2-plane AED sweep stack
        # (np_-independent operands, compiles at any size the real path
        # does) then solves it directly — replaces the former TWO full
        # rotated-spectrum solves of _complex_via_real_embedding (kept
        # below as a documented fallback), halving the big-n complex
        # cost and removing the conjugation-matching ambiguity the
        # round-4 advisor flagged.
        h = hessenberg_blocked_embedded(planes, n, interpret=interpret)
        del planes
        eig, sweeps, hi = qr_eig_blocked_aed_planes(
            h, n, max_sweeps, tol, w=w,
            sweeps_per_round=sweeps_per_round, log=log,
            interpret=interpret)
        e = np.asarray(jax.device_get(eig))
        return ((e[0] + 1j * e[1])[:n].astype(np.complex64),
                int(sweeps), bool(int(hi) <= 1))
    h = hessenberg_blocked_planes(planes, n, interpret=interpret)
    del planes
    # 1-plane h passes straight through: pad_for_blocked folds the zero
    # imaginary plane into the pad (a (2, m, m) concatenate here held an
    # extra 2.1 GB at 16384 and tipped the device OOM)
    eig, sweeps, hi = qr_eig_blocked_aed_planes(
        h, n, max_sweeps, tol, w=w, sweeps_per_round=sweeps_per_round,
        interpret=interpret, log=log)
    e = np.asarray(jax.device_get(eig))
    return ((e[0] + 1j * e[1])[:n].astype(np.complex64),
            int(sweeps), bool(int(hi) <= 1))
