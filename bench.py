"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: SpMV throughput (nnz/s) inside a jitted power-iteration
loop on the 100K-row banded sparse config (BASELINE.json configs[3]),
measured on the real chip. The operator is a fully-populated 33-diagonal
band in DIA layout driven by the Pallas kernel
(ops/pallas/dia_spmv.py); ``vs_baseline`` is the speedup over the naive
gather-based ELL SpMV — the untuned way to run general sparse on TPU via
XLA (the reference itself publishes no numbers, BASELINE.md).

Timing methodology: the axon relay's ``block_until_ready`` does not block
on completion, and each dispatch carries ~30 ms of tunnel latency — so
every measurement forces a scalar readback and the per-iteration cost is
the MARGINAL cost between two loop lengths.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

BANDWIDTH = 16  # 33 diagonals


def _marginal_time(run, args, lo=100, hi=1100, reps=3):
    """Marginal seconds/iteration with scalar-readback synchronisation."""
    float(run(*args, lo))  # warm both shapes
    float(run(*args, hi))
    t_lo, t_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(*args, lo)); t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run(*args, hi)); t_hi.append(time.perf_counter() - t0)
    return max((min(t_hi) - min(t_lo)) / (hi - lo), 1e-12)


def bench_spmv(n: int, verbose: bool):
    from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_full
    from pcsc_eigenvalue_solver_project_tpu.ops.matvec import ell_matvec
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.dia_spmv import dia_matvec

    dia = banded_full(n, bandwidth=BANDWIDTH, dtype=np.float32, seed=0)
    offsets = dia.offsets
    nnz = dia.nnz
    x0 = jnp.ones((n,), jnp.float32)

    def power_chain(matvec):
        def run_body(operand, iters):
            def body(_, xx):
                yy = matvec(operand, xx)
                nn2 = jnp.sum(jnp.abs(yy) ** 2)
                return yy * jax.lax.rsqrt(jnp.where(nn2 == 0, 1.0, nn2))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))
        return jax.jit(run_body)

    results = {}

    run_pallas = power_chain(lambda v, x: dia_matvec(v, offsets, x, force="pallas"))
    results["pallas_dia"] = nnz / _marginal_time(run_pallas, (dia.data,))

    # bf16 diagonal storage (f32 accumulate): half the HBM traffic
    results["pallas_dia_bf16"] = nnz / _marginal_time(
        run_pallas, (dia.data.astype(jnp.bfloat16),))

    # interleaved (lane-major) layout: diagonal shifts become sublane
    # slices — <= 8 sublane rolls/tile instead of ~32 lane rolls
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.dia_spmv import (
        dia_matvec_il, interleave_vec)
    il = dia.interleaved()
    x0_il = interleave_vec(x0, il.R)

    def run_il_body(v, iters):
        def body(_, xx):
            yy = dia_matvec_il(v, offsets, xx, force="pallas",
                               tile_s=il.tile_s)
            nn2 = jnp.sum(yy * yy)
            return (yy * jax.lax.rsqrt(
                jnp.where(nn2 == 0, 1.0, nn2))).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x0_il))

    run_il = jax.jit(run_il_body)
    results["pallas_dia_il"] = nnz / _marginal_time(run_il, (il.data_il,))
    results["pallas_dia_il_bf16"] = nnz / _marginal_time(
        run_il, (il.data_il.astype(jnp.bfloat16),))

    run_xla = power_chain(lambda v, x: dia_matvec(v, offsets, x, force="xla"))
    results["xla_dia"] = nnz / _marginal_time(run_xla, (dia.data,))

    # naive baseline: ELL gather SpMV of the same operator
    from pcsc_eigenvalue_solver_project_tpu.matrix.sparse import SparseCSR
    csr = SparseCSR.from_dense(np.asarray(dia.to_dense())) if n <= 20000 else None
    if csr is None:
        # build ELL directly from the band (avoids dense materialisation)
        k = len(offsets)
        cols = np.clip(np.arange(n)[:, None] + np.array(offsets)[None, :], 0, n - 1)
        ell_data = np.asarray(dia.data).T.copy()  # (n, k)
        ell_idx = cols.astype(np.int32)
        run_ell = power_chain(lambda v, x: ell_matvec(jnp.asarray(ell_idx), v, x))
        results["ell_gather"] = nnz / _marginal_time(
            run_ell, (jnp.asarray(ell_data),), lo=20, hi=120)
    if verbose:
        for kk, v in sorted(results.items(), key=lambda kv: -kv[1]):
            print(f"# {kk:12s} {v / 1e9:8.3f} Gnnz/s", file=sys.stderr)
    return results


def bench_general(n: int, nnz_per_row: int, verbose: bool,
                  pattern: str = "uniform"):
    """General (unstructured) sparse SpMV inside the power loop — the
    reference's sparse hot op with no exploitable structure
    (power_method.hpp:69, arbitrary Eigen::SparseMatrix). Fast path: the
    packed gather-ELL Pallas kernel (ops/pallas/gell_spmv.py); baseline:
    XLA ELL gather (the untuned way to run this on TPU)."""
    from pcsc_eigenvalue_solver_project_tpu.matrix.sparse import SparseCSR
    from pcsc_eigenvalue_solver_project_tpu.ops.matvec import ell_matvec
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.gell_spmv import (
        gell_matvec, pack_gell)

    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), nnz_per_row)
    if pattern == "local":
        # FEM/graph-style column locality: columns within +-8192 of the
        # row (wrapping at the ends — clipping instead piles boundary
        # entries into a few lane buckets and inflates the spill tail
        # 50x, an artifact of the generator, not the kernel) — the
        # class the GELL column-panel pruning accelerates
        off = rng.integers(-8192, 8193, n * nnz_per_row)
        cols = (rows + off) % n
    else:
        cols = rng.integers(0, n, n * nnz_per_row)
    vals = rng.standard_normal(n * nnz_per_row).astype(np.float32)
    key = rows.astype(np.int64) * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols, vals = rows[uniq], cols[uniq], vals[uniq]
    nnz = len(rows)

    pack = pack_gell(rows, cols, vals, (n, n))
    x0 = jnp.ones((n,), jnp.float32)

    def power_chain(matvec):
        def run_body(operand, iters):
            def body(_, xx):
                yy = matvec(operand, xx)
                nn2 = jnp.sum(yy * yy)
                return yy * jax.lax.rsqrt(jnp.where(nn2 == 0, 1.0, nn2))
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))
        return jax.jit(run_body)

    results = {}
    run_gell = power_chain(lambda p, x: gell_matvec(p, x))
    results["pallas_gell"] = nnz / _marginal_time(run_gell, (pack,), lo=20, hi=220)

    # bf16 values variant: halves the value-plane HBM bytes. The kernel
    # is VPU-op-bound, not bandwidth-bound (see tools/gell_micro.py
    # ablation + docs/PERF_NOTES.md), so this tracks f32 closely — the
    # line is recorded for the roofline accounting, not as a speedup.
    results["pallas_gell_bf16"] = nnz / _marginal_time(
        run_gell, (pack.with_values_dtype(jnp.bfloat16),), lo=20, hi=220)

    csr = SparseCSR.from_coo(rows, cols, vals, (n, n), dtype=np.float32)
    ell = csr.to_ell()
    run_ell = power_chain(lambda ops, x: ell_matvec(ops[0], ops[1], x))
    results["ell_gather"] = nnz / _marginal_time(
        run_ell, ((ell.indices, ell.data),), lo=5, hi=25)
    if verbose:
        for kk, v in sorted(results.items(), key=lambda kv: -kv[1]):
            print(f"# {kk:12s} {v / 1e9:8.3f} Gnnz/s", file=sys.stderr)
    return results


def bench_block(n: int, nvec: int, verbose: bool):
    """Block SpMM throughput (subspace/LOBPCG workhorse): nvec iterates
    share one read of the diagonals — Gnnz*vec/s, interleaved kernel."""
    from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_full
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.dia_spmv import (
        dia_matmat_il, il_rows, interleave_dia_vals, interleave_vec)

    dia = banded_full(n, bandwidth=BANDWIDTH, dtype=np.float32, seed=0)
    offsets, nnz = dia.offsets, dia.nnz
    R = il_rows(n)
    vil = interleave_dia_vals(dia.data, R)
    xs0 = jnp.stack([interleave_vec(jnp.ones((n,), jnp.float32), R)] * nvec)

    def run_body(v, iters):
        def body(_, xx):
            yy = dia_matmat_il(v, offsets, xx, force="pallas")
            nn2 = jnp.sum(yy * yy)
            return (yy * jax.lax.rsqrt(
                jnp.where(nn2 == 0, 1.0, nn2))).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, xs0))

    run = jax.jit(run_body)
    results = {}
    results["il_block_f32"] = nnz * nvec / _marginal_time(
        run, (vil,), lo=50, hi=550)
    results["il_block_bf16"] = nnz * nvec / _marginal_time(
        run, (vil.astype(jnp.bfloat16),), lo=50, hi=550)
    if verbose:
        for kk, v in sorted(results.items(), key=lambda kv: -kv[1]):
            print(f"# {kk:14s} {v / 1e9:8.2f} Gnnz*vec/s", file=sys.stderr)
    return results


def bench_complex(n: int, verbose: bool):
    """Split-plane complex SpMV (the reference demo's dtype) on the
    interleaved kernel — complex Gnnz/s."""
    from pcsc_eigenvalue_solver_project_tpu.matrix.split_complex import (
        SplitComplexDIA)
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.dia_spmv import (
        dia_matvec_il_planes)

    rng = np.random.default_rng(0)
    offsets = tuple(range(-BANDWIDTH, BANDWIDTH + 1))
    k = len(offsets)
    planes = np.zeros((2, k, n), np.float32)
    for d, off in enumerate(offsets):
        planes[0, d] = rng.standard_normal(n)
        planes[1, d] = rng.standard_normal(n)
        if off > 0:
            planes[:, d, n - off:] = 0
        elif off < 0:
            planes[:, d, :-off] = 0
    sc = SplitComplexDIA(planes=jnp.asarray(planes), offsets=offsets,
                         shape=(n, n))
    il = sc.interleaved()
    nnz = sc.nnz
    zp0 = il.encode_vec(jnp.stack([jnp.ones(n, jnp.float32),
                                   jnp.zeros(n, jnp.float32)]))

    def run_body(v, iters):
        def body(_, xx):
            yy = dia_matvec_il_planes(v, offsets, xx, force="pallas",
                                      tile_s=il.tile_s)
            nn2 = jnp.sum(yy * yy)
            return (yy * jax.lax.rsqrt(
                jnp.where(nn2 == 0, 1.0, nn2))).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, zp0))

    run = jax.jit(run_body)
    results = {
        "il_planes_f32": nnz / _marginal_time(run, (il.planes_il,)),
        "il_planes_bf16": nnz / _marginal_time(
            run, (il.planes_il.astype(jnp.bfloat16),)),
    }
    if verbose:
        for kk, v in sorted(results.items(), key=lambda kv: -kv[1]):
            print(f"# {kk:14s} {v / 1e9:8.2f} complex Gnnz/s", file=sys.stderr)
    return results


def bench_ds64(n: int, verbose: bool):
    """Double-single (f64-class accuracy) banded SpMV power loop on the
    real chip — the reference's double-precision contract
    (types.hpp:28-30) served ON-CHIP instead of host-pinned. Reports the
    Gnnz/s cost of the compensated arithmetic vs the plain-f32 kernel on
    the same operator, plus the achieved accuracy vs host float64."""
    from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_full
    from pcsc_eigenvalue_solver_project_tpu.ops.ds64 import (
        dia_matvec_ds, ds_add, ds_dot, ds_from_f64, ds_mul_f32, ds_rsqrt,
        ds_to_f64)

    dia = banded_full(n, bandwidth=BANDWIDTH, dtype=np.float64, seed=0)
    offsets = tuple(dia.offsets)
    nnz = dia.nnz
    dh, dl = ds_from_f64(np.asarray(dia.data, np.float64))
    x0 = np.full(n, n ** -0.5)
    x0h, x0l = ds_from_f64(x0)

    def run_body(dh, dl, iters):
        def body(_, c):
            xh, xl = c
            zh, zl = dia_matvec_ds(dh, dl, offsets, xh, xl)
            n2h, n2l = ds_dot(zh, zl, zh, zl)
            rh, rl = ds_rsqrt(n2h, n2l)
            ah, al = ds_mul_f32(zh, zl, rh)
            bh, bl = ds_mul_f32(zh, zl, rl)
            return ds_add(ah, al, bh, bl)
        xh, xl = jax.lax.fori_loop(0, iters, body, (x0h, x0l))
        return jnp.sum(xh) + jnp.sum(xl)

    run = jax.jit(run_body)
    ds_rate = nnz / _marginal_time(run, (dh, dl), lo=20, hi=220)

    # plain f32 on the same operator for the cost ratio
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.dia_spmv import dia_matvec
    data32 = jnp.asarray(np.asarray(dia.data, np.float32))

    def run32_body(v, iters):
        def body(_, xx):
            yy = dia_matvec(v, offsets, xx, force="pallas")
            nn2 = jnp.sum(yy * yy)
            return yy * jax.lax.rsqrt(jnp.where(nn2 == 0, 1.0, nn2))
        return jnp.sum(jax.lax.fori_loop(
            0, iters, body, jnp.asarray(x0, jnp.float32)))

    f32_rate = nnz / _marginal_time(jax.jit(run32_body), (data32,))

    # accuracy of one device ds matvec vs host f64
    yh, yl = jax.jit(lambda dh, dl, xh, xl: dia_matvec_ds(
        dh, dl, offsets, xh, xl))(dh, dl, x0h, x0l)
    y_ds = ds_to_f64(yh, yl)
    data = np.asarray(dia.data, np.float64)
    y64 = np.zeros(n)
    for d, off in enumerate(offsets):
        if off >= 0:
            y64[:n - off] += data[d, :n - off] * x0[off:]
        else:
            y64[-off:] += data[d, -off:] * x0[:off]
    acc = float(np.abs(y_ds - y64).max() / np.abs(y64).max())
    if verbose:
        print(f"# ds64 {n}: {ds_rate / 1e9:7.2f} Gnnz/s (f64-class) | "
              f"plain f32 {f32_rate / 1e9:7.2f} | cost x"
              f"{f32_rate / ds_rate:5.1f} | matvec err vs host f64 "
              f"{acc:.1e}", file=sys.stderr)
    return dict(ds_rate=ds_rate, f32_rate=f32_rate, acc=acc)


def bench_auto(n: int, verbose: bool):
    """Automatic layout dispatch (matrix/auto.py): on three pattern
    classes, the auto pick must match the hand-picked best layout — and
    on the reducible shuffled-banded class it must BEAT the naive
    hand-pick (GELL on the scrambled labels) by recovering the banded
    structure via RCM. Reference analogue: runtime dense/sparse dispatch
    (power_method.hpp:141-147)."""
    from pcsc_eigenvalue_solver_project_tpu.matrix.auto import from_coo

    rng = np.random.default_rng(0)
    bw = BANDWIDTH

    def banded_coo(shuffle=None):
        i = np.repeat(np.arange(n), 2 * bw + 1)
        off = np.tile(np.arange(-bw, bw + 1), n)
        j = i + off
        keep = (j >= 0) & (j < n)
        i, j = i[keep], j[keep]
        v = rng.standard_normal(len(i)).astype(np.float32)
        if shuffle is not None:
            i, j = shuffle[i], shuffle[j]
        return i, j, v

    def uniform_coo(k=6):
        i = np.repeat(np.arange(n), k)
        j = rng.integers(0, n, k * n)
        v = rng.standard_normal(k * n).astype(np.float32)
        key = i.astype(np.int64) * n + j
        _, uniq = np.unique(key, return_index=True)
        return i[uniq], j[uniq], v[uniq]

    def rate(m, nnz, lo=20, hi=220):
        x0e = m.encode_vec(jnp.ones((n,), jnp.float32))

        def run_body(mm, iters):
            def body(_, xx):
                yy = mm.matvec(xx)
                nn2 = jnp.sum(yy * yy)
                return (yy * jax.lax.rsqrt(
                    jnp.where(nn2 == 0, 1.0, nn2))).astype(xx.dtype)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x0e))

        return nnz / _marginal_time(jax.jit(run_body), (m,), lo=lo, hi=hi)

    results = {}
    cases = {
        "banded": (banded_coo(), "dia_il"),
        "shuffled_banded": (banded_coo(rng.permutation(n)), "dia_il"),
        "uniform": (uniform_coo(), "gell"),
    }
    for name, ((i, j, v), want_kind) in cases.items():
        nnz = len(i)
        auto_m = from_coo(i, j, v, (n, n), layout="auto")
        kind = type(getattr(auto_m, "inner", auto_m)).__name__
        # hand-picked: the layout a caller reading the pattern docs would
        # choose WITHOUT the RCM probe (for shuffled_banded that is GELL —
        # the structure is hidden until relabeling)
        hand_layout = "dia_il" if name == "banded" else "gell"
        hand_m = from_coo(i, j, v, (n, n), layout=hand_layout)

        def window(m):
            # the DIA-class layouts run ~1 us/step: a 20/220-iteration
            # marginal window is inside the tunnel's noise floor there
            fast = type(getattr(m, "inner", m)).__name__ == "InterleavedDIA"
            return (100, 1100) if fast else (20, 220)

        r_auto = rate(auto_m, nnz, *window(auto_m))
        r_hand = rate(hand_m, nnz, *window(hand_m))
        results[name] = dict(
            auto_kind=kind, expected_kind=want_kind,
            permuted=hasattr(auto_m, "perm"),
            auto_nnz_per_s=round(r_auto, 1),
            handpick_nnz_per_s=round(r_hand, 1),
            auto_vs_handpick=round(r_auto / r_hand, 3))
        if verbose:
            print(f"# auto {name:16s}: {kind:16s} "
                  f"auto {r_auto / 1e9:7.2f} Gnnz/s | naive hand-pick "
                  f"({hand_layout}) {r_hand / 1e9:7.2f} Gnnz/s | "
                  f"ratio {r_auto / r_hand:6.2f}", file=sys.stderr)
    return results


def bench_qr(n: int, verbose: bool):
    """Wall-clock to tolerance for the full-spectrum QR solve
    (BASELINE configs[2]: 512x512 dense real, all eigenvalues), both
    modes measured ON THE SAME DEVICE and matrix.

    The operator is a symmetric matrix with geometric spectrum
    0.9^i (adjacent-eigenvalue ratio 0.9), chosen so the baseline — the
    reference's unshifted full-Householder-QR-per-sweep iteration
    (qr_eigenvalues.hpp:69-94), here the Pallas parity kernel — genuinely
    converges; a random matrix's near-1 eigenvalue ratios would push the
    unshifted method past any budget and the ratio would be an
    extrapolation instead of a measurement. ``vs_baseline`` =
    parity_wall / accelerated_wall, both converged, both on-chip.
    """
    import pcsc_eigenvalue_solver_project_tpu as es
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
        qr_eigenvalues_pallas, qr_parity_pallas)

    rng = np.random.default_rng(0)
    tol = 3e-6

    def timed(fn):
        out = fn()          # warm / compile
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    if n > 768:
        # Beyond the in-VMEM kernels: HBM-blocked on-chip path. The
        # parity (unshifted) baseline cannot converge at this scale in
        # any budget, so the baseline is the host LAPACK eigensolver
        # run on the SAME matrix: vs_baseline = lapack_wall / onchip_wall.
        #
        # Operand honesty (VERDICT r3 task 2): the geometric 0.9^i
        # spectrum used for the <=768 parity-ratio leg underflows f32
        # beyond i ~ 980, which makes the matrix numerically low-rank and
        # trivially deflatable — flattering the blocked kernel ~20x. The
        # blocked leg therefore uses a FULL-RANK-at-f32 operand:
        # eigenvalues uniform in [1, 2] via Q diag Q^T (every adjacent
        # gap resolvable at f32, nothing underflows, no cluster at 0).
        from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_aed \
            import qr_eigenvalues_pallas_blocked_aed
        d = np.sort(rng.uniform(1.0, 2.0, n))[::-1].astype(np.float64)
        Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
        a = ((Qo * d) @ Qo.T).astype(np.float32)
        accel_wall, (eig_a, sweeps_a, conv_a) = timed(
            lambda: qr_eigenvalues_pallas_blocked_aed(a, 40 * n, tol))
        t0 = time.perf_counter()
        _ = np.linalg.eigvals(a)
        lapack_wall = time.perf_counter() - t0
        err_a = np.abs(np.sort(eig_a.real) - np.sort(d)).max()
        if verbose:
            print(f"# qr {n} (blocked, full-rank spectrum): on-chip "
                  f"{accel_wall:.2f}s ({sweeps_a} sweeps, conv={conv_a}, "
                  f"err={err_a:.1e}) | host LAPACK {lapack_wall:.2f}s",
                  file=sys.stderr)
        vs = lapack_wall / accel_wall if conv_a else 0.0
        return {"wall": accel_wall, "converged": bool(conv_a), "vs": vs,
                "baseline": "host_lapack_same_matrix",
                "spectrum": "uniform[1,2]_full_rank_f32",
                "sweeps": int(sweeps_a), "err": float(err_a)}

    # <=768: vs_baseline is the parity-kernel ratio. The operator is a
    # symmetric matrix with geometric spectrum 0.9^i (adjacent-eigenvalue
    # ratio 0.9), chosen so the baseline — the reference's unshifted
    # iteration — genuinely converges (see module docstring); at these
    # sizes 0.9^i stays far above the f32 underflow cliff that motivated
    # the full-rank operand of the blocked leg.
    d = (0.9 ** np.arange(n)).astype(np.float64)
    Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = ((Qo * d) @ Qo.T).astype(np.float32)
    budget = max(40 * int(np.log(n) * 10), 2000)

    accel_wall, (eig_a, sweeps_a, conv_a) = timed(
        lambda: qr_eigenvalues_pallas(a, 20 * n, tol))
    parity_wall, (eig_p, it_p, conv_p, maxsub) = timed(
        lambda: qr_parity_pallas(a, budget, tol))

    err_a = np.abs(np.sort(eig_a.real) - np.sort(d)).max()
    err_p = np.abs(np.sort(eig_p.real) - np.sort(d)).max()
    if verbose:
        print(f"# qr {n}: accel {accel_wall:.3f}s ({sweeps_a} sweeps, "
              f"conv={conv_a}, err={err_a:.1e}) | parity {parity_wall:.3f}s "
              f"({it_p} sweeps, conv={conv_p}, err={err_p:.1e})",
              file=sys.stderr)
    vs = parity_wall / accel_wall if (conv_a and conv_p) else 0.0
    return {"wall": accel_wall, "converged": bool(conv_a), "vs": vs,
            "baseline": "parity_kernel_same_chip",
            "spectrum": "geometric_0.9^i",
            "sweeps": int(sweeps_a), "err": float(err_a)}


def bench_qr_c64(n: int, verbose: bool):
    """Complex full-spectrum wall-clock — the reference demo's home
    dtype (main.cpp:42 runs complex<double>). Round 5: ONE
    structure-preserving embedded Hessenberg + native 2-plane AED
    sweeps (ops/pallas/hessenberg_blocked.py::hessenberg_blocked_embedded)
    replaces the two rotated-spectrum solves — measured 15.5 s at 2048
    vs 24.6 s in round 4. Error is nearest-neighbor matched
    (sort-based pairing is brittle for 2-D eigenvalue clouds) with the
    match checked to be 1:1."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_aed import (
        qr_eigenvalues_pallas_blocked_aed)
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    d = rng.uniform(1.0, 2.0, n) * np.exp(1j * rng.uniform(0, 2 * np.pi, n))
    Qo, _ = np.linalg.qr(rng.standard_normal((n, n))
                         + 1j * rng.standard_normal((n, n)))
    a = ((Qo * d) @ Qo.conj().T).astype(np.complex64)
    tol = 3e-6
    _ = qr_eigenvalues_pallas_blocked_aed(a, 40 * n, tol)   # compile
    best, eig, sweeps, conv = 1e30, None, 0, False
    for _rep in range(2):
        t0 = time.perf_counter()
        eig, sweeps, conv = qr_eigenvalues_pallas_blocked_aed(a, 40 * n, tol)
        best = min(best, time.perf_counter() - t0)
    tree = cKDTree(np.c_[d.real, d.imag])
    dist, idx = tree.query(np.c_[eig.real, eig.imag])
    counts = np.bincount(idx, minlength=n)
    ok_match = bool(counts.max() == 1) and bool((counts == 0).sum() == 0)
    t0 = time.perf_counter()
    _ = np.linalg.eigvals(a)
    lw = time.perf_counter() - t0
    if verbose:
        print(f"# qr c64 {n}: on-chip {best:.2f}s ({sweeps} sweeps, "
              f"conv={conv}, nn_err={dist.max():.1e}, 1:1={ok_match}) | "
              f"host LAPACK zgeev-class {lw:.2f}s", file=sys.stderr)
    return dict(wall=best, converged=bool(conv) and ok_match,
                err=float(dist.max()), sweeps=int(sweeps), host_wall=lw)


def bench_eigvec(n: int, verbose: bool, complex_dtype: bool = False):
    """Full-eigenpair wall-clock: on-chip Schur (blocked kernels with Q
    accumulation) + Pallas triangular back-substitution + device
    composition/normalization; only the final V transfers to host.
    ``complex_dtype`` (round 5): the complex path beyond the old 1024
    cap — embedded-Q Hessenberg + Schur-mode 2-plane sweeps."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_eig_blocked \
        import qr_eigenvalues_pallas_blocked

    rng = np.random.default_rng(0)
    if complex_dtype:
        d = rng.uniform(1.0, 2.0, n) * np.exp(1j * rng.uniform(0, 2 * np.pi, n))
        Qo, _ = np.linalg.qr(rng.standard_normal((n, n))
                             + 1j * rng.standard_normal((n, n)))
        a = ((Qo * d) @ Qo.conj().T).astype(np.complex64)
    else:
        d = np.sort(rng.uniform(1.0, 2.0, n))[::-1]
        Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
        a = ((Qo * d) @ Qo.T).astype(np.float32)
    tol = 3e-6
    _ = qr_eigenvalues_pallas_blocked(a, 40 * n, tol, compute_vectors=True)
    t0 = time.perf_counter()
    eigs, sweeps, conv, V = qr_eigenvalues_pallas_blocked(
        a, 40 * n, tol, compute_vectors=True)
    wall = time.perf_counter() - t0
    ac = a.astype(np.complex128)
    Vc = V.astype(np.complex128)
    res = np.abs(ac @ Vc - Vc * eigs[None, :].astype(np.complex128)).max() \
        / max(1.0, np.abs(a).max())
    t0 = time.perf_counter()
    _w, _v = np.linalg.eig(a)
    lapack_wall = time.perf_counter() - t0
    if verbose:
        print(f"# eigvec {n}: on-chip {wall:.2f}s (sweeps={sweeps}, "
              f"conv={conv}, residual={res:.1e}) | host LAPACK eig "
              f"{lapack_wall:.2f}s", file=sys.stderr)
    return wall, bool(conv), float(res), lapack_wall


def bench_gmres(n: int, verbose: bool):
    """Real-chip interior-shift GMRES inverse power (the near-singular
    SparseLU case the inner GMRES exists for, solve_shifted.hpp:104-115),
    at scale: an n-row banded split-complex operator with a complex shift
    placed 0.05*(1+1j) from an INTERIOR eigenvalue.

    Oracle: host scipy shift-invert Arnoldi (banded splu) — the same
    computation by the host's best sparse-direct method; its wall is the
    ``vs_baseline`` denominator... numerator: vs_baseline =
    host_wall / onchip_wall. Eigenvalue error and eigenpair residual are
    reported as SEPARATE fields (the round-4 advisor flagged overloading
    vs_baseline with an error)."""
    from pcsc_eigenvalue_solver_project_tpu import (
        ShiftedSolverOptions, shifted_inverse_power_method)
    from pcsc_eigenvalue_solver_project_tpu.matrix.split_complex import (
        SplitComplexDIA)
    from pcsc_eigenvalue_solver_project_tpu.ops.split_complex import (
        from_planes)

    rng = np.random.default_rng(0)
    offs = (-3, -1, 0, 2)
    planes = np.zeros((2, len(offs), n), np.float32)
    for d, off in enumerate(offs):
        # diagonally-dominant-with-spread class: the Jacobi-preconditioned
        # restarted GMRES (m capped at 180 by the unrolled on-chip least
        # squares) converges at n >= 4096 here; the FULL-strength
        # off-diagonal class needs m ~ n/3 and stagnates at this scale —
        # recorded honestly in the metric's operator_class field
        amp = 1.0 if off == 0 else 0.3
        planes[0, d] = amp * rng.standard_normal(n)
        planes[1, d] = amp * rng.standard_normal(n)
        if off > 0:
            planes[:, d, n - off:] = 0
        elif off < 0:
            planes[:, d, :-off] = 0
    di = offs.index(0)
    planes[0, di] += 4.0 + rng.uniform(-2, 2, n).astype(np.float32)
    sc = SplitComplexDIA(planes=jnp.asarray(planes), offsets=offs,
                         shape=(n, n))

    # host oracle + baseline wall: scipy shift-invert Arnoldi
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    rowsc, colsc, valsc = [], [], []
    pn = np.asarray(planes)
    for d, off in enumerate(offs):
        i = np.arange(max(0, -off), min(n, n - off))
        rowsc.append(i)
        colsc.append(i + off)
        valsc.append((pn[0, d] + 1j * pn[1, d])[i])
    A_sp = sp.coo_matrix((np.concatenate(valsc),
                          (np.concatenate(rowsc), np.concatenate(colsc))),
                         shape=(n, n)).tocsc()
    z0 = 4.0 + 0.3j                      # interior probe point
    t0 = time.perf_counter()
    w_orc, _ = spla.eigs(A_sp, k=1, sigma=z0, tol=1e-10)
    host_wall = time.perf_counter() - t0
    target = complex(w_orc[0])
    # offset well below the spectrum's mean spacing (~0.03 for this
    # class at 4096), so `target` IS the eigenvalue nearest the shift —
    # and the inner solve is more nearly singular, the regime the GMRES
    # path exists for; verified against a second shift-invert query
    shift = complex(target + 0.01 * (1 + 1j))
    w_chk, _ = spla.eigs(A_sp, k=1, sigma=shift, tol=1e-10)
    target = complex(w_chk[0])

    opts = ShiftedSolverOptions(shift=shift, max_iterations=60,
                                tolerance=1e-5, inner_method="gmres",
                                inner_tolerance=1e-6)
    key = jax.random.key(7)
    r = shifted_inverse_power_method(sc, opts, key=key)   # compile+warm
    _ = np.asarray(jax.device_get(r.eigenvalue))
    t0 = time.perf_counter()
    r = shifted_inverse_power_method(sc, opts, key=key)
    lam = from_planes(np.asarray(jax.device_get(r.eigenvalue)))
    # the device_get IS the sync (the axon relay's block_until_ready
    # does not block) — wall must be read after it
    wall = time.perf_counter() - t0
    err = abs(lam - target) / (1 + abs(target))
    x = np.asarray(jax.device_get(r.eigenvector))
    xc = x[0] + 1j * x[1]
    resid = float(np.abs(A_sp @ xc - lam * xc).max()
                  / max(np.abs(xc).max(), 1e-30) / (1 + abs(lam)))
    if verbose:
        print(f"# gmres n={n} backend={jax.default_backend()}: "
              f"lam={lam:.6f} target={target:.6f} conv={bool(r.converged)} "
              f"iters={int(r.iterations)} err={err:.2e} resid={resid:.2e} "
              f"wall={wall:.2f}s | host shift-invert {host_wall:.2f}s",
              file=sys.stderr)
    return dict(wall=wall, err=float(err), resid=resid,
                iters=int(r.iterations), converged=bool(r.converged),
                host_wall=host_wall)


CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json")


def _emit_and_cache(record):
    with open(CACHE, "w") as f:
        f.write(json.dumps(record))
    print(json.dumps(record))


def _watchdog(seconds: int):
    """The tunneled TPU's compile service can wedge for tens of minutes
    (see utils/timing.py docs); if measurement stalls, emit the cached
    last-good result rather than hanging the driver."""
    import signal

    def on_alarm(signum, frame):
        if os.path.exists(CACHE):
            with open(CACHE) as f:
                rec = json.load(f)
            rec["metric"] = rec["metric"] + "_cached"
            print(json.dumps(rec))
        else:
            print(json.dumps({"metric": "bench_stalled", "value": 0,
                              "unit": "none", "vs_baseline": 0}))
        os._exit(0)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--suite", default="spmv",
                    choices=["spmv", "qr", "qr_c64", "block", "complex",
                             "general", "gmres", "eigvec", "auto", "ds64"])
    ap.add_argument("--pattern", default="uniform",
                    choices=["uniform", "local"])
    ap.add_argument("--nvec", type=int, default=8)
    ap.add_argument("--nnz-per-row", type=int, default=33)
    ap.add_argument("--qr-n", type=int, default=512)
    ap.add_argument("--complex", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--watchdog", type=int, default=480)
    args = ap.parse_args()
    if args.watchdog:
        _watchdog(args.watchdog)

    if args.suite == "ds64":
        r = bench_ds64(args.n, verbose=not args.json_only)
        _emit_and_cache({
            "metric": f"spmv_power_iter_nnz_per_s_{args.n // 1000}k_ds64",
            "value": round(r["ds_rate"], 1),
            "unit": "nnz/s",
            # cost of f64-class accuracy: ratio vs the plain-f32 Pallas
            # kernel on the same operator (expected << 1 — the price of
            # the compensated arithmetic)
            "vs_baseline": round(r["ds_rate"] / r["f32_rate"], 4),
            "baseline": "plain_f32_pallas_dia_same_operator",
            "matvec_err_vs_host_f64": r["acc"],
        })
        return
    if args.suite == "auto":
        results = bench_auto(args.n, verbose=not args.json_only)
        ok = all(
            r["auto_kind"].lower()
            == ("interleaveddia" if r["expected_kind"] == "dia_il"
                else "sparsegell")
            for r in results.values())
        sh = results["shuffled_banded"]
        _emit_and_cache({
            "metric": f"auto_layout_dispatch_{args.n // 1000}k",
            # headline: the reducible case — auto (RCM -> permuted DIA)
            # vs the naive hand-pick (GELL on scrambled labels)
            "value": sh["auto_nnz_per_s"],
            "unit": "nnz/s",
            "vs_baseline": sh["auto_vs_handpick"],
            "baseline": "naive_handpick_layout_same_chip",
            "all_picks_match_expected": bool(ok),
            "cases": results,
        })
        return
    if args.suite == "general":
        results = bench_general(args.n, args.nnz_per_row,
                                verbose=not args.json_only,
                                pattern=args.pattern)
        _emit_and_cache({
            "metric": f"spmv_general_nnz_per_s_{args.n // 1000}k_"
                      f"{args.pattern}_pallas_gell",
            "value": round(results["pallas_gell"], 1),
            "unit": "nnz/s",
            "vs_baseline": round(results["pallas_gell"] / results["ell_gather"], 3),
            "bf16_values_nnz_per_s": round(results["pallas_gell_bf16"], 1),
            "bound": "vpu-compute, not HBM (docs/PERF_NOTES.md ablation)",
        })
        return
    if args.suite == "block":
        results = bench_block(args.n, args.nvec, verbose=not args.json_only)
        name, best = max(results.items(), key=lambda kv: kv[1])
        _emit_and_cache({
            "metric": f"block_spmm_nnzvec_per_s_{args.n // 1000}k_b{args.nvec}_{name}",
            "value": round(best, 1),
            "unit": "nnz*vec/s",
            "vs_baseline": round(best / results["il_block_f32"], 3),
        })
        return
    if args.suite == "complex":
        results = bench_complex(args.n, verbose=not args.json_only)
        name, best = max(results.items(), key=lambda kv: kv[1])
        _emit_and_cache({
            "metric": f"complex_spmv_nnz_per_s_{args.n // 1000}k_{name}",
            "value": round(best, 1),
            "unit": "nnz/s",
            "vs_baseline": round(best / results["il_planes_f32"], 3),
        })
        return
    if args.suite == "eigvec":
        wall, conv, res, lapack_wall = bench_eigvec(
            args.qr_n, verbose=not args.json_only,
            complex_dtype=args.complex)
        _emit_and_cache({
            "metric": f"qr_eigenpairs_{'c64_' if args.complex else ''}"
                      f"wallclock_{args.qr_n}",
            "value": round(wall, 4),
            "unit": "s",
            "vs_baseline": round(lapack_wall / wall, 3) if conv else 0.0,
            "baseline": "host_lapack_eig_same_matrix",
            "max_residual": res,
            "converged": conv,
        })
        return
    if args.suite == "gmres":
        gn = args.n if args.n != 100_000 else 4096
        r = bench_gmres(gn, verbose=not args.json_only)
        _emit_and_cache({
            "metric": f"gmres_inverse_power_onchip_n{gn}",
            "value": round(r["wall"], 3),
            "unit": "s",
            # ratio vs the host's best method for the same computation
            # (scipy banded-splu shift-invert Arnoldi on the same
            # operator); eigenvalue error and eigenpair residual are
            # separate fields, not overloaded onto vs_baseline
            "vs_baseline": round(r["host_wall"] / r["wall"], 4),
            "baseline": "host_scipy_shift_invert_arnoldi",
            "operator_class": "banded_diag_dominant_spread",
            "eig_err": round(r["err"], 12),
            "eigpair_residual": round(r["resid"], 12),
            "iterations": r["iters"],
            "converged": r["converged"],
        })
        return
    if args.suite == "qr_c64":
        r = bench_qr_c64(args.qr_n, verbose=not args.json_only)
        _emit_and_cache({
            "metric": f"qr_eigenvalues_c64_wallclock_{args.qr_n}",
            "value": round(r["wall"], 4),
            "unit": "s",
            "vs_baseline": round(r["host_wall"] / r["wall"], 3)
            if r["converged"] else 0.0,
            "baseline": "host_lapack_eigvals_same_complex_matrix",
            "sweeps": r["sweeps"],
            "nn_eig_err": r["err"],
            "converged": r["converged"],
        })
        return
    if args.suite == "qr":
        r = bench_qr(args.qr_n, verbose=not args.json_only)
        _emit_and_cache({
            "metric": f"qr_eigenvalues_wallclock_{args.qr_n}",
            "value": round(r["wall"], 4),
            "unit": "s",
            "vs_baseline": round(r["vs"], 3),
            # the two size regimes have DIFFERENT baselines — name it in
            # the record so cross-size comparisons don't conflate them
            "baseline": r["baseline"],
            "spectrum": r["spectrum"],
            "sweeps": r["sweeps"],
            "max_abs_eig_err": r["err"],
            "converged": r["converged"],
        })
        return

    results = bench_spmv(args.n, verbose=not args.json_only)
    best_name, best = max(results.items(), key=lambda kv: kv[1])
    baseline = results.get("ell_gather", results["xla_dia"])
    _emit_and_cache({
        "metric": f"spmv_power_iter_nnz_per_s_{args.n // 1000}k_{best_name}",
        "value": round(best, 1),
        "unit": "nnz/s",
        "vs_baseline": round(best / baseline, 3),
    })


if __name__ == "__main__":
    main()
