"""Real-chip profile artifact (VERDICT r2 task 8; r3 task 9 adds the
blocked-QR sweep leg with a bytes/duty breakdown and AED economics).

Produces PROFILE_r{ROUND}.json (see the ROUND constant below) with,
for the two flagship kernels:
- marginal step time on the real chip (scalar-readback marginal timing —
  the only honest clock through the axon relay, utils/timing.py),
- exact static HBM bytes per step from the operand layouts,
- the implied HBM bandwidth and its fraction of the ~819 GB/s v5e peak
  ("memory duty cycle"),
- a VPU lane-op estimate per nnz for the GELL kernel (which the ablation
  in tools/gell_micro.py shows is compute-bound, docs/PERF_NOTES.md).

It also attempts a jax.profiler device trace around one step; on the
tunneled axon backend device traces may be unavailable — the artifact
records whether the trace was captured and where.

Verifies the round-2 claim "DIA traffic = vals + x + y" against the
measured bandwidth: if the implied bandwidth exceeded peak, the byte
model would be wrong.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcsc_eigenvalue_solver_project_tpu.utils.timing import marginal_loop_time

ROUND = "05"
HBM_PEAK_GBS = 819.0   # v5e spec
N = 100_000
BANDWIDTH = 16


def dia_leg():
    from pcsc_eigenvalue_solver_project_tpu.models.generators import banded_full
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.dia_spmv import (
        dia_matvec_il, interleave_vec)

    dia = banded_full(N, bandwidth=BANDWIDTH, dtype=np.float32, seed=0)
    il = dia.interleaved()
    x0 = interleave_vec(jnp.ones((N,), jnp.float32), il.R)

    def run(v, iters):
        def body(_, xx):
            yy = dia_matvec_il(v, dia.offsets, xx, force="pallas",
                               tile_s=il.tile_s)
            nn2 = jnp.sum(yy * yy)
            return (yy * jax.lax.rsqrt(jnp.where(nn2 == 0, 1.0, nn2))
                    ).astype(xx.dtype)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))

    runj = jax.jit(run, static_argnames=())
    dt = marginal_loop_time(runj, (il.data_il,))
    # traffic model: vals + x + y once each per matvec
    vals_b = il.data_il.size * 4
    vec_b = x0.size * 4
    bytes_per_step = vals_b + 2 * vec_b
    return {
        "step_s": dt,
        "nnz_per_s": dia.nnz / dt,
        "bytes_per_step_model": int(bytes_per_step),
        "implied_gbs": bytes_per_step / dt / 1e9,
        "hbm_duty": bytes_per_step / dt / 1e9 / HBM_PEAK_GBS,
        "model_consistent": bool(bytes_per_step / dt / 1e9 <= HBM_PEAK_GBS),
    }


def gell_leg():
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.gell_spmv import (
        gell_matvec, pack_gell)

    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(N), 33)
    cols = rng.integers(0, N, N * 33)
    vals = rng.standard_normal(N * 33).astype(np.float32)
    key = rows.astype(np.int64) * N + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols, vals = rows[uniq], cols[uniq], vals[uniq]
    pack = pack_gell(rows, cols, vals, (N, N))
    nnz = len(rows)
    x0 = jnp.ones((N,), jnp.float32)

    def run(p, iters):
        def body(_, xx):
            yy = gell_matvec(p, xx)
            nn2 = jnp.sum(yy * yy)
            return yy * jax.lax.rsqrt(jnp.where(nn2 == 0, 1.0, nn2))
        return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))

    runj = jax.jit(run, static_argnames=())
    dt = marginal_loop_time(runj, (pack,), lo=20, hi=220)
    n_tiles = pack.seg_packed.shape[0]
    bytes_per_step = (pack.seg_packed.size * 2 + pack.val.size * 4
                      + pack.inv.size * 1 + 2 * x0.size * 4)
    vpu_lane_ops_per_s = 128 * 8 * 0.94e9   # one 8x128 VPU @ 0.94 GHz
    lane_ops_per_nnz = dt * vpu_lane_ops_per_s / nnz
    return {
        "step_s": dt,
        "nnz_per_s": nnz / dt,
        "bytes_per_step_model": int(bytes_per_step),
        "implied_gbs": bytes_per_step / dt / 1e9,
        "hbm_duty": bytes_per_step / dt / 1e9 / HBM_PEAK_GBS,
        "implied_vpu_lane_ops_per_nnz": lane_ops_per_nnz,
        "bound": "vpu-compute (see docs/PERF_NOTES.md ablation)",
    }


def blocked_qr_leg():
    """One blocked Wilkinson sweep at n=2048: marginal wall, exact DMA
    byte model, HBM duty, and the AED round economics (VERDICT r3
    task 9). The byte model mirrors qr_eig_blocked._qr_blocked_kernel:
    per 120-rotation block, window in+out, left slab chunks over cols
    [b128+256, hi), right row chunks over rows [0, b8+136), and the
    cache-refresh window re-read."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked \
        import hessenberg_blocked_planes
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_eig_blocked \
        import _BS, _RC, _SC, _WC, _WR, pad_for_blocked, qr_eig_blocked_step
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_aed import (
        _aed_round, qr_eig_blocked_aed_planes)

    n = 2048
    rng = np.random.default_rng(0)
    d = np.sort(rng.uniform(1.0, 2.0, n))[::-1]
    Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = ((Qo * d) @ Qo.T).astype(np.float32)
    tol = jnp.asarray(3e-6, jnp.float32)
    h = hessenberg_blocked_planes(jnp.asarray(a[None]), n)
    h = jnp.concatenate([h, jnp.zeros_like(h)])
    p0, np_ = pad_for_blocked(h)
    p0 = p0 + 0.0   # device master copy (steps donate their input, so
    #                 each run works on an on-device clone — a host
    #                 round-trip here swamps the marginal timing)
    p0.block_until_ready()
    nv = jnp.asarray(n, jnp.int32)

    def run(budget):
        p = p0 + 0.0    # on-device copy
        int(jnp.sum(p[0, 0, :8]))  # sync the copy out of the timed region
        t0 = time.perf_counter()
        p, eig, sw, hi = qr_eig_blocked_step(
            p, nv, jnp.asarray(budget, jnp.int32), tol)
        sw = int(sw)    # scalar readback = the only honest sync here
        return time.perf_counter() - t0, sw

    run(4)  # compile + warm
    run(24)
    t_lo = min(run(4)[0] for _ in range(3))
    t_hi = min(run(24)[0] for _ in range(3))
    per_sweep = max((t_hi - t_lo) / 20, 1e-9)

    # exact byte model for one sweep at hi = n (2 planes, f32, rw)
    hi = n
    nblk = (hi - 1 + _BS - 1) // _BS
    by = 0
    for bi in range(nblk):
        b8 = bi * _BS
        b128 = (b8 // 128) * 128
        by += 2 * 2 * _WR * _WC * 4 * 2          # window in+out (left)
        nch = max(hi - (b128 + _WC) + _SC - 1, 0) // _SC
        by += 2 * 2 * _WR * (nch * _SC) * 4 * 2  # left slabs rw
        nrc = (b8 + _WR + _RC - 1) // _RC
        by += 2 * 2 * (nrc * _RC) * _WC * 4 * 2  # right chunks rw
        by += 2 * _WR * _WC * 4                  # cache-refresh re-read
    duty = by / per_sweep / (HBM_PEAK_GBS * 1e9)

    # AED round cost at full window (w=256) + full-solve economics
    p = p0 + 0.0
    p, eig, sw, hi_j = qr_eig_blocked_step(p, nv, jnp.asarray(10, jnp.int32), tol)
    hi_i = int(hi_j)
    out = _aed_round(p, jnp.asarray(hi_i, jnp.int32), tol, w=256)  # compile
    int(out[1])
    p = p0 + 0.0
    p, eig, sw, hi_j = qr_eig_blocked_step(p, nv, jnp.asarray(10, jnp.int32), tol)
    hi_i = int(hi_j)
    t0 = time.perf_counter()
    p2, dd, hi_w = _aed_round(p, jnp.asarray(hi_i, jnp.int32), tol, w=256)[:3]
    int(dd)   # scalar readback sync
    aed_wall = time.perf_counter() - t0

    qr_eig_blocked_aed_planes(h, n, 40 * n, 3e-6)   # warm
    t0 = time.perf_counter()
    eigv, sweeps, hi_f = qr_eig_blocked_aed_planes(h, n, 40 * n, 3e-6)
    aed_solve_wall = time.perf_counter() - t0
    err = float(np.abs(np.sort(np.asarray(eigv)[0]) - np.sort(d)).max())

    return {
        "n": n,
        "per_sweep_s_full_window": per_sweep,
        "sweep_bytes_model": by,
        "implied_gbs": by / per_sweep / 1e9,
        "hbm_duty": duty,
        "note": ("duty << 1 means the sweep is bound by the sequential "
                 "rotation generation (VPU) and per-block DMA sync, not "
                 "HBM traffic — the r3 '65% traffic bound' guess was "
                 "wrong; see PERF_NOTES round-4 section"),
        "aed_round_s_w256": aed_wall,
        "aed_full_solve_s": aed_solve_wall,
        "aed_full_solve_sweeps": int(sweeps),
        "aed_converged": bool(int(hi_f) <= 1),
        "aed_eig_err": err,
        "r3_plain_blocked_reference": "~11-12 s / ~4.6K sweeps (generic spectrum, docs/PERF_NOTES.md)",
    }


def try_trace():
    """Attempt one jax.profiler device trace around a tiny step."""
    out_dir = "/tmp/jaxtrace_r03"
    try:
        x = jnp.ones((1024, 1024), jnp.float32)
        f = jax.jit(lambda a: (a @ a).sum())
        float(f(x))
        jax.profiler.start_trace(out_dir)
        float(f(x))
        jax.profiler.stop_trace()
        files = glob.glob(os.path.join(out_dir, "**", "*"), recursive=True)
        files = [f for f in files if os.path.isfile(f)]
        return {"captured": len(files) > 0,
                "n_files": len(files),
                "total_bytes": int(sum(os.path.getsize(f) for f in files)),
                "dir": out_dir}
    except Exception as e:  # relay backends may not support device tracing
        return {"captured": False, "error": str(e)[:200]}


def main():
    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "hbm_peak_gbs_assumed": HBM_PEAK_GBS,
        "dia_interleaved_power_step_100k": dia_leg(),
        "gell_general_power_step_100k": gell_leg(),
        "blocked_qr_sweep_2048": blocked_qr_leg(),
        "jax_profiler_trace": try_trace(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r%s.json" % ROUND)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
