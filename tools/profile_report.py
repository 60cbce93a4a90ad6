"""Real-chip profile artifact (VERDICT r2 task 8).

Produces PROFILE_r03.json with, for the two flagship kernels:
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
        "jax_profiler_trace": try_trace(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE_r03.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
