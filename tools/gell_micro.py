"""Micro-ablation of the GELL kernel on the real chip: which stage eats
the cycles? Times the full kernel at several n (chunk counts) and with
stages ablated (scan off, invert replaced by raw sum, gather replaced by
chunk-0 only). Numbers guide the roofline push (VERDICT r2 task 1)."""

import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pcsc_eigenvalue_solver_project_tpu.ops.pallas import gell_spmv as G

LANES = 128


def make_pack(n, nnz_per_row=33, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = rng.integers(0, n, n * nnz_per_row)
    vals = rng.standard_normal(n * nnz_per_row).astype(np.float32)
    key = rows.astype(np.int64) * n + cols
    _, uniq = np.unique(key, return_index=True)
    rows, cols, vals = rows[uniq], cols[uniq], vals[uniq]
    return G.pack_gell(rows, cols, vals, (n, n)), len(rows)


def marginal(run, lo=20, hi=220, reps=3):
    float(run(lo)); float(run(hi))
    t_lo, t_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(lo)); t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run(hi)); t_hi.append(time.perf_counter() - t0)
    return max((min(t_hi) - min(t_lo)) / (hi - lo), 1e-12)


def ablated_kernel(seg_ref, val_ref, inv_ref, xt_ref, out_ref, *,
                   n_chunks, ng, scan_steps, mode):
    seg, word, bits = G._decode_seg(seg_ref[0])
    if mode == "nogather":
        t = xt_ref[0]  # skip gather entirely: one VMEM read
    elif mode == "onechunk":
        s_lo = seg & (LANES - 1)
        t = jnp.take_along_axis(xt_ref[0], s_lo, axis=1)
    elif mode == "mxu_gather":
        # VERDICT r3 task 6 probe: one-hot-contraction gather — trade the
        # VPU mask/select budget for MXU matmuls. Per chunk, build the
        # per-lane (s, k) selection matrix and contract
        # t[l, k] = sum_s xt[c][l, s] * onehot[l, s, k] as a 128-batched
        # (1 x 128) @ (128 x 128) bf16 matmul. The one-hot CONSTRUCTION
        # is counted (it is unavoidable: precomputing it at pack time
        # would cost 128x the seg-word HBM bytes).
        s_lo = seg & (LANES - 1)
        s_hi = seg >> 7
        siota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES, LANES),
                                         1)
        t = jnp.zeros((LANES, LANES), jnp.float32)
        for c in range(n_chunks):
            oh = jnp.logical_and(s_lo[:, None, :] == siota,
                                 (s_hi == c)[:, None, :]) \
                .astype(jnp.bfloat16)
            tc = jax.lax.dot_general(
                xt_ref[c].astype(jnp.bfloat16)[:, None, :], oh,
                ((((2,), (1,))), (((0,), (0,)))),
                preferred_element_type=jnp.float32)
            t = t + tc[:, 0, :]
    else:
        t = G._gather_chunks(seg, xt_ref, n_chunks)
    p = val_ref[0].astype(jnp.float32) * t
    if mode != "noscan" and scan_steps:
        p = G._scan_runs(p, word, bits, scan_steps,
                         lambda q, k: pltpu.roll(q, LANES - k, 1))
    if mode == "noinvert":
        out_ref[0] = jnp.sum(p.reshape(8, 16, LANES), axis=1) * jnp.float32(ng)
        return
    out_ref[0] = G._invert_to_rows(p, inv_ref, ng)


def run_mode(pack, n, mode):
    n_chunks, ng = pack.n_chunks, pack.ng
    n_tiles = pack.seg_packed.shape[0]
    out_rows = 8 * ng if mode != "noinvert" else 8

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(seg, val, inv, iters):
        xp = jnp.ones((n_chunks * LANES * LANES,), jnp.float32)
        x_t = xp.reshape(-1, LANES).T.reshape(LANES, n_chunks, LANES).transpose(1, 0, 2)

        def body(i, acc):
            out = pl.pallas_call(
                functools.partial(ablated_kernel, n_chunks=n_chunks, ng=ng,
                                  scan_steps=pack.scan_steps, mode=mode),
                out_shape=jax.ShapeDtypeStruct((n_tiles, out_rows, LANES), jnp.float32),
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ng * LANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, out_rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            )(seg, val, inv, x_t + acc * 0)
            return acc + jnp.sum(out[0])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return lambda iters: run(pack.seg_packed, pack.val, pack.inv, iters)


def main():
    for n in (16384, 100_000):
        pack, nnz = make_pack(n)
        print(f"n={n} tiles={pack.seg_packed.shape[0]} chunks={pack.n_chunks} "
              f"ng={pack.ng} scan={pack.scan_steps} nnz={nnz}", file=sys.stderr)
        for mode in ("full", "noscan", "noinvert", "onechunk", "nogather",
                     "mxu_gather"):
            dt = marginal(run_mode(pack, n, mode))
            per_tile = dt / pack.seg_packed.shape[0]
            print(f"  {mode:10s} {nnz/dt/1e9:8.2f} Gnnz/s   {per_tile*1e9:7.0f} ns/tile",
                  file=sys.stderr)
        # bf16 values
        pb = pack.with_values_dtype(jnp.bfloat16)
        dt = marginal(run_mode(pb, n, "full"))
        print(f"  {'full-bf16':10s} {nnz/dt/1e9:8.2f} Gnnz/s", file=sys.stderr)


if __name__ == "__main__":
    main()
