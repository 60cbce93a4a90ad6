"""BASELINE config 5 executed end-to-end: 1M-row sparse, 8-device mesh.

Runs the two mandated distributed solves on a 1,000,000-row sparse
operator over the 8-device fake CPU mesh (the SURVEY §4 stand-in for real
multi-chip hardware; the sharding/collective program is identical):

1. **Distributed power iteration** (reference hot loop
   /root/reference/src/power_method/power_method.hpp:68-91) on the
   segment-pruned GELL partition — run to CONVERGENCE at tol 1e-8.
2. **Distributed Arnoldi + QR** ("+ QR" of the config: the projected
   Hessenberg is solved by the accelerated shifted-QR stack) — top-k
   eigenvalues from a 30-vector sharded Krylov basis.

Oracle: the matrix carries a PLANTED dominant eigenvalue — row 0 holds
only its diagonal entry ``SPIKE``, so expanding det(A - lambda I) along
row 0 factors out (SPIKE - lambda): SPIKE is an exact eigenvalue, and
Gershgorin bounds every other eigenvalue well below it. Both solvers must
recover it. (A dense 1M x 1M oracle is impossible; the planted spike is
exact, not approximate.)

Emits one JSON object (written to DIST1M_r{N}.json by the caller or
--out); includes wall-clocks (fake-mesh: structure sanity), per-step comm
bytes from the static exchange plan AND the compiled HLO, and the
eigenvalue checks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SPIKE = 60.0


def build_matrix(n: int, bandwidth: int, n_far: int, seed: int = 0):
    """Banded + long-range (8 fixed segments) + boosted diagonal, with the
    planted row-0 spike eigenvalue."""
    rng = np.random.default_rng(seed)
    r_b = np.repeat(np.arange(n), 2 * bandwidth + 1)
    c_b = (r_b + np.tile(np.arange(-bandwidth, bandwidth + 1), n)).clip(0, n - 1)
    far = (rng.integers(0, 8, n * n_far) * 128
           + rng.integers(0, 128, n * n_far)).clip(0, n - 1)
    r = np.concatenate([r_b, np.repeat(np.arange(n), n_far), np.arange(n)])
    c = np.concatenate([c_b, far, np.arange(n)])
    v = np.concatenate([
        rng.standard_normal(len(r_b)) * 0.5,
        rng.standard_normal(n * n_far) * 0.5,
        np.full(n, 6.0),
    ]).astype(np.float32)
    # drop duplicates (keep first), then clear row 0 and plant the spike
    key = r.astype(np.int64) * n + c
    _, uniq = np.unique(key, return_index=True)
    r, c, v = r[uniq], c[uniq], v[uniq]
    keep = r != 0
    r, c, v = r[keep], c[keep], v[keep]
    r = np.concatenate([r, [0]])
    c = np.concatenate([c, [0]])
    v = np.concatenate([v, [SPIKE]]).astype(np.float32)
    return r, c, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_128)
    ap.add_argument("--bandwidth", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    n = args.n

    from pcsc_eigenvalue_solver_project_tpu.core.options import SolverOptions
    from pcsc_eigenvalue_solver_project_tpu.matrix.sparse import SparseCSR
    from pcsc_eigenvalue_solver_project_tpu.parallel.arnoldi import (
        distributed_arnoldi_eigenvalues)
    from pcsc_eigenvalue_solver_project_tpu.parallel.gell_pruned import (
        distributed_gell_power_pruned, partition_gell_pruned)
    from pcsc_eigenvalue_solver_project_tpu.parallel.mesh import make_row_mesh

    t0 = time.perf_counter()
    r, c, v = build_matrix(n, args.bandwidth, 2)
    nnz = len(r)
    csr = SparseCSR.from_coo(r, c, v, (n, n), dtype=np.float32)
    t_build = time.perf_counter() - t0

    mesh = make_row_mesh(8)
    t0 = time.perf_counter()
    A = partition_gell_pruned(csr, mesh)
    t_partition = time.perf_counter() - t0

    # Gershgorin bound on everything except the spike
    row_abs = np.zeros(n)
    np.add.at(row_abs, r, np.abs(v))
    bound_rest = float(row_abs[1:].max())

    # ---- distributed power iteration to convergence ----------------------
    opts = SolverOptions(max_iterations=200, tolerance=1e-8)
    t0 = time.perf_counter()
    res = distributed_gell_power_pruned(A, mesh, opts,
                                        x0=np.ones(n, np.float32))
    lam = complex(np.asarray(res.eigenvalue))
    iters = int(res.iterations)
    conv = bool(res.converged)
    t_power = time.perf_counter() - t0

    # ---- distributed Arnoldi + QR ---------------------------------------
    t0 = time.perf_counter()
    qr = distributed_arnoldi_eigenvalues(A, mesh, k=4, m=30,
                                         x0=np.ones(n, np.float32))
    t_arnoldi = time.perf_counter() - t0
    eigs = np.asarray(qr.eigenvalues)
    top = eigs[np.argmax(np.abs(eigs))]

    power_err = abs(lam - SPIKE) / SPIKE
    arnoldi_err = abs(complex(top) - SPIKE) / SPIKE
    ok = (conv and power_err < 1e-4 and arnoldi_err < 1e-4
          and bound_rest < SPIKE)

    report = dict(
        metric="distributed_1m_power_and_arnoldi",
        value=round(t_power / max(iters, 1), 4),
        unit="s_per_power_iter_fake_mesh",
        vs_baseline=1.0 if ok else 0.0,
        ok=ok,
        n=n, nnz=int(nnz), n_devices=8,
        planted_eigenvalue=SPIKE,
        gershgorin_bound_rest=round(bound_rest, 3),
        power=dict(eigenvalue=lam.real, iterations=iters, converged=conv,
                   rel_err=power_err, wall_s=round(t_power, 2)),
        arnoldi=dict(top_eigenvalue=complex(top).real, k=4, m=30,
                     rel_err=arnoldi_err, wall_s=round(t_arnoldi, 2),
                     converged=bool(qr.converged)),
        comm_bytes_per_matvec=A.comm_bytes_per_matvec,
        allgather_bytes_equiv=7 * n // 8 * 4,
        comm_reduction_vs_allgather=round(
            (7 * n // 8 * 4) / max(A.comm_bytes_per_matvec, 1), 1),
        build_s=round(t_build, 2), partition_s=round(t_partition, 2),
        tile_rows=A.tile_rows,
    )
    out = json.dumps(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    print(out)
    return report


if __name__ == "__main__":
    main()
