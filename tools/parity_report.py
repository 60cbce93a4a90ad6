"""Parity runner — executes the reference's test cases and the shipped data
files against this framework and emits a JSON report.

The cases are transcriptions of the reference's five GTest suites
(SURVEY.md §4) plus the demo flow (main.cpp). For each case we record the
computed quantity, the oracle (analytic value or numpy), the error, and
whether it is inside the reference's own tolerance envelope (BASELINE.md).

Run: python tools/parity_report.py [--out parity.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pcsc_eigenvalue_solver_project_tpu as es  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
KEY = jax.random.key(0)

REPORT = []


def case(name, computed, oracle, tol, source):
    err = float(abs(complex(computed) - complex(oracle)))
    denom = max(abs(complex(oracle)), 1.0)
    ok = err / denom <= tol
    REPORT.append(dict(case=name, computed=str(complex(computed)),
                       oracle=str(complex(oracle)), rel_error=err / denom,
                       tolerance=tol, within_tolerance=bool(ok), source=source))
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # --- power method (power_method_test.cpp) ---
    m = es.DenseMatrix.from_array(np.diag([2.0, 1.0]))
    r = es.power_method(m, es.SolverOptions(tolerance=1e-10), key=KEY)
    case("power/dense_diag_2_1", r.eigenvalue, 2.0, 1e-5,
         "power_method_test.cpp:38-57 (tol 1e-5)")

    m = es.SparseCSR.from_coo([0, 0, 1, 2], [0, 1, 1, 2], [3.0, 1.0, 1.0, 2.0], (3, 3))
    r = es.power_method(m, es.SolverOptions(tolerance=1e-10), key=KEY)
    case("power/sparse_upper_tri", r.eigenvalue, 3.0, 1e-6,
         "power_method_test.cpp:62-83 (tol 1e-6)")

    # --- shifted inverse power (shifted_inverse_power_method_test.cpp) ---
    m = es.DenseMatrix.from_array(np.diag([2.0, 5.0]))
    r = es.shifted_inverse_power_method(m, es.ShiftedSolverOptions(shift=1.9), key=KEY)
    case("inverse/shift_1.9_to_2", r.eigenvalue, 2.0, 1e-5,
         "shifted_inverse_power_method_test.cpp:38-60")
    r = es.shifted_inverse_power_method(m, es.ShiftedSolverOptions(shift=4.9), key=KEY)
    case("inverse/shift_4.9_to_5", r.eigenvalue, 5.0, 1e-5,
         "shifted_inverse_power_method_test.cpp:62-83")
    m = es.SparseCSR.from_coo([0, 1, 2], [0, 1, 2], [1.0, 3.0, 10.0], (3, 3))
    r = es.shifted_inverse_power_method(m, es.ShiftedSolverOptions(shift=2.9), key=KEY)
    case("inverse/sparse_shift_2.9_to_3", r.eigenvalue, 3.0, 1e-5,
         "shifted_inverse_power_method_test.cpp:88-110")

    # --- solve_shifted (solve_shifted_test.cpp residual contract) ---
    a = np.array([[3.0, 1.0], [1.0, 2.0]])
    b = np.array([1.0, 0.0])
    x = np.asarray(es.solve_shifted(es.DenseMatrix.from_array(a), 0.7, b))
    resid = np.linalg.norm((a - 0.7 * np.eye(2)) @ x - b)
    REPORT.append(dict(case="solve_shifted/dense_residual", computed=float(resid),
                       oracle=0.0, rel_error=float(resid), tolerance=1e-10,
                       within_tolerance=bool(resid <= 1e-10),
                       source="solve_shifted_test.cpp:19 (resid <= 1e-10)"))

    # --- QR (qr_algorithms_test.cpp) ---
    a = np.array([[2.0, 1.0], [1.0, 2.0]])
    r = es.qr_eigenvalues(es.DenseMatrix.from_array(a))
    got = np.sort(np.asarray(r.eigenvalues).real)
    for v, o in zip(got, [1.0, 3.0]):
        case(f"qr/sym2x2_eig_{o}", v, o, 1e-8, "qr_algorithms_test.cpp:265-266")

    # Hessenberg spectrum preservation vs numpy (Eigen::EigenSolver analogue)
    rng = np.random.default_rng(1)
    a = rng.random((5, 5))
    H = np.asarray(es.to_hessenberg(es.DenseMatrix.from_array(a)))
    d = 0.0
    exact = sorted(np.linalg.eigvals(a), key=lambda z: (z.real, z.imag))
    got = sorted(np.linalg.eigvals(H), key=lambda z: (z.real, z.imag))
    d = max(abs(x - y) for x, y in zip(exact, got))
    REPORT.append(dict(case="qr/hessenberg_spectrum", computed=float(d), oracle=0.0,
                       rel_error=float(d), tolerance=1e-8,
                       within_tolerance=bool(d <= 1e-8),
                       source="qr_algorithms_test.cpp:94-136"))

    # --- demo data files (main.cpp flow) ---
    A = es.read_matrix_from_file(os.path.join(DATA, "A.txt"), np.complex128)
    B = es.read_matrix_from_file(os.path.join(DATA, "B.txt"), np.complex128)
    r = es.power_method(A, es.SolverOptions(tolerance=1e-10), key=KEY)
    dom = max(np.linalg.eigvals(np.asarray(A.array)), key=abs)
    case("demo/power_A", r.eigenvalue, dom, 1e-6, "main.cpp:50-68 + numpy oracle")
    r = es.power_method(B, es.SolverOptions(tolerance=1e-10), key=KEY)
    dom = max(np.linalg.eigvals(np.asarray(B.to_dense())), key=abs)
    case("demo/power_B", r.eigenvalue, dom, 1e-6, "main.cpp:50-68 + numpy oracle")
    r = es.shifted_inverse_power_method(
        A, es.ShiftedSolverOptions(shift=3.1, tolerance=1e-12), key=KEY)
    eigs = np.linalg.eigvals(np.asarray(A.array))
    near = min(eigs, key=lambda z: abs(z - 3.1))
    case("demo/inverse_A_3.1", r.eigenvalue, near, 1e-8, "main.cpp:71-97")
    r = es.shifted_inverse_power_method(
        B, es.ShiftedSolverOptions(shift=2.3, tolerance=1e-12), key=KEY)
    eigs = np.linalg.eigvals(np.asarray(B.to_dense()))
    near = min(eigs, key=lambda z: abs(z - 2.3))
    case("demo/inverse_B_2.3", r.eigenvalue, near, 1e-8, "main.cpp:71-97")
    qr = es.qr_eigenvalues(A, es.SolverOptions())
    got = sorted(np.asarray(qr.eigenvalues), key=lambda z: (z.real, z.imag))
    exact = sorted(np.linalg.eigvals(np.asarray(A.array)),
                   key=lambda z: (z.real, z.imag))
    d = max(abs(x - y) for x, y in zip(exact, got))
    REPORT.append(dict(case="demo/qr_A", computed=float(d), oracle=0.0,
                       rel_error=float(d), tolerance=1e-8,
                       within_tolerance=bool(d <= 1e-8), source="main.cpp:123"))

    n_ok = sum(1 for r in REPORT if r["within_tolerance"])
    summary = dict(total=len(REPORT), within_tolerance=n_ok,
                   all_pass=n_ok == len(REPORT), cases=REPORT)
    text = json.dumps(summary, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text if not args.out else
          f"parity: {n_ok}/{len(REPORT)} within reference tolerances -> {args.out}")
    return 0 if summary["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
