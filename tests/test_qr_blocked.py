"""HBM-blocked dense QR stack kernels (interpret mode on the CPU mesh).

Covers VERDICT r2 tasks 4 and 7: the blocked Hessenberg reduction
(`ops/pallas/hessenberg_blocked.py`) and the blocked Wilkinson-QR
eigenvalue iteration (`ops/pallas/qr_eig_blocked.py`) that lift the
in-VMEM kernels' n <= 768 cap. Reference semantics being preserved:
/root/reference/src/qr_method/to_hessenberg.hpp:23-80 and
qr_eigenvalues.hpp:40-108 (shifted+deflated superset per SURVEY §7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked import (
    hessenberg_blocked_planes)
from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_eig_blocked import (
    qr_eig_blocked_planes)
from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
    hessenberg_planes)


def _nn_eig_err(ea, eb):
    d = np.abs(np.asarray(ea)[:, None] - np.asarray(eb)[None, :])
    return max(d.min(axis=1).max(), d.min(axis=0).max()) \
        / max(1.0, np.abs(ea).max())


def _rand(n, kind, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    if kind == "c":
        a = a + 1j * rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    return a


@pytest.mark.parametrize("n,kind", [(33, "r"), (150, "r"), (150, "c")])
def test_hessenberg_blocked_structure_and_spectrum(n, kind):
    a = _rand(n, kind)
    planes = np.stack([a.real, a.imag]).astype(np.float32) if kind == "c" \
        else a.astype(np.float32)[None]
    out = np.asarray(hessenberg_blocked_planes(jnp.asarray(planes), n,
                                               interpret=True))
    H = out[0] + 1j * out[1] if kind == "c" else out[0]
    assert np.abs(np.tril(H, -2)).max() == 0.0  # exact zeroing pass
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)),
                      np.linalg.eigvals(H.astype(np.complex128)))
    assert err < 5e-5 * n


def test_hessenberg_blocked_matches_unblocked_kernel():
    n = 100
    a = _rand(n, "r", seed=3)
    pb = np.asarray(hessenberg_blocked_planes(
        jnp.asarray(a.astype(np.float32)[None]), n, interpret=True))[0]
    pu = np.asarray(hessenberg_planes(
        jnp.asarray(a.astype(np.float32)[None]), n, interpret=True))[0]
    # same algorithm, different op order: same Hessenberg up to f32 noise
    assert np.abs(pb - pu).max() < 5e-4 * max(1, np.abs(pu).max())


@pytest.mark.parametrize("n,kind", [(4, "r"), (33, "r"), (150, "r"),
                                    (150, "c")])
def test_qr_eig_blocked_eigenvalues(n, kind):
    a = _rand(n, kind)
    planes = np.stack([a.real, a.imag]).astype(np.float32) if kind == "c" \
        else np.stack([a, np.zeros_like(a)]).astype(np.float32)
    h = hessenberg_planes(jnp.asarray(planes), n, interpret=True)
    eig, sweeps, hi = qr_eig_blocked_planes(h, n, 40 * n + 100, 1e-6,
                                            interpret=True)
    assert int(hi) <= 1
    e = np.asarray(eig)
    ev = (e[0] + 1j * e[1])[:n]
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)), ev)
    assert err < 5e-4


@pytest.mark.slow
def test_qr_eig_blocked_multiblock_260():
    n = 260
    a = _rand(n, "r", seed=1)
    planes = np.stack([a, np.zeros_like(a)]).astype(np.float32)
    h = hessenberg_planes(jnp.asarray(planes), n, interpret=True)
    eig, sweeps, hi = qr_eig_blocked_planes(h, n, 40 * n + 100, 1e-6,
                                            interpret=True)
    assert int(hi) <= 1
    e = np.asarray(eig)
    ev = (e[0] + 1j * e[1])[:n]
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)), ev)
    assert err < 5e-4


def test_dispatch_no_cpu_fallback_for_f32_up_to_2048():
    """Pins VERDICT r2 task 4: on an accelerator backend, no f32/c64
    size <= 2048 routes to the host-CPU XLA path in accelerated mode."""
    from pcsc_eigenvalue_solver_project_tpu.solvers.qr_eigenvalues import (
        qr_dispatch)
    # 2048 complex is chip-proven (COVERAGE.md round-4 entry: c64 2048
    # full spectrum on the blocked+AED path), not just dispatch-pinned
    for n in (8, 256, 768, 769, 1024, 2048, 3072):
        for dt in (np.float32, np.complex64):
            eng = qr_dispatch(n, dt, backend="tpu")
            assert eng in ("pallas_vmem", "pallas_blocked")
            if n > 768:
                assert eng == "pallas_blocked"
    # f64/c128 keep the XLA path; CPU backend keeps the XLA path
    assert qr_dispatch(512, np.float64, backend="tpu") == "xla"
    assert qr_dispatch(512, np.complex128, backend="tpu") == "xla"
    assert qr_dispatch(512, np.float32, backend="cpu") == "xla"


def test_qr_eig_blocked_trivial_sizes():
    # n = 1: single eigenvalue, no sweeps needed
    planes = np.zeros((2, 1, 1), np.float32)
    planes[0, 0, 0] = 3.5
    eig, sweeps, hi = qr_eig_blocked_planes(jnp.asarray(planes), 1, 10,
                                            1e-6, interpret=True)
    assert int(hi) <= 1
    assert abs(float(np.asarray(eig)[0][0]) - 3.5) < 1e-6


def test_hessenberg_blocked_q_accumulation():
    n = 150
    rng = np.random.default_rng(5)
    a = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(np.float32)
    h, q = hessenberg_blocked_planes(jnp.asarray(a[None]), n,
                                     interpret=True, accumulate_q=True)
    H, Q = np.asarray(h)[0], np.asarray(q)[0]
    assert np.abs(Q.T @ Q - np.eye(n)).max() < 1e-4
    assert np.abs(Q @ H @ Q.T - a).max() < 1e-4


@pytest.mark.parametrize("kind", ["r", "c"])
def test_qr_eig_blocked_eigenvectors(kind):
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_eig_blocked import (
        qr_eigenvalues_pallas_blocked)
    n = 150
    a = _rand(n, kind, seed=7)
    eigs, sweeps, conv, V = qr_eigenvalues_pallas_blocked(
        a, 40 * n, 1e-6, interpret=True, compute_vectors=True)
    assert conv
    R = a.astype(np.complex128) @ V - V * eigs[None, :]
    assert np.abs(R).max() < 5e-3


@pytest.mark.slow
@pytest.mark.parametrize("n", [119, 121, 128, 129, 241])
def test_qr_eig_blocked_block_boundary_sizes(n):
    """Block stride is 120 with 136-row windows anchored at 8-aligned
    bases: sizes straddling block boundaries are the risky cases."""
    a = _rand(n, "r", seed=n)
    planes = np.stack([a, np.zeros_like(a)]).astype(np.float32)
    h = hessenberg_planes(jnp.asarray(planes), n, interpret=True)
    eig, sweeps, hi = qr_eig_blocked_planes(h, n, 40 * n + 100, 1e-6,
                                            interpret=True)
    assert int(hi) <= 1
    e = np.asarray(eig)
    ev = (e[0] + 1j * e[1])[:n]
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)), ev)
    assert err < 5e-4


@pytest.mark.slow
@pytest.mark.parametrize("n", [65, 127, 129, 193])
def test_hessenberg_blocked_panel_boundary_sizes(n):
    """Panels are 64 columns with 128-aligned DMA bases: sizes around
    panel/DMA boundaries."""
    a = _rand(n, "r", seed=100 + n)
    out = np.asarray(hessenberg_blocked_planes(
        jnp.asarray(a.astype(np.float32)[None]), n, interpret=True))[0]
    assert np.abs(np.tril(out, -2)).max() == 0.0
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)),
                      np.linalg.eigvals(out.astype(np.complex128)))
    assert err < 5e-5 * n


def test_phase_split_matches_monolithic_spectrum():
    """The phase-split blocked Hessenberg (round 4: per-panel kernel
    pairs that keep the remote compiler's per-instance HIGHEST-precision
    operand splits under budget) is a valid reduction: exact Hessenberg
    structure, spectrum preserved, Q similarity when accumulating."""
    rng = np.random.default_rng(0)
    n = 150
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64) / np.sqrt(n)
    planes = jnp.asarray(np.stack([a.real, a.imag]).astype(np.float32))
    h, q = hessenberg_blocked_planes(planes, n, interpret=True,
                                     phase_split=True, accumulate_q=True)
    h, q = np.asarray(h), np.asarray(q)
    H = h[0] + 1j * h[1]
    Q = q[0] + 1j * q[1]
    assert np.abs(np.tril(H, -2)).max() == 0.0
    assert np.abs(Q @ H @ Q.conj().T - a).max() < 1e-4
    assert np.abs(Q.conj().T @ Q - np.eye(n)).max() < 1e-5
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)),
                      np.linalg.eigvals(H.astype(np.complex128)))
    assert err < 5e-5 * n


def test_phase_split_chunked_matches_unchunked():
    """Round-5 per-phase sub-splitting: with ``chunk`` set, every
    np_-operand matmul in the phase kernels runs as a fori over
    fixed-size chunks (static instance splits bounded independent of
    np_ — the mitigation that lifts the real path past the 4096
    compile ceiling to 8192). Numerics must match the unchunked
    phase-split path to f32 reassociation noise, with exact structure
    and a valid Q similarity."""
    rng = np.random.default_rng(1)
    n = 300
    a = rng.standard_normal((n, n)).astype(np.float32)
    planes = jnp.asarray(a)[None]
    h_ref = np.asarray(hessenberg_blocked_planes(
        planes, n, interpret=True, phase_split=True, nb=32, slab_r=64))[0]
    h_ch, q_ch = hessenberg_blocked_planes(
        planes, n, interpret=True, phase_split=True, nb=32, slab_r=64,
        chunk=128, accumulate_q=True)
    h_ch, q_ch = np.asarray(h_ch)[0], np.asarray(q_ch)[0]
    assert np.abs(np.tril(h_ch, -2)).max() == 0.0
    assert np.abs(h_ch - h_ref[:h_ch.shape[0], :h_ch.shape[1]]).max() < 1e-2
    assert np.abs(q_ch.T @ q_ch - np.eye(n)).max() < 1e-5
    assert np.abs(q_ch @ h_ch @ q_ch.T - a).max() < 1e-4
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)),
                      np.linalg.eigvals(h_ch.astype(np.complex128)))
    assert err < 5e-5 * n


def test_phase_split_chunk_validation():
    planes = jnp.zeros((1, 300, 300), jnp.float32)
    with pytest.raises(ValueError):
        hessenberg_blocked_planes(planes, 300, interpret=True,
                                  phase_split=True, chunk=100)  # not %128
    with pytest.raises(ValueError):
        hessenberg_blocked_planes(
            jnp.zeros((2, 300, 300), jnp.float32), 300, interpret=True,
            phase_split=True, chunk=128)   # 2-plane unsupported


def test_embedded_hessenberg_structure_and_spectrum():
    """Round-5 complex path: the structure-preserving embedded reduction
    (complex paired-column reflectors on the real 2n x 2n embedding,
    hessenberg_blocked_embedded) produces exactly the complex Hessenberg
    planes — exact structure, spectrum preserved, consistent with the
    2-plane blocked path up to f32 reassociation of the reflector
    chain."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked \
        import hessenberg_blocked_embedded
    rng = np.random.default_rng(7)
    n = 200
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64) / np.sqrt(n)
    planes = jnp.asarray(np.stack([a.real, a.imag]).astype(np.float32))
    h = np.asarray(hessenberg_blocked_embedded(planes, n, interpret=True,
                                               chunk=128))
    H = h[0] + 1j * h[1]
    assert np.abs(np.tril(H, -2)).max() == 0.0
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)),
                      np.linalg.eigvals(H.astype(np.complex128)))
    assert err < 5e-5 * n


def test_embedded_hessenberg_real_input_reduces_to_real():
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked \
        import hessenberg_blocked_embedded
    rng = np.random.default_rng(8)
    n = 150
    a = rng.standard_normal((n, n)).astype(np.float32)
    planes = jnp.asarray(np.stack([a, np.zeros_like(a)]))
    h = np.asarray(hessenberg_blocked_embedded(planes, n, interpret=True,
                                               chunk=128))
    assert np.abs(h[1]).max() < 1e-5          # imaginary plane stays zero
    err = _nn_eig_err(np.linalg.eigvals(a.astype(np.complex128)),
                      np.linalg.eigvals(h[0].astype(np.complex128)))
    assert err < 5e-5 * n


def test_embedded_hessenberg_q_accumulation():
    """Round-5: accumulate_q through the embedded reduction — Q stays an
    embedding (phase C's real update is embed(Q(I - V T V^H))), so the
    complex Q planes satisfy A = Q H Q^H and unlock on-chip complex
    eigenpairs beyond the old n=1024 cap."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked \
        import hessenberg_blocked_embedded
    rng = np.random.default_rng(9)
    n = 150
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64) / np.sqrt(n)
    planes = jnp.asarray(np.stack([a.real, a.imag]).astype(np.float32))
    h, q = hessenberg_blocked_embedded(planes, n, interpret=True,
                                       chunk=128, accumulate_q=True)
    h, q = np.asarray(h), np.asarray(q)
    H = h[0] + 1j * h[1]
    Q = q[0] + 1j * q[1]
    assert np.abs(np.tril(H, -2)).max() == 0.0
    assert np.abs(Q.conj().T @ Q - np.eye(n)).max() < 1e-5
    assert np.abs(Q @ H @ Q.conj().T - a).max() < 1e-4
