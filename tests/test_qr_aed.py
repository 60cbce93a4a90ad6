"""Aggressive early deflation for the HBM-blocked QR (interpret mode).

VERDICT r3 task 1: AED rounds (windowed in-VMEM Schur, spike-based bulk
deflation, re-Hessenberg writeback, Ritz-value shift cycling) composed
with the blocked sweep kernel. Semantics generalized from
/root/reference/src/qr_method/qr_eigenvalues.hpp:40-108 — eigenvalue
outputs must match the reference envelope; iteration/deflation contracts
are the shifted+deflated superset of SURVEY §7 step 5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked import (
    hessenberg_blocked_planes)
from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_aed import (
    _aed_round, qr_eig_blocked_aed_planes, qr_eigenvalues_pallas_blocked_aed)
from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_eig_blocked import (
    pad_for_blocked)


def _nn_eig_err(ea, eb):
    d = np.abs(np.asarray(ea)[:, None] - np.asarray(eb)[None, :])
    return max(d.min(axis=1).max(), d.min(axis=0).max()) \
        / max(1.0, np.abs(ea).max())


def test_aed_full_rank_spectrum_and_sweep_cut():
    """Full-rank uniform-[1,2] spectrum (nothing trivially deflatable):
    AED converges well under the ~2-sweeps-per-eigenvalue cost of the
    plain Wilkinson iteration."""
    n = 220
    rng = np.random.default_rng(0)
    d = np.sort(rng.uniform(1.0, 2.0, n))[::-1]
    Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = ((Qo * d) @ Qo.T).astype(np.float32)
    eigs, sweeps, conv = qr_eigenvalues_pallas_blocked_aed(
        a, 40 * n, 3e-6, w=64, sweeps_per_round=8, interpret=True)
    assert conv
    assert np.abs(np.sort(eigs.real) - np.sort(d)).max() < 1e-4
    assert np.abs(eigs.imag).max() < 1e-4
    # the sweep cut is the point: plain single-shift needs ~2n sweeps
    assert sweeps < n


def test_aed_complex_spectrum():
    n = 150
    rng = np.random.default_rng(3)
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64) / np.sqrt(n)
    eigs, sweeps, conv = qr_eigenvalues_pallas_blocked_aed(
        a, 40 * n, 3e-6, w=64, sweeps_per_round=8, interpret=True)
    assert conv
    ref = np.linalg.eigvals(a.astype(np.complex128))
    assert _nn_eig_err(ref, eigs) < 5e-4


def test_aed_round_preserves_spectrum_and_hessenberg():
    """One _aed_round is a similarity of the live block: eigenvalues
    unchanged, structure stays exactly Hessenberg."""
    n = 200
    w = 64
    rng = np.random.default_rng(1)
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    h = hessenberg_blocked_planes(jnp.asarray(a[None]), n, interpret=True)
    h = jnp.concatenate([h, jnp.zeros_like(h)])
    before = np.linalg.eigvals(np.asarray(h[0]).astype(np.float64)
                               + 1j * np.asarray(h[1]).astype(np.float64))
    p, np_ = pad_for_blocked(h)
    p2, d, hi_w, shifts, ns = _aed_round(
        p, jnp.asarray(n, jnp.int32), jnp.asarray(3e-6, jnp.float32),
        w=w, interpret=True)
    Hc = (np.asarray(p2[0]) + 1j * np.asarray(p2[1]))[:n, :n]
    assert np.abs(np.tril(Hc, -2)).max() == 0.0  # exact Hessenberg mask
    after = np.linalg.eigvals(Hc.astype(np.complex128))
    assert _nn_eig_err(before, after) < 5e-5
    assert int(ns) >= 1  # shift schedule populated


def test_aed_planes_entry_matches_reference_spectrum():
    """Driver entry on pre-reduced planes, mild clustered spectrum."""
    n = 180
    rng = np.random.default_rng(7)
    d = np.concatenate([np.full(30, 2.0) + 1e-3 * rng.standard_normal(30),
                        rng.uniform(0.5, 1.5, n - 30)])
    Qo, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = ((Qo * d) @ Qo.T).astype(np.float32)
    h = hessenberg_blocked_planes(jnp.asarray(a[None]), n, interpret=True)
    h = jnp.concatenate([h, jnp.zeros_like(h)])
    eig, sweeps, hi = qr_eig_blocked_aed_planes(
        h, n, 40 * n, 3e-6, w=64, sweeps_per_round=8, interpret=True)
    assert hi <= 1
    e = np.asarray(eig)
    got = np.sort(e[0])
    assert np.abs(got - np.sort(d)).max() < 5e-4


def test_complex_via_real_embedding():
    """Complex inputs beyond the 2-plane blocked kernel's compile cap run
    the real 2n embedding with two-run conjugation disambiguation
    (round-4: the remote AOT helper crashes on 2-plane kernels at
    np_ >= 1152; the 1-plane path runs to >= 4096 after the phase-split
    fix). The test matrix deliberately contains near-conjugate pairs —
    the case a single embedded solve cannot disambiguate."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_aed import (
        _complex_via_real_embedding)
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_kernels import (
        split_planes_f32)
    rng = np.random.default_rng(0)
    n = 80
    a = (rng.standard_normal((n, n)) / np.sqrt(n)
         + 0.3j * rng.standard_normal((n, n)) / np.sqrt(n)) \
        .astype(np.complex64)
    planes = split_planes_f32(a)
    eigs, sweeps, conv = _complex_via_real_embedding(
        planes, n, 40 * n, 3e-6, w=64, sweeps_per_round=8, log=None,
        interpret=True)
    assert conv
    ref = np.linalg.eigvals(a.astype(np.complex128))
    assert _nn_eig_err(ref, eigs) < 1e-3
    # the conjugation choice must be resolved: total imag mass matches
    assert abs(np.sort(eigs.imag) - np.sort(ref.imag)).max() < 1e-3


def test_aed_schur_mode_invariant():
    """Schur-mode AED (qr_eig_blocked_aed_schur_planes): maintains
    H_in = Q T Q^H through AED rounds (left row strip + Q column strip
    updates), T triangular, eigenvalues on the diagonal."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_aed import (
        qr_eig_blocked_aed_schur_planes)
    rng = np.random.default_rng(4)
    n = 180
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    h = hessenberg_blocked_planes(jnp.asarray(a[None]), n, interpret=True)
    h2 = jnp.concatenate([h, jnp.zeros_like(h)])
    eig, sweeps, hi, t_pl, qs = qr_eig_blocked_aed_schur_planes(
        h2, n, 40 * n, 3e-6, w=64, sweeps_per_round=8, interpret=True)
    assert hi <= 1
    t = np.asarray(t_pl)
    q = np.asarray(qs)
    T = t[0] + 1j * t[1]
    Q = q[0] + 1j * q[1]
    H = np.asarray(h)[0]
    assert np.abs(Q @ T @ Q.conj().T - H).max() < 5e-4
    assert np.abs(Q.conj().T @ Q - np.eye(n)).max() < 1e-4
    assert np.abs(np.tril(T, -1)).max() < 1e-4
    ref = np.linalg.eigvals(a.astype(np.complex128))
    e = np.asarray(eig)
    assert _nn_eig_err(ref, (e[0] + 1j * e[1])[:n]) < 5e-4


def test_schur_driver_dispatch(monkeypatch):
    """compute_vectors picks the Schur-mode AED driver at n >=
    _SCHUR_AED_MIN_N and the monolithic kernel below (the measured
    round-5 crossover) — pinned so the dispatch cannot silently regress;
    explicit schur_driver= overrides."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas import (qr_aed,
                                                              qr_eig_blocked)
    calls = []

    def fake_aed(h, n, ms, tol, **kw):
        calls.append("aed")
        raise RuntimeError("probe")

    def fake_mono(h, n, ms, tol, **kw):
        calls.append("mono")
        raise RuntimeError("probe")

    monkeypatch.setattr(qr_aed, "qr_eig_blocked_aed_schur_planes", fake_aed)
    monkeypatch.setattr(qr_eig_blocked, "qr_eig_blocked_planes", fake_mono)
    monkeypatch.setattr(qr_eig_blocked, "hessenberg_blocked_planes",
                        lambda p, n, **kw: (p, p),
                        raising=False)
    import pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked \
        as hb
    monkeypatch.setattr(hb, "hessenberg_blocked_planes",
                        lambda p, n, **kw: (p, p))

    lo = np.zeros((qr_eig_blocked._SCHUR_AED_MIN_N - 1,) * 2, np.float32)
    hi_ = np.zeros((qr_eig_blocked._SCHUR_AED_MIN_N,) * 2, np.float32)
    for a, want in ((lo, "mono"), (hi_, "aed")):
        calls.clear()
        with pytest.raises(RuntimeError):
            qr_eig_blocked.qr_eigenvalues_pallas_blocked(
                a, 10, 1e-5, compute_vectors=True)
        assert calls == [want]
    # explicit override wins at any size
    calls.clear()
    with pytest.raises(RuntimeError):
        qr_eig_blocked.qr_eigenvalues_pallas_blocked(
            lo, 10, 1e-5, compute_vectors=True, schur_driver="aed")
    assert calls == ["aed"]
    with pytest.raises(ValueError):
        qr_eig_blocked.qr_eigenvalues_pallas_blocked(
            lo, 10, 1e-5, compute_vectors=True, schur_driver="bogus")


def test_complex_embedded_full_path_interpret():
    """Round-5: embedded Hessenberg + native 2-plane AED sweeps — the
    big-n complex path with no second solve and no conjugation
    ambiguity. Full spectrum of a complex operator WITH conjugate pairs
    (real submatrix) must match numpy including imaginary-part signs."""
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.hessenberg_blocked \
        import hessenberg_blocked_embedded
    from pcsc_eigenvalue_solver_project_tpu.ops.pallas.qr_aed import (
        qr_eig_blocked_aed_planes)
    rng = np.random.default_rng(11)
    n = 160
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64) / np.sqrt(n)
    # plant a REAL 2x2 rotation block so both lam and conj(lam) appear —
    # the case the old rotated-respectrum fallback needed a 2nd solve for
    a[:2, :] = 0; a[:, :2] = 0
    a[0, 0] = a[1, 1] = 0.5
    a[0, 1], a[1, 0] = 0.8, -0.8
    planes = jnp.asarray(np.stack([a.real, a.imag]).astype(np.float32))
    h = hessenberg_blocked_embedded(planes, n, interpret=True, chunk=128)
    eig, sweeps, hi = qr_eig_blocked_aed_planes(
        h, n, 40 * n, 3e-6, w=64, sweeps_per_round=16, interpret=True)
    assert hi <= 1
    e = np.asarray(eig)
    got = (e[0] + 1j * e[1])[:n]
    ref = np.linalg.eigvals(a.astype(np.complex128))
    assert _nn_eig_err(ref, got) < 5e-4
    # signed-imag check: the planted pair 0.5 +- 0.8i must appear with
    # BOTH signs (nearest-match error alone would not catch a flip)
    d_plus = np.abs(got - (0.5 + 0.8j)).min()
    d_minus = np.abs(got - (0.5 - 0.8j)).min()
    assert d_plus < 1e-3 and d_minus < 1e-3
