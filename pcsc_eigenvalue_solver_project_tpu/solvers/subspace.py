"""Block (subspace) iteration — top-k eigenvalues with block SpMM.

Single-vector power iteration on a bandwidth-bound SpMV leaves the MXU/VPU
idle waiting on HBM; iterating a BLOCK of b vectors reads the operator once
per b matvecs (the Pallas block kernel in ops/pallas/dia_spmv.py), so
throughput per vector scales ~b-fold until compute-bound. Orthonormalisation
uses CholeskyQR2 — two passes of Gram + Cholesky + triangular solve, all
matmuls on the MXU, no Householder loops (which the axon compiler cannot
handle; see hessenberg.py) — and convergence is checked on host between
device chunks via the Ritz values of the projected b x b block.

This is the dominant-subspace counterpart of Arnoldi: simpler, restart-free,
block-bandwidth-optimal; Arnoldi remains better for interior clusters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import check_scalar_type
from ..core.options import SolverOptions
from ..core.results import QRResult
from ..core.tolerance import is_close_relative
from ..matrix.dia import InterleavedDIA, SparseDIA
from ..matrix.protocol import AbstractMatrix, require_nonempty, require_square
from ..ops.pallas.dia_spmv import dia_matmat
from ..utils.prng import default_key


def _apply_block(M: AbstractMatrix, X: jax.Array) -> jax.Array:
    """A @ X for X (n, b): block-kernel for DIA, matmul for dense,
    vmapped matvec otherwise."""
    if isinstance(M, SparseDIA):
        return dia_matmat(M.data, M.offsets, X.T).T
    if M.is_dense:
        return M.as_dense() @ X
    return jax.vmap(M.matvec, in_axes=1, out_axes=1)(X)


def _cholqr2(X: jax.Array) -> jax.Array:
    """Orthonormalise columns via two rounds of Cholesky QR (MXU-only)."""
    def one(Xc):
        G = jnp.conj(Xc).T @ Xc
        eps = jnp.asarray(1e-7 if Xc.dtype in (jnp.float32, jnp.complex64)
                          else 1e-14, G.real.dtype if hasattr(G, "real") else G.dtype)
        G = G + eps * jnp.trace(G).real.astype(G.dtype) * jnp.eye(G.shape[0], dtype=G.dtype)
        L = jnp.linalg.cholesky(G)
        return jax.scipy.linalg.solve_triangular(jnp.conj(L), Xc.T, lower=True).T

    return one(one(X))


@partial(jax.jit, static_argnames=("sweeps",))
def _subspace_chunk(M: AbstractMatrix, X: jax.Array, sweeps: int):
    def body(_, Xc):
        return _cholqr2(_apply_block(M, Xc))

    X = jax.lax.fori_loop(0, sweeps, body, X)
    B = jnp.conj(X).T @ _apply_block(M, X)  # projected block (b, b)
    return X, B


# --- row-domain variant (InterleavedDIA fast path) -----------------------
# Block vectors live as Xf (b, N): each ROW is one flattened interleaved
# domain vector. Gram matrices and triangular combinations are permutation-
# invariant over N, so the CholeskyQR2 algebra transposes cleanly:
# Q = X L^{-H}  (columns)  <=>  Qf = conj(L)^{-1} Xf  (rows).


def _apply_block_rows(M: InterleavedDIA, Xf: jax.Array) -> jax.Array:
    b = Xf.shape[0]
    return M.matmat(Xf.reshape(b, M.R, -1)).reshape(b, -1)


def _cholqr2_rows(Xf: jax.Array) -> jax.Array:
    def one(Xc):
        G = jnp.conj(Xc) @ Xc.T
        eps = jnp.asarray(1e-7 if Xc.dtype in (jnp.float32, jnp.complex64)
                          else 1e-14, G.real.dtype if hasattr(G, "real") else G.dtype)
        G = G + eps * jnp.trace(G).real.astype(G.dtype) * jnp.eye(G.shape[0], dtype=G.dtype)
        L = jnp.linalg.cholesky(G)
        return jax.scipy.linalg.solve_triangular(jnp.conj(L), Xc, lower=True)

    return one(one(Xf))


@partial(jax.jit, static_argnames=("sweeps",))
def _subspace_chunk_rows(M: InterleavedDIA, Xf: jax.Array, sweeps: int):
    def body(_, Xc):
        return _cholqr2_rows(_apply_block_rows(M, Xc))

    Xf = jax.lax.fori_loop(0, sweeps, body, Xf)
    B = jnp.conj(Xf) @ _apply_block_rows(M, Xf).T
    return Xf, B


def subspace_iteration(M: AbstractMatrix, k: int = 4, *, block: int | None = None,
                       opts: SolverOptions = SolverOptions(), dtype=None,
                       sweeps_per_check: int = 10, key=None,
                       X0=None) -> QRResult:
    """Top-``k`` eigenvalues (by magnitude) via block iteration.

    ``block`` defaults to ``max(k + 4, 8)`` padded for kernel efficiency.
    Convergence: the top-k Ritz values of the projected block satisfy the
    reference relative criterion between consecutive checks.
    """
    if dtype is not None:
        check_scalar_type(M.dtype, dtype, "subspace_iteration")
    require_square(M, "subspace_iteration")
    require_nonempty(M, "subspace_iteration")
    n = M.shape[0]
    if k < 1:
        raise ValueError("subspace_iteration: k must be >= 1")
    b = block if block is not None else min(max(k + 4, 8), n)
    if b < k:
        raise ValueError(f"subspace_iteration: block ({b}) must be >= k ({k})")
    b = min(b, n)

    rows_mode = isinstance(M, InterleavedDIA)
    vec_dt = jnp.promote_types(M.dtype, jnp.float32)
    if X0 is None:
        X = jax.random.uniform(key if key is not None else default_key(),
                               (n, b), jnp.dtype(vec_dt)
                               if np.dtype(M.dtype).kind != "c" else jnp.float64,
                               minval=-1.0, maxval=1.0).astype(vec_dt)
    else:
        X = jnp.asarray(X0, vec_dt)
    if rows_mode:
        # encode each column into the interleaved domain, rows = vectors
        X = jax.vmap(M.encode_vec, in_axes=1)(X).reshape(b, -1)
        X = _cholqr2_rows(X)
    else:
        X = _cholqr2(X)

    prev = None
    total = 0
    converged = False
    ritz = np.zeros(k, np.complex128)
    max_checks = -(-opts.max_iterations // sweeps_per_check)
    for _ in range(max_checks):
        X, B = (_subspace_chunk_rows(M, X, sweeps_per_check) if rows_mode
                else _subspace_chunk(M, X, sweeps_per_check))
        total += sweeps_per_check
        w = np.linalg.eigvals(np.asarray(jax.device_get(B)))
        w = w[np.argsort(-np.abs(w))][:k]
        if prev is not None:
            close = all(bool(is_close_relative(w[i], prev[i], opts.tolerance))
                        for i in range(k))
            if close:
                ritz = w
                converged = True
                break
        prev = w
        ritz = w
    return QRResult(eigenvalues=jnp.asarray(ritz),
                    iterations=jnp.asarray(total, jnp.int32),
                    converged=jnp.asarray(converged))
