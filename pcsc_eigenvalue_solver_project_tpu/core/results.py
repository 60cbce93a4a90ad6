"""Result pytrees for eigenvalue solvers.

Reference parity: ``EigenResult`` (eigenvalue, normalized eigenvector,
iterations, converged; /root/reference/src/result/eigen_result.hpp:22-52) and
``QRResult`` (eigenvalues, iterations, converged;
/root/reference/src/result/qr_result.hpp:23-44). The ``iterations`` and
``converged`` fields are the reference's entire observability contract and
are preserved exactly, including its quirks: power-family solvers report the
number of iterations performed (k+1 at the breaking iteration,
power_method.hpp:87,95), and the QR solver reports ``max_iterations + 1``
when it never converges (qr_eigenvalues.hpp:69,104).

Both are registered pytrees so they can be returned straight out of jitted
functions; fields are device scalars/arrays until the caller pulls them.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EigenResult:
    """Result of single-eigenpair solvers (power, shifted inverse power)."""

    eigenvalue: jax.Array
    eigenvector: jax.Array
    iterations: jax.Array  # int32 scalar
    converged: jax.Array  # bool scalar

    def item_iterations(self) -> int:
        return int(self.iterations)

    def item_converged(self) -> bool:
        return bool(self.converged)

    def __repr__(self):
        try:
            return (f"EigenResult(eigenvalue={complex(self.eigenvalue)}, "
                    f"iterations={int(self.iterations)}, converged={bool(self.converged)})")
        except Exception:
            return object.__repr__(self)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QRResult:
    """Result of QR-based eigenvalue solvers.

    ``eigenvectors`` is ``None`` by default — the reference's QRResult
    carries none (qr_result.hpp:23-44) — and an (n, n) complex matrix
    (column i pairs with ``eigenvalues[i]``) when the solver ran with
    ``QROptions(compute_vectors=True)`` (a superset capability)."""

    eigenvalues: jax.Array
    iterations: jax.Array  # int32 scalar
    converged: jax.Array  # bool scalar
    eigenvectors: object = None  # Optional[(n, n) complex array]

    def __repr__(self):
        try:
            return (f"QRResult(n={self.eigenvalues.shape[0]}, "
                    f"iterations={int(self.iterations)}, converged={bool(self.converged)})")
        except Exception:
            return object.__repr__(self)


def _as_result_scalars(iterations, converged):
    return jnp.asarray(iterations, jnp.int32), jnp.asarray(converged, bool)
