"""Regression bases for Longstaff–Schwartz continuation values.

Counterpart of the reference's ``src/maths/regression.py`` (Vandermonde
polynomial basis, regression.py:10-15).

TPU-native solve strategy: the reference calls ``torch.linalg.lstsq(A, Y)``
once per regression date (controller.py:373).  Here the solve is expressed via
normal equations — Gram accumulation ``AᵀA, AᵀY`` over the (possibly sharded)
path axis in a fixed pairwise-halving order, followed by a tiny (deg×deg)
solve — which is mathematically identical for full-rank bases,
differentiable, and bitwise invariant under any path-axis sharding (XLA turns
the halving adds into psum-style collectives automatically).  A small
Tikhonov term guards rank deficiency (e.g. regressing on a constant spot).
"""

from __future__ import annotations

import jax.numpy as jnp


class RegressionFunction:
    def __init__(self, degree: int):
        self.degree = degree

    def get_degree(self) -> int:
        """Number of basis columns (reference regression.py:7-8)."""
        return self.degree + 1

    def get_regression_matrix(self, explanatory):
        raise NotImplementedError


class PolynomialRegression(RegressionFunction):
    """Monomial basis [1, x, x^2, ...] (reference regression.py:10-15)."""

    def get_regression_matrix(self, explanatory):
        x = jnp.asarray(explanatory)
        return jnp.stack([x**k for k in range(self.degree + 1)], axis=1)


# Alias matching the reference's (misspelled) public name so user scripts port 1:1.
PolyomialRegression = PolynomialRegression


def fit_least_squares(A, Y, ridge_rel=None, weights=None):
    """Solve ``argmin ||A c - Y||²`` via normal equations.

    A: [N, deg] basis matrix; Y: [N, S] targets (one column per hypothetical
    product state — the reference solves all states in one call,
    controller.py:373).  Returns coeffs [S, deg].

    Under a sharded paths axis, the matmuls below reduce over the sharded
    dimension, so XLA inserts psum collectives automatically — this is the
    distributed-LSM formulation from SURVEY.md §5.8.  A scale-relative
    Tikhonov term keeps degenerate bases (e.g. constant explanatory at t=0)
    well-posed and differentiable; predicted continuation values agree with
    the reference's min-norm lstsq in that limit.
    """
    from montecarlo_risk_engine_tpu.metrics.metrics import fixed_tree_sum

    A = jnp.asarray(A)
    Y = jnp.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    # Column equilibration: monomial bases span many orders of magnitude
    # (1, S, S^2 with S ~ 100), so the raw Gram matrix is ill-conditioned and
    # any uniform ridge acts as a huge perturbation on the small-scale
    # columns.  Scale columns to unit RMS, solve, then unscale.
    #
    # Every path-axis reduction below goes through fixed_tree_sum, NOT a
    # matmul: a matmul's contraction schedule depends on the operand tiling,
    # which changes with the path-axis sharding — regression coefficients
    # (and hence every regression-built exposure value) drifted by ulps
    # between sharded and unsharded runs, breaking the engine's bitwise
    # contract (round-4 verdict #3).  Full f32/f64 precision is also
    # guaranteed for free (TPU matmuls would default to bf16 inputs).  The
    # per-degree loop keeps peak memory at one [N, max(deg, S)] temp — the
    # same footprint as the basis itself (fits run on presim paths).
    n = A.shape[0]
    col_scale = jnp.sqrt(fixed_tree_sum(A * A) / n)
    col_scale = jnp.maximum(col_scale, 1e-30)
    A_s = A / col_scale[None, :]
    # Optional per-path weights (e.g. in-the-money masks for exercise-quality
    # LSM): weighted normal equations (A'WA) c = A'WY.
    A_w = A_s if weights is None else A_s * weights[:, None]
    deg = A.shape[1]
    gram = jnp.stack([fixed_tree_sum(A_w[:, d:d + 1] * A_s) for d in range(deg)])
    if ridge_rel is None:
        # must dominate the dtype's epsilon so rank-deficient bases (constant
        # explanatory at t=0) stay solvable: ~1e3 x eps of the working dtype
        ridge_rel = 1e-10 if jnp.finfo(A.dtype).bits >= 64 else 1e-4
    scale = jnp.trace(gram) / deg
    gram = gram + (ridge_rel * scale + 1e-30) * jnp.eye(deg, dtype=A.dtype)
    rhs = jnp.stack([fixed_tree_sum(A_w[:, d:d + 1] * Y) for d in range(deg)])
    coeffs = jnp.linalg.solve(gram, rhs)
    return (coeffs / col_scale[:, None]).T
