"""Quantile estimation over (possibly sharded) path vectors.

Two strategies (SURVEY.md §5.8):
  * exact order statistic ``sorted[ceil(qN)-1]`` — matches the reference's
    PFE convention (pfe_metric.py:59-66); a global sort is fine up to ~1M
    paths (XLA gathers the sharded vector).
  * ``quantile_bisect`` — communication-light iterative bisection on the
    value range: each step only needs the *fraction of paths below a
    threshold*, i.e. one mean-reduction that XLA lowers to a psum over the
    sharded paths axis.  Memory O(1), no gather, deterministic; use for 16M+
    path PFE profiles.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def quantile_order_statistic(values, q: float):
    """Reference convention: sorted[ceil(q N) - 1] (pfe_metric.py:59-66)."""
    n = values.shape[0]
    idx = int(math.ceil(q * n)) - 1
    return jnp.sort(values)[idx]


def quantile_bisect(values, q: float, iters: int = 60):
    """Bisection quantile: converges to the same order statistic up to value
    resolution 2^-iters of the initial bracket.  Only uses full-vector
    comparisons + means, so it scales over a sharded paths axis without a
    global sort."""
    n = values.shape[0]
    target = (math.ceil(q * n) - 1) / max(n - 1, 1)

    lo = jnp.min(values)
    hi = jnp.max(values)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        frac_below = jnp.mean((values <= mid).astype(values.dtype))
        go_right = frac_below <= target
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    mid = 0.5 * (lo + hi)
    # Snap to the smallest sample value >= mid so the result is an actual
    # order statistic (matches the sort-based estimator exactly).
    candidates = jnp.where(values >= mid, values, jnp.inf)
    return jnp.min(candidates)
