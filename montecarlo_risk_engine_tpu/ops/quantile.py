"""Quantile estimation over (possibly sharded) path vectors.

Two strategies (SURVEY.md §5.8):
  * exact order statistic ``sorted[ceil(qN)-1]`` — matches the reference's
    PFE convention (pfe_metric.py:59-66); a global sort is fine up to ~1M
    paths (XLA gathers the sharded vector).
  * bisection order statistics — communication-light iterative bisection on
    the value range: each step only needs the *count of paths below a
    threshold*, i.e. one sum-reduction that XLA lowers to a psum over the
    sharded paths axis.  Memory O(1), no gather, deterministic; used by
    PFEMetric above ``PFE_BISECT_THRESHOLD`` paths so 16M+ path PFE profiles
    never global-sort.
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


def order_statistics_bisect(values, ks, iters: int = 96):
    """Exact k-th order statistics (0-indexed) of ``values`` along the last
    axis, for every k in ``ks``, without sorting.

    values: [..., N]; ks: static sequence of K integer indices in [0, N).
    Returns [K, ...] — the k-th smallest element per batch row.

    Bisection on the value range maintains the invariant
    ``lo < x_(k) <= hi`` using only "count of samples <= mid" reductions
    (one pass over the data per iteration, batched over all K targets and
    all leading batch axes at once).  After the bracket collapses below
    float spacing, the result snaps to the smallest actual sample > lo, so
    the output is a true sample value matching ``sorted[k]`` exactly —
    including tied values (the count predicate is monotone in mid, ties
    collapse into one bracket endpoint).
    """
    values = jnp.asarray(values)
    n = values.shape[-1]
    batch_shape = values.shape[:-1]
    ks_arr = jnp.asarray(list(ks), dtype=jnp.int32)  # [K]
    k_plus_1 = (ks_arr + 1).reshape((-1,) + (1,) * len(batch_shape))  # [K, 1..]

    # The bracket search only *selects* which sample to return; derivatives
    # flow through the final snap against the live values (same selection
    # gradient as sorting), so the 96-iteration loop runs on stopped values.
    values_ng = jax.lax.stop_gradient(values)
    lo0 = jnp.min(values_ng, axis=-1)  # [...]
    hi0 = jnp.max(values_ng, axis=-1)
    # Widen lo below the minimum so the invariant lo < x_(k) holds for k=0.
    # The widening must survive rounding: span*eps alone rounds back to the
    # minimum when ulp(min) > span*eps (|min| >~ span — e.g. all-equal values,
    # or a narrow distribution far from zero), after which the "strictly
    # above lo" snap skips the minimum.  Widen relative to both the span and
    # the magnitude so the step always exceeds one ulp of lo0.
    eps = jnp.finfo(values.dtype).eps
    span = jnp.maximum(hi0 - lo0, 1.0)
    lo0 = lo0 - jnp.maximum(span, jnp.abs(lo0)) * eps
    lo = jnp.broadcast_to(lo0, (len(ks),) + batch_shape)
    hi = jnp.broadcast_to(hi0, (len(ks),) + batch_shape)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        # [K, ..., 1] threshold vs [..., N] samples -> count over N
        count = jnp.sum(
            values_ng[None] <= mid[..., None], axis=-1, dtype=jnp.int32
        )  # [K, ...]
        go_left = count >= k_plus_1  # x_(k) <= mid
        return jnp.where(go_left, lo, mid), jnp.where(go_left, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    # Snap to the smallest sample strictly above lo: by the invariant that is
    # x_(k) once the bracket is tighter than the sample spacing.
    big = jnp.asarray(jnp.inf, dtype=values.dtype)
    candidates = jnp.where(values[None] > lo[..., None], values[None], big)
    return jnp.min(candidates, axis=-1)


def quantile_bisect(values, q: float, iters: int = 96):
    """Order-statistic quantile ``sorted[ceil(q N) - 1]`` via bisection.

    Same convention as :func:`quantile_order_statistic`, but only uses
    comparisons + count reductions, so it scales over a sharded paths axis
    without a global sort."""
    n = values.shape[0]
    k = int(math.ceil(q * n)) - 1
    return order_statistics_bisect(values, [k], iters=iters)[0]
