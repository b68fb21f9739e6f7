"""Fuzzy-logic smoothing and root finding.

Counterpart of the reference's ``src/maths/maths.py``.  Semantics are kept
exactly (widths, clamping) because AAD correctness of discontinuous payoffs
depends on them:

  * ``symmetric_linear_smoothing`` — hard ``(x > 0)`` indicator when smoothing
    is off, linear ramp ``clamp((x+eps)/(2 eps), 0, 1)`` when on
    (reference maths.py:3-6).
  * default fuzzy width eps=0.05 (maths.py:8-9); binary options use eps=1
    (binary_option.py:38); Heston QE uses eps=0.3 for the mass-at-zero
    indicator and eps=0.5 for the psi-switch (heston.py:227-236).

``is_fuzzy`` must be a *static* Python bool — it selects which computation is
traced, mirroring the reference's ``perform_smoothing`` flag that is set once
when differentiation is enabled (model.py:83-90).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import asarray, real_dtype


def symmetric_linear_smoothing(x, is_fuzzy: bool, eps: float):
    x = jnp.asarray(x)
    if not is_fuzzy:
        return (x > 0).astype(real_dtype())
    return jnp.clip((x + eps) / (2.0 * eps), 0.0, 1.0)


def compute_degree_of_truth(x, is_fuzzy: bool, eps: float = 0.05):
    return symmetric_linear_smoothing(x, is_fuzzy, eps)


def sigmoid_smoothing(x, beta: float = 500.0):
    return 1.0 / (1.0 + jnp.exp(-beta * jnp.asarray(x)))


def bisection_search(
    func: Callable[[float], float],
    low: float = 1e-10,
    high: float = 5.0,
    tolerance: float = 1e-12,
    iters: int = 100,
) -> Optional[float]:
    """Host-side scalar bisection with bracket expansion (maths.py:14-33).

    Used only at setup time (CDS hazard bootstrap, storage constraint
    optimizer) — deliberately plain Python, never traced.
    """
    value_low, value_high = func(low), func(high)
    cnt = 0
    while value_low * value_high > 0.0 and cnt < 20:
        high *= 2.0
        value_high = func(high)
        cnt += 1
    if value_low * value_high > 0.0:
        return None
    for _ in range(iters):
        mid = 0.5 * (low + high)
        value_mid = func(mid)
        if abs(value_mid) < tolerance or (high - low) < 1e-12:
            return mid
        if value_low * value_mid <= 0.0:
            high, value_high = mid, value_mid
        else:
            low, value_low = mid, value_mid
    return 0.5 * (low + high)
