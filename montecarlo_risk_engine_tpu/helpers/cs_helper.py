"""CDS hazard-rate bootstrap and cumulative default probabilities.

Counterpart of reference ``src/helpers/cs_helper.py`` (cs_helper.py:9-108).

Split of responsibilities:
  * :meth:`CSHelper.bootstrap_hazards` — control-flow heavy root finding, runs
    on the host at setup time (SURVEY.md §7.3 item 7), plain numpy floats.
  * :func:`probability_of_default` — used inside the traced pipeline by the
    CIR++ model; implemented with vectorised bucket sums so ``date`` may be a
    traced scalar and gradients flow into the hazard tensor if needed.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.utils.maths import bisection_search


def probability_of_default(hazards, tenors, date):
    """Cumulative PD up to ``date`` under piecewise-constant hazards.

    ``hazards[i]`` applies on (tenors[i-1], tenors[i]]; the last hazard is
    flat-extended beyond the final tenor (reference cs_helper.py:80-108).
    Fully vectorised: integral = sum_i hazards[i] * overlap(bucket_i, [0,date])
    + last_hazard * max(date - tenors[-1], 0).
    """
    hazards = jnp.asarray(hazards)
    tenors = jnp.asarray(tenors)
    date = jnp.asarray(date)
    prev = jnp.concatenate([jnp.zeros((1,), dtype=tenors.dtype), tenors[:-1]])
    overlap = jnp.clip(jnp.minimum(tenors, date) - prev, 0.0, None)
    integral = jnp.sum(hazards * overlap) + hazards[-1] * jnp.maximum(date - tenors[-1], 0.0)
    return 1.0 - jnp.exp(-integral)


class CSHelper:
    """Host-side CDS bootstrap (premium/protection legs with accrual-on-default)."""

    def _compute_cds_legs(
        self,
        maturities: Sequence[float],
        payment_days: np.ndarray,
        discount_factors_payment_days: np.ndarray,
        recovery_rate: float,
        hazard_rates: Sequence[float],
    ) -> Tuple[float, float]:
        # Premium leg = sum delta_k DF_k S(t_k) + 0.5 delta_k DF_k (S_{k-1}-S_k)
        # Protection leg = (1-R) sum DF_k (S_{k-1}-S_k)
        # with piecewise-constant hazards per maturity bucket
        # (reference cs_helper.py:9-42).
        payment_days = np.asarray(payment_days, dtype=float)
        dfs = np.asarray(discount_factors_payment_days, dtype=float)
        deltas = np.diff(np.concatenate([[0.0], payment_days]))
        bucket_end_idx = np.searchsorted(payment_days, maturities)

        premium = 0.0
        protection = 0.0
        s_prev = 1.0
        k_start = 0
        for i, maturity in enumerate(maturities):
            lam = hazard_rates[i]
            t_anchor = maturities[i - 1] if i > 0 else 0.0
            s_anchor = s_prev
            for k in range(k_start, bucket_end_idx[i] + 1):
                s_k = s_anchor * np.exp(-lam * (payment_days[k] - t_anchor))
                accrual = 0.5 * deltas[k] * dfs[k] * (s_prev - s_k)
                premium += deltas[k] * dfs[k] * s_k + accrual
                protection += (1.0 - recovery_rate) * dfs[k] * (s_prev - s_k)
                s_prev = s_k
            # next bucket starts strictly after this maturity's payment
            # (the reference re-visits the boundary payment and measures
            # default mass from the bucket start — we use the standard
            # per-interval convention; both bootstrap/price consistently).
            k_start = bucket_end_idx[i] + 1
        return premium, protection

    def bootstrap_hazards(
        self,
        credit_spreads: Sequence[float],
        maturities: np.ndarray,
        payment_days: np.ndarray,
        discount_factors_payment_days: np.ndarray,
        recovery_rate: float,
    ) -> List[float]:
        """Sequential per-maturity bisection: solve spread·RPV01 = Protection
        (reference cs_helper.py:44-78)."""
        assert len(payment_days) == len(discount_factors_payment_days)
        hazards: List[float] = []
        for i, spread in enumerate(credit_spreads):
            def objective(lam: float) -> float:
                prem, prot = self._compute_cds_legs(
                    list(maturities[: i + 1]),
                    payment_days,
                    discount_factors_payment_days,
                    recovery_rate,
                    hazards + [lam],
                )
                return spread * prem - prot

            hazards.append(bisection_search(objective))
        return hazards

    def probability_of_default(self, hazards, tenors, date):
        return probability_of_default(hazards, tenors, date)
