"""Swap EPE profile vs Jamshidian swaption prices under Vasicek.

The discounted EPE of a payer swap at exposure date t equals the price of a
payer swaption expiring at t (European exercise into the remaining swap).
Under Vasicek the swaption has a closed form via Jamshidian's decomposition:
find the critical short rate r* where the remaining fixed leg prices at par,
then the swaption is a basket of zero-bond puts struck at the critical bond
prices (uses the engine's own Vasicek bond-option formula,
european_option.py:264-288 counterpart).

This covers the reference's exposure-script scenarios
(tests/exposure_tests/ee_pfe_swap*.py) with an asserted analytic oracle.
"""

import numpy as np
import pytest
from scipy.stats import norm

from montecarlo_risk_engine_tpu import (
    EPEMetric,
    InterestRateSwap,
    IRSType,
    NettingSet,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
    VasicekModel,
)
from montecarlo_risk_engine_tpu.utils.maths import bisection_search

R0, MEAN, SPEED, VOL = 0.03, 0.04, 0.5, 0.012
FIXED, TENOR, MATURITY = 0.032, 0.5, 5.0


def _vasicek_bond(t1, t2, r):
    dt = t2 - t1
    B = (1 - np.exp(-SPEED * dt)) / SPEED
    alpha = (MEAN - VOL**2 / (2 * SPEED**2)) * (B - dt) - VOL**2 / (4 * SPEED) * B**2
    return np.exp(alpha) * np.exp(-B * r)


def _zbp(expiry, bond_maturity, strike, r0=R0):
    """Zero-bond put price at time 0 (Jamshidian building block)."""
    p_expiry = _vasicek_bond(0.0, expiry, r0)
    p_mat = _vasicek_bond(0.0, bond_maturity, r0)
    b_ts = (1 - np.exp(-SPEED * (bond_maturity - expiry))) / SPEED
    sigma_p = VOL * np.sqrt((1 - np.exp(-2 * SPEED * expiry)) / (2 * SPEED)) * b_ts
    if sigma_p < 1e-12:
        return max(strike * p_expiry - p_mat, 0.0)
    d1 = (np.log(p_mat / (p_expiry * strike)) + 0.5 * sigma_p**2) / sigma_p
    d2 = d1 - sigma_p
    return strike * p_expiry * norm.cdf(-d2) - p_mat * norm.cdf(-d1)


def _payer_swaption(expiry):
    """Payer swaption expiring at `expiry` into the remaining swap (fixed leg
    FIXED/TENOR to MATURITY, notional 1) — Jamshidian decomposition."""
    pay_dates = [t for t in np.arange(TENOR, MATURITY + 1e-9, TENOR) if t > expiry + 1e-9]
    if not pay_dates:
        return 0.0
    coupons = [FIXED * TENOR] * len(pay_dates)
    coupons[-1] += 1.0  # notional redemption of the synthetic coupon bond

    def par_gap(r):
        return sum(c * _vasicek_bond(expiry, t, r) for c, t in zip(coupons, pay_dates)) - 1.0

    r_star = bisection_search(par_gap, low=-0.5, high=1.0)
    strikes = [_vasicek_bond(expiry, t, r_star) for t in pay_dates]
    # payer swaption = put on the coupon bond struck at par = basket of ZBPs
    return sum(c * _zbp(expiry, t, k) for c, t, k in zip(coupons, pay_dates, strikes))


def test_swap_epe_matches_jamshidian_swaption_profile():
    model = VasicekModel(0.0, rate=R0, mean=MEAN, mean_reversion_speed=SPEED,
                         volatility=VOL, asset_id="irs")
    swap = InterestRateSwap(0.0, MATURITY, notional=1.0, fixed_rate=FIXED,
                            tenor_fixed=TENOR, tenor_float=TENOR,
                            irs_type=IRSType.PAYER, asset_id="irs")
    # reset dates only: between resets the in-flight floating coupon (fixed
    # at the previous reset) adds path-dependent value the fresh-reset
    # swaption formula does not carry
    exposure_timeline = np.array([1.0, 2.0, 3.0, 4.0])
    controller = SimulationController(
        netting_sets=[NettingSet(name="swap", products=[swap])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[EPEMetric()],
                                 exposure_timeline=exposure_timeline),
        num_paths_mainsim=100_000,
        num_paths_presim=100_000,
        num_steps=4,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    epe = controller.run_simulation().get_results("swap", "epe")

    for t, value in zip(exposure_timeline, epe):
        ref = _payer_swaption(float(t))
        # regression-based exposure vs exact conditional value: the positive
        # part of a fitted continuation carries a Jensen-type upward bias from
        # fit error around the exercise kink, so allow ~10%
        assert abs(value - ref) < max(0.10 * ref, 4e-4), (t, value, ref)
