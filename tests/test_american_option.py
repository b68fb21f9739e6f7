"""American/Bermudan LSM vs a Cox-Ross-Rubinstein binomial oracle.

The reference pins a golden value tied to its torch RNG
(test_american_option.py:61 — 34.3230... for an American call under
sigma=0.5).  With a different RNG stream that exact number is meaningless, so
the oracle here is a dense CRR binomial tree: the LSM value must sit slightly
BELOW the true American value (suboptimal-policy lower bound) and above the
European value, within a few standard errors.
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    AmericanOption,
    BlackScholesModel,
    Equity,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)


def crr_american_put(s0, k, r, sigma, maturity, steps=2000):
    dt = maturity / steps
    u = np.exp(sigma * np.sqrt(dt))
    d = 1.0 / u
    p = (np.exp(r * dt) - d) / (u - d)
    disc = np.exp(-r * dt)
    j = np.arange(steps + 1)
    prices = s0 * u ** (steps - j) * d ** j
    values = np.maximum(k - prices, 0.0)
    for step in range(steps - 1, -1, -1):
        prices = prices[: step + 1] * d
        values = disc * (p * values[: step + 1] + (1 - p) * values[1 : step + 2])
        values = np.maximum(values, k - prices)
    return values[0]


def _lsm_american_put(num_dates=50, num_paths=50_000):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.3)
    product = AmericanOption(Equity("eq"), 1.0, num_dates, 100.0, OptionType.PUT,
                             asset_id="eq")
    controller = SimulationController(
        netting_sets=[NettingSet(name="am", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    results = controller.run_simulation()
    return (
        float(results.get_results("am", "pv", evaluation_idx=0)),
        float(results.get_mc_error("am", "pv", evaluation_idx=0)),
    )


def test_american_put_brackets_binomial_value():
    true_american = crr_american_put(100.0, 100.0, 0.05, 0.3, 1.0)
    # European put closed form
    from scipy.stats import norm
    d1 = (np.log(1.0) + (0.05 + 0.045) * 1.0) / 0.3
    d2 = d1 - 0.3
    european = 100.0 * np.exp(-0.05) * norm.cdf(-d2) - 100.0 * norm.cdf(-d1)

    pv, se = _lsm_american_put()
    # The reference's LSM regresses on ALL paths (no in-the-money filtering,
    # controller.py:316-383), a suboptimal exercise policy that sits a few
    # percent below the true American value (the reference's own golden shows
    # the same bias).  Bracket band:
    assert pv < true_american + 4 * se, (pv, true_american)
    assert pv > 0.9 * true_american, (pv, true_american)
    # The bias is deterministic under the threefry RNG, so pin the exact
    # value like the reference's golden (test_american_option.py:61): any
    # engine change that moves this is a semantic change, not noise.
    assert pv == pytest.approx(9.287133384629987, abs=1e-6)
    # sanity: the tree value itself dominates European
    assert true_american > european


def test_american_put_itm_lsm_matches_binomial():
    # Beyond-parity mode: ITM-weighted fit + ITM-gated exercise (standard
    # Longstaff–Schwartz) prices the American put within ~1% of the tree.
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.3)
    product = AmericanOption(Equity("eq"), 1.0, 50, 100.0, OptionType.PUT,
                             asset_id="eq")
    product.itm_only_regression = True
    controller = SimulationController(
        netting_sets=[NettingSet(name="am", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=50_000,
        num_paths_presim=50_000,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    results = controller.run_simulation()
    pv = float(results.get_results("am", "pv", evaluation_idx=0))
    true_american = crr_american_put(100.0, 100.0, 0.05, 0.3, 1.0)
    assert abs(pv / true_american - 1.0) < 0.015, (pv, true_american)
