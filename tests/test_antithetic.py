"""Antithetic variates: unbiased and variance-reducing (engine feature)."""

import numpy as np
from scipy.stats import norm

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    Equity,
    EuropeanOption,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)


def _pv(antithetic, seed):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2)
    product = EuropeanOption(Equity(), 2.0, 100.0, OptionType.CALL)
    controller = SimulationController(
        netting_sets=[NettingSet(name="ns", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=20_000,
        num_paths_presim=0,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        antithetic=antithetic,
        root_seed=seed,
    )
    return float(controller.run_simulation().get_results("ns", "pv", evaluation_idx=0))


def test_antithetic_reduces_estimator_variance():
    d1 = (np.log(1.0) + (0.05 + 0.02) * 2.0) / (0.2 * np.sqrt(2.0))
    d2 = d1 - 0.2 * np.sqrt(2.0)
    ref = 100.0 * norm.cdf(d1) - 100.0 * np.exp(-0.1) * norm.cdf(d2)

    plain = np.array([_pv(False, s) for s in range(8)])
    anti = np.array([_pv(True, s) for s in range(8)])
    # unbiasedness: both within a few estimator std-devs of the closed form
    assert abs(anti.mean() - ref) < 4 * anti.std(ddof=1) / np.sqrt(8) + 0.05
    # variance reduction across independent seeds
    assert anti.std(ddof=1) < plain.std(ddof=1), (anti.std(ddof=1), plain.std(ddof=1))
