"""Heston QE vs characteristic-function price; second-order AAD vs analytics.

Mirrors reference tests/pytests/test_pv_european_option_heston.py:76-106 and
test_european_option_hessian.py:65-105.
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    Equity,
    EuropeanOption,
    HestonModel,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)


def test_heston_qe_pv_vs_characteristic_function():
    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.7,
                        kappa=2.0, theta=0.06, v0=0.04)
    product = EuropeanOption(Equity(), exercise_date=1.0, strike=100.0,
                             option_type=OptionType.CALL)
    controller = SimulationController(
        netting_sets=[NettingSet(name="heston", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=400_000,
        num_paths_presim=0,
        num_steps=32,
        simulation_scheme=SimulationScheme.QE,
    )
    results = controller.run_simulation()
    price_mc = float(results.get_results("heston", "pv", evaluation_idx=0))
    se = float(results.get_mc_error("heston", "pv", evaluation_idx=0))
    price_cf = product.compute_pv_analytically_heston(model)
    assert abs(price_mc - price_cf) < max(4.0 * se, 0.08), (price_mc, price_cf, se)


def test_heston_euler_converges_to_cf_price():
    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.7,
                        kappa=2.0, theta=0.06, v0=0.04)
    product = EuropeanOption(Equity(), exercise_date=1.0, strike=100.0,
                             option_type=OptionType.CALL)
    controller = SimulationController(
        netting_sets=[NettingSet(name="heston", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=200_000,
        num_paths_presim=0,
        num_steps=64,
        simulation_scheme=SimulationScheme.EULER,
    )
    results = controller.run_simulation()
    price_mc = float(results.get_results("heston", "pv", evaluation_idx=0))
    price_cf = product.compute_pv_analytically_heston(model)
    assert abs(price_mc / price_cf - 1.0) < 3e-2


def test_european_option_hessian_matches_analytic_gamma_vomma():
    # Analytic-PV path: Hessian of the closed form == gamma / vomma to 1e-9
    # (test_european_option_hessian.py:97-105).
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2)
    product = EuropeanOption(Equity(), exercise_date=2.0, strike=110.0,
                             option_type=OptionType.CALL)
    controller = SimulationController(
        netting_sets=[NettingSet(name="ns", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[PVMetric(evaluation_type=PVMetric.EvaluationType.ANALYTICAL)]
        ),
        num_paths_mainsim=1,
        num_paths_presim=0,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        differentiate=True,
    )
    controller.compute_higher_derivatives()
    results = controller.run_simulation()

    params = model.initial_params()
    gamma_ref = float(product.compute_dDeltadSpot_analytically(model, params))
    vomma_ref = float(product.compute_dVegadSigma_analytically(model, params))

    gamma = results.get_second_derivatives("ns", "pv", param1="spot", param2="spot",
                                           evaluation_idx=0)
    vomma = results.get_second_derivatives("ns", "pv", param1="volatility",
                                           param2="volatility", evaluation_idx=0)
    assert abs(gamma - gamma_ref) < 1e-9
    assert abs(vomma - vomma_ref) < 1e-9

    # named-dict access for a full Hessian row
    row = results.get_second_derivatives("ns", "pv", param1="spot", evaluation_idx=0)
    assert set(row.keys()) == {"spot", "volatility", "rate"}
    # symmetry
    dsv = results.get_second_derivatives("ns", "pv", param1="spot", param2="volatility",
                                         evaluation_idx=0)
    dvs = results.get_second_derivatives("ns", "pv", param1="volatility", param2="spot",
                                         evaluation_idx=0)
    assert abs(dsv - dvs) < 1e-9
