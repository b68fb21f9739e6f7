"""PV oracles for basket (golden 12.60 + control variate), barrier (analytic),
binary (analytic), Asian (put-call relation), bond/swap (closed forms).

Mirrors reference tests/pytests/test_pv_basket_option.py:70-71,
test_model_config.py:70-71, plus the barrier analytic formulas
(barrier_option.py:245-301).
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BarrierOption,
    BarrierOptionType,
    BasketOption,
    BasketOptionType,
    BinaryOption,
    BlackScholesModel,
    BlackScholesMulti,
    Bond,
    Equity,
    EuropeanOption,
    ModelConfig,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
    VasicekModel,
)


def _pv(model, product, num_paths=200_000, num_steps=1,
        scheme=SimulationScheme.ANALYTICAL):
    controller = SimulationController(
        netting_sets=[NettingSet(name="p", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=0,
        num_steps=num_steps,
        simulation_scheme=scheme,
    )
    results = controller.run_simulation()
    return (
        float(results.get_results("p", "pv", evaluation_idx=0)),
        float(results.get_mc_error("p", "pv", evaluation_idx=0)),
    )


def _basket_model():
    # reference golden config (test_pv_basket_option.py:22-34): sigma=0.4,
    # rho=0.5, r=0 -> arithmetic basket PV ~ 12.60
    corr = 0.5 * np.ones((4, 4)) + 0.5 * np.eye(4)
    return BlackScholesMulti(
        0.0, rate=0.0, asset_ids=["a", "b", "c", "d"],
        spots=[100.0] * 4, volatilities=[0.4] * 4, correlation_matrix=corr,
    )


def test_basket_arithmetic_with_control_variate_matches_golden():
    # Reference golden: arithmetic basket PV ~ 12.60 (test_pv_basket_option.py:70)
    model = _basket_model()
    product = BasketOption(1.0, ["a", "b", "c", "d"], [0.25] * 4, 100.0,
                           OptionType.CALL, BasketOptionType.ARITHMETIC,
                           use_variation_reduction=True)
    pv, se = _pv(model, product)
    assert abs(pv - 12.60) < 0.08, (pv, se)
    # control variate collapses the MC error far below the plain estimator
    assert se < 0.05


def test_basket_geometric_matches_closed_form():
    model = _basket_model()
    product = BasketOption(1.0, ["a", "b", "c", "d"], [0.25] * 4, 100.0,
                           OptionType.CALL, BasketOptionType.GEOMETRIC)
    pv, se = _pv(model, product)
    ref = float(product.compute_pv_analytically(model, model.initial_params()))
    assert abs(pv - ref) < 4 * se + 1e-6


def test_barrier_up_and_out_call_vs_analytic():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2, asset_id="eq")
    product = BarrierOption(0.0, 1.0, 90.0, 101, OptionType.CALL,
                            140.0, BarrierOptionType.UPANDOUT, asset_id="eq")
    product.set_use_brownian_bridge()
    pv, se = _pv(model, product, num_paths=200_000)
    ref = float(product.compute_pv_analytically(model, model.initial_params()))
    # Discrete monitoring + bridge correction vs continuous-barrier formula
    assert abs(pv - ref) < max(6 * se, 0.06 * ref), (pv, ref, se)


def test_barrier_down_and_out_call_vs_analytic():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2, asset_id="eq")
    product = BarrierOption(0.0, 1.0, 100.0, 101, OptionType.CALL,
                            80.0, BarrierOptionType.DOWNANDOUT, asset_id="eq")
    product.set_use_brownian_bridge()
    pv, se = _pv(model, product, num_paths=200_000)
    ref = float(product.compute_pv_analytically(model, model.initial_params()))
    assert abs(pv - ref) < max(6 * se, 0.03 * ref), (pv, ref, se)


def test_binary_option_vs_analytic():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.25, asset_id="eq")
    product = BinaryOption(1.0, 100.0, 10.0, OptionType.CALL, asset_id="eq")
    pv, se = _pv(model, product, num_paths=400_000)
    ref = float(product.compute_pv_analytically(model, model.initial_params()))
    # fuzzy indicator (eps=1) introduces a small smoothing bias by design
    assert abs(pv - ref) < max(4 * se, 0.02 * ref)


def test_fixed_coupon_bond_pv_matches_vasicek_closed_form():
    model = VasicekModel(0.0, rate=0.03, mean=0.04, mean_reversion_speed=0.5,
                         volatility=0.01, asset_id="ir")
    bond = Bond(0.0, 2.0, notional=1.0, tenor=0.5, pays_notional=True,
                fixed_rate=0.04, asset_id="ir")
    pv, se = _pv(model, bond, num_paths=200_000, num_steps=16)
    params = model.initial_params()
    ref = 0.0
    for t in (0.5, 1.0, 1.5, 2.0):
        ref += 0.04 * 0.5 * float(model.bond_price(params, 0.0, t, params[0]))
    ref += float(model.bond_price(params, 0.0, 2.0, params[0]))
    # left-Riemann numeraire discretisation (quirk Q3) at 16 substeps
    assert abs(pv - ref) < max(4 * se, 3e-3 * ref), (pv, ref, se)


def test_hybrid_model_basket_matches_single_model():
    # ModelConfig of two 2-asset BSMulti blocks with cross correlation ==
    # one 4-asset BSMulti (test_model_config.py pattern)
    corr_block = np.array([[1.0, 0.5], [0.5, 1.0]])
    cross = 0.5 * np.ones((2, 2))
    m1 = BlackScholesMulti(0.0, rate=0.0, asset_ids=["a", "b"], spots=[100.0] * 2,
                           volatilities=[0.4] * 2, correlation_matrix=corr_block)
    m2 = BlackScholesMulti(0.0, rate=0.0, asset_ids=["c", "d"], spots=[100.0] * 2,
                           volatilities=[0.4] * 2, correlation_matrix=corr_block)
    hybrid = ModelConfig([m1, m2], inter_asset_correlation_matrix=[cross])
    product = BasketOption(1.0, ["a", "b", "c", "d"], [0.25] * 4, 100.0,
                           OptionType.CALL, BasketOptionType.ARITHMETIC)
    pv_hybrid, se = _pv(hybrid, product, num_paths=200_000, num_steps=8,
                        scheme=SimulationScheme.EULER)
    assert abs(pv_hybrid - 12.60) < max(5 * se, 0.1), (pv_hybrid, se)
