"""CVA on hybrid (rates x credit) models, incl. wrong-way risk ordering.

Mirrors reference tests/pytests/test_cva.py: a zero-coupon corporate bond's
CVA against the analytic expected loss (1-R)(1-S)P, and the WWR ordering test
CVA(rho~1) > CVA(rho=0) by > 3 combined standard errors.
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    Bond,
    CIRPPModel,
    CVAMetric,
    InterestRateSwap,
    IRSType,
    ModelConfig,
    NettingSet,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
    VasicekModel,
)

HAZARDS = {
    0.5: 0.006402303360855854,
    1.0: 0.01553038972325307,
    2.0: 0.009729741230773657,
    3.0: 0.015552544648116201,
    4.0: 0.021196186202801115,
    5.0: 0.02284319986706472,
    7.0: 0.010111423894480876,
    10.0: 0.00613267811172937,
    15.0: 0.0036969930706003337,
    20.0: 0.003791311459217732,
}

CP = "General Motors Co"


def _run_cva_swap(rho, num_paths=50_000, maturity=5.0, n_exposure=50):
    rates = VasicekModel(0.0, rate=0.03, mean=0.05, mean_reversion_speed=0.02,
                         volatility=0.2, asset_id="irs")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZARDS, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig([rates, credit], inter_asset_correlation_matrix=[np.array([[rho]])])
    irs = InterestRateSwap(0.0, maturity, notional=1.0, fixed_rate=0.03,
                           tenor_fixed=0.25, tenor_float=0.25,
                           irs_type=IRSType.PAYER, asset_id="irs")
    cva_metric = CVAMetric(counterparty_id=CP, recovery_rate=0.4)
    controller = SimulationController(
        netting_sets=[NettingSet(name=irs.get_name(), products=[irs], counterparty_id=CP)],
        model=model,
        risk_metrics=RiskMetrics(metrics=[cva_metric],
                                 exposure_timeline=np.linspace(0, maturity, n_exposure)),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=2,
        simulation_scheme=SimulationScheme.EULER,
    )
    results = controller.run_simulation()
    name = irs.get_name()
    return (
        float(results.get_results(name, cva_metric.get_name(), evaluation_idx=0)),
        float(results.get_mc_error(name, cva_metric.get_name(), evaluation_idx=0)),
    )


@pytest.mark.slow
def test_cva_corporate_bond_matches_expected_loss():
    """Zero-coupon bond, deterministic credit: CVA == (1-R)(1-S)P analytically
    up to MC error of the exposure leg (test_cva.py:35-111)."""
    rates = VasicekModel(0.0, rate=0.03, mean=0.05, mean_reversion_speed=1.0,
                         volatility=0.2, asset_id="bond")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZARDS, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001, deterministic=True)
    model = ModelConfig([rates, credit], inter_asset_correlation_matrix=[np.array([[0.0]])])

    maturity = 2.0
    bond = Bond(0.0, maturity, notional=1.0, tenor=maturity, pays_notional=True,
                fixed_rate=0.0, asset_id="bond")
    cva_metric = CVAMetric(counterparty_id=CP, recovery_rate=0.4)
    controller = SimulationController(
        netting_sets=[NettingSet(name=bond.get_name(), products=[bond], counterparty_id=CP)],
        model=model,
        risk_metrics=RiskMetrics(metrics=[cva_metric],
                                 exposure_timeline=np.linspace(0, maturity, 100)),
        num_paths_mainsim=100_000,
        num_paths_presim=100_000,
        num_steps=4,
        simulation_scheme=SimulationScheme.EULER,
    )
    results = controller.run_simulation()
    cva = float(results.get_results(bond.get_name(), cva_metric.get_name(), evaluation_idx=0))
    se = float(results.get_mc_error(bond.get_name(), cva_metric.get_name(), evaluation_idx=0))

    rates_params = rates.initial_params()
    pv_bond = float(rates.bond_price(rates_params, 0.0, maturity, rates_params[0]))
    from montecarlo_risk_engine_tpu.helpers.cs_helper import probability_of_default
    survival = 1.0 - float(probability_of_default(credit.hazard_rates, credit.tenors, maturity))
    expected_loss = (1.0 - 0.4) * (1.0 - survival) * pv_bond

    # Deterministic credit telescopes the CVA sum to (1-R)(1-S(0,T)) x the
    # regression-mean exposure, so the dominant residual is the LSM fit /
    # relu bias (~3e-6 at these settings) plus the CVA estimator's own MC
    # error (se ~ 5e-6) — matching the reference's 2e-6-scale accuracy
    # (ref test_cva.py:111) rather than the exposure leg's 5e-4 PV error.
    assert abs(cva - expected_loss) < max(4.0 * se, 1e-5), (cva, expected_loss, se)


@pytest.mark.slow
def test_cva_wwr_payer_swap_ordering():
    cva_wwr, se_wwr = _run_cva_swap(0.99999)
    cva_uncorr, se_uncorr = _run_cva_swap(0.0)
    diff = cva_wwr - cva_uncorr
    se_diff = (se_wwr**2 + se_uncorr**2) ** 0.5
    assert diff > 3.0 * se_diff, (cva_wwr, cva_uncorr, se_diff)


@pytest.mark.slow
def test_cva_second_order_derivatives_finite():
    """Full Hessian of CVA through the exposure pipeline (the reference's
    compute_higher_derivatives path, controller.py:631-648)."""
    rates = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                         volatility=0.012, asset_id="irs")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZARDS, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig([rates, credit],
                        inter_asset_correlation_matrix=[np.array([[0.2]])])
    swap = InterestRateSwap(0.0, 2.0, 1.0, 0.03, 0.5, 0.5, IRSType.PAYER,
                            asset_id="irs")
    cva_metric = CVAMetric(counterparty_id=CP, recovery_rate=0.4)
    controller = SimulationController(
        netting_sets=[NettingSet(name="b", products=[swap], counterparty_id=CP)],
        model=model,
        risk_metrics=RiskMetrics(metrics=[cva_metric],
                                 exposure_timeline=np.linspace(0.0, 2.0, 9)),
        num_paths_mainsim=2000,
        num_paths_presim=2000,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=True,
    )
    controller.compute_higher_derivatives()
    results = controller.run_simulation()
    hess = results.get_second_derivatives("b", cva_metric.get_name(), evaluation_idx=0)
    values = [v for row in hess.values() for v in row.values()]
    assert all(np.isfinite(v) for v in values)
    # symmetry of the Hessian
    d_rs = results.get_second_derivatives("b", cva_metric.get_name(),
                                          param1="irs.rate", param2="irs.volatility",
                                          evaluation_idx=0)
    d_sr = results.get_second_derivatives("b", cva_metric.get_name(),
                                          param1="irs.volatility", param2="irs.rate",
                                          evaluation_idx=0)
    assert abs(d_rs - d_sr) < 1e-8 * max(1.0, abs(d_rs))
