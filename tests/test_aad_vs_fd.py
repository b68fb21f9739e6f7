"""AAD sensitivities vs finite differences through the full pipeline.

Mirrors reference tests/pytests/test_cva_large_netting_set_aad_vs_fd.py:26-57:
pathwise derivatives of CVA on a multi-product netting set against central
finite differences of the whole simulation (same RNG stream on both sides, so
the FD is exact up to O(h^2)).
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    CIRPPModel,
    CVAMetric,
    EPEMetric,
    EuropeanOption,
    Equity,
    BlackScholesModel,
    InterestRateSwap,
    IRSType,
    ModelConfig,
    NettingSet,
    OptionType,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
    VasicekModel,
)

HAZARDS = {1.0: 0.02, 2.0: 0.022, 5.0: 0.025, 10.0: 0.02}
CP = "cp"


def _build_controller(spot_shift=0.0, rate_shift=0.0, differentiate=False,
                      num_paths=4000):
    rates = VasicekModel(0.0, rate=0.03 + rate_shift, mean=0.04,
                         mean_reversion_speed=0.3, volatility=0.01, asset_id="irs")
    equity = BlackScholesModel(0.0, spot=100.0 + spot_shift, rate=0.03, sigma=0.2,
                               asset_id="eq")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZARDS, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig(
        [rates, equity, credit],
        inter_asset_correlation_matrix=[
            np.array([[0.2]]), np.array([[0.3]]), np.array([[0.1]]),
        ],
    )
    products = [
        InterestRateSwap(0.0, 3.0, notional=1.0, fixed_rate=0.03, tenor_fixed=0.5,
                         tenor_float=0.5, irs_type=IRSType.PAYER, asset_id="irs"),
        EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL, asset_id="eq"),
    ]
    ns = NettingSet(name="book", products=products, counterparty_id=CP)
    cva = CVAMetric(counterparty_id=CP, recovery_rate=0.4)
    controller = SimulationController(
        netting_sets=[ns],
        model=model,
        risk_metrics=RiskMetrics(metrics=[cva, EPEMetric()],
                                 exposure_timeline=np.linspace(0.0, 3.0, 13)),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=differentiate,
    )
    return controller, cva


def _cva_value(spot_shift=0.0, rate_shift=0.0):
    controller, cva = _build_controller(spot_shift=spot_shift, rate_shift=rate_shift)
    results = controller.run_simulation()
    return float(results.get_results("book", cva.get_name(), evaluation_idx=0))


@pytest.mark.slow
def test_cva_aad_matches_finite_differences():
    controller, cva = _build_controller(differentiate=True)
    results = controller.run_simulation()
    grads = results.get_derivatives("book", cva.get_name(), evaluation_idx=0)

    h_spot = 0.5
    fd_spot = (_cva_value(spot_shift=h_spot) - _cva_value(spot_shift=-h_spot)) / (2 * h_spot)
    assert abs(grads["eq.spot"] - fd_spot) < 2e-3, (grads["eq.spot"], fd_spot)

    h_rate = 1e-3
    fd_rate = (_cva_value(rate_shift=h_rate) - _cva_value(rate_shift=-h_rate)) / (2 * h_rate)
    assert abs(grads["irs.rate"] - fd_rate) < 0.1 * max(1.0, abs(fd_rate)), (
        grads["irs.rate"], fd_rate,
    )
