"""Parametrized smoke parity: one case per product family through the full
controller, asserting finite PV / MC error / derivatives at small path counts.

Mirrors reference tests/pytests/test_single_product_executor_parity.py:33-239.
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    AmericanOption,
    AsianAveragingType,
    AsianOption,
    BarrierOption,
    BarrierOptionType,
    BasketOption,
    BasketOptionType,
    BermudanOption,
    BinaryOption,
    BlackScholesModel,
    BlackScholesMulti,
    Bond,
    Equity,
    EuropeanOption,
    InterestRateSwap,
    IRSType,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
    VasicekModel,
)
from montecarlo_risk_engine_tpu.products.flexicall import FlexiCall


def _bs_model():
    return BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.25, asset_id="eq")


def _bs_multi_model():
    return BlackScholesMulti(
        0.0, rate=0.03, asset_ids=["a", "b"], spots=[100.0, 90.0],
        volatilities=[0.2, 0.3], correlation_matrix=np.array([[1.0, 0.3], [0.3, 1.0]]),
    )


def _vasicek_model():
    return VasicekModel(0.0, rate=0.03, mean=0.04, mean_reversion_speed=0.5,
                        volatility=0.01, asset_id="ir")


CASES = {
    "european": lambda: (_bs_model(), EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL, asset_id="eq")),
    "binary": lambda: (_bs_model(), BinaryOption(1.0, 100.0, 10.0, OptionType.CALL, asset_id="eq")),
    "asian": lambda: (_bs_model(), AsianOption(0.0, 1.0, 100.0, 12, OptionType.CALL,
                                               AsianAveragingType.ARITHMETIC, asset_id="eq")),
    "barrier": lambda: (_bs_model(), BarrierOption(0.0, 1.0, 100.0, 13, OptionType.CALL,
                                                   130.0, BarrierOptionType.UPANDOUT, asset_id="eq")),
    "basket": lambda: (_bs_multi_model(), BasketOption(1.0, ["a", "b"], [0.5, 0.5], 95.0,
                                                       OptionType.CALL, BasketOptionType.ARITHMETIC)),
    "bermudan": lambda: (_bs_model(), BermudanOption(Equity("eq"), [0.5, 1.0, 1.5], 100.0,
                                                     OptionType.PUT, asset_id="eq")),
    "american": lambda: (_bs_model(), AmericanOption(Equity("eq"), 1.0, 13, 100.0,
                                                     OptionType.PUT, asset_id="eq")),
    "flexicall": lambda: (_bs_model(), FlexiCall(
        [EuropeanOption(Equity("eq"), t, 100.0, OptionType.CALL, asset_id="eq") for t in (0.5, 1.0, 1.5)],
        num_exercise_rights=2, asset_id="eq")),
    "bond_frn": lambda: (_vasicek_model(), Bond(0.0, 2.0, 100.0, 0.5, pays_notional=True,
                                                fixed_rate=None, asset_id="ir")),
    "swap": lambda: (_vasicek_model(), InterestRateSwap(0.0, 2.0, 100.0, 0.03, 0.5, 0.5,
                                                        IRSType.PAYER, asset_id="ir")),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_single_product_smoke(name):
    model, product = CASES[name]()
    controller = SimulationController(
        netting_sets=[NettingSet(name=name, products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=256,
        num_paths_presim=256,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        differentiate=True,
    )
    results = controller.run_simulation()
    pv = float(results.get_results(name, "pv", evaluation_idx=0))
    err = float(results.get_mc_error(name, "pv", evaluation_idx=0))
    assert np.isfinite(pv)
    assert np.isfinite(err)
    grads = results.get_derivatives(name, "pv", evaluation_idx=0)
    assert all(np.isfinite(v) for v in grads.values()), grads
