"""Basket option: geometric closed form + control-variate variance reduction.

Counterpart of reference tests/pv_tests/pv_basket_option.py: the geometric
basket under multi-asset Black-Scholes has a closed form (reference
basket_option.py:103-140); the arithmetic basket priced with the geometric
payoff as a control variate (basket_option.py:72-78) cuts the MC error by an
order of magnitude at identical path counts.

Run: python examples/pv_basket_option.py
"""

import numpy as np

from montecarlo_risk_engine_tpu import (
    BasketOption,
    BasketOptionType,
    BlackScholesMulti,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)

ASSETS = ["a0", "a1", "a2", "a3"]


def _model():
    corr = 0.3 * np.ones((4, 4)) + 0.7 * np.eye(4)
    return BlackScholesMulti(
        0.0, rate=0.03, asset_ids=ASSETS, spots=[100.0, 95.0, 105.0, 110.0],
        volatilities=[0.2, 0.25, 0.18, 0.3], correlation_matrix=corr,
    )


def run(basket_type, use_cv, num_paths):
    model = _model()
    option = BasketOption(
        maturity=2.0, asset_ids=ASSETS, weights=[0.25] * 4, strike=100.0,
        option_type=OptionType.CALL, basket_option_type=basket_type,
        use_variation_reduction=use_cv,
    )
    controller = SimulationController(
        netting_sets=[NettingSet(name="basket", products=[option])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=0,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    results = controller.run_simulation()
    pv = float(results.get_results("basket", "pv", evaluation_idx=0))
    se = float(results.get_mc_error("basket", "pv", evaluation_idx=0))
    return pv, se, option, model


def main(num_paths=100_000, save_plot=False):
    geo, geo_se, option, model = run(BasketOptionType.GEOMETRIC, False, num_paths)
    geo_analytic = float(option.compute_pv_analytically(model, model.initial_params()))
    arith, arith_se, _, _ = run(BasketOptionType.ARITHMETIC, False, num_paths)
    arith_cv, cv_se, _, _ = run(BasketOptionType.ARITHMETIC, True, num_paths)
    print(f"geometric MC        {geo:10.6f} +- {geo_se:.6f}  (analytic {geo_analytic:.6f})")
    print(f"arithmetic plain MC {arith:10.6f} +- {arith_se:.6f}")
    print(f"arithmetic + CV     {arith_cv:10.6f} +- {cv_se:.6f}"
          f"  (variance reduction {arith_se / cv_se:.1f}x)")
    assert abs(geo - geo_analytic) < 4.0 * geo_se + 1e-10
    assert cv_se < arith_se
    return {"geometric": geo, "geometric_analytic": geo_analytic,
            "arithmetic": arith, "arithmetic_cv": arith_cv,
            "se_plain": arith_se, "se_cv": cv_se}


if __name__ == "__main__":
    main()
