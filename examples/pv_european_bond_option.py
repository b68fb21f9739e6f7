"""European option on a zero-coupon bond under Vasicek vs the closed form.

Counterpart of reference tests/pv_tests/pv_european_bond_option.py: the
Jamshidian-style bond-option formula (reference european_option.py:264-288)
prices an option on a zero bond exactly; the MC estimate under the exact OU
transition converges onto it across strikes.

Run: python examples/pv_european_bond_option.py
"""

from _common import print_profile_table, save_profile_plot, vasicek_model

import numpy as np

from montecarlo_risk_engine_tpu import (
    Bond,
    EuropeanOption,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)


def run(strike, num_paths):
    model = vasicek_model()
    bond = Bond(startdate=0.0, maturity=5.0, notional=1.0, tenor=5.0,
                pays_notional=True, fixed_rate=0.0, asset_id="irs")
    option = EuropeanOption(bond, exercise_date=2.0, strike=strike,
                            option_type=OptionType.CALL, asset_id="irs")
    controller = SimulationController(
        netting_sets=[NettingSet(name="bondopt", products=[option])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=0,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    results = controller.run_simulation()
    pv = float(results.get_results("bondopt", "pv", evaluation_idx=0))
    se = float(results.get_mc_error("bondopt", "pv", evaluation_idx=0))
    analytic = float(option.compute_pv_bond_option_analytically(
        model, model.initial_params()))
    return pv, se, analytic


def main(num_paths=200_000, save_plot=True):
    strikes = np.array([0.80, 0.85, 0.90, 0.95])
    mc, analytic = [], []
    for k in strikes:
        pv, se, ref = run(float(k), num_paths)
        mc.append(pv)
        analytic.append(ref)
        print(f"strike={k:.2f}  MC={pv:.6f} +- {se:.6f}  analytic={ref:.6f}")
        assert abs(pv - ref) < 4.0 * se + 5e-5
    curves = {"MC": np.array(mc), "Jamshidian closed form": np.array(analytic)}
    print_profile_table(strikes, curves)
    if save_plot:
        path = save_profile_plot(
            "pv_european_bond_option.png", strikes, curves,
            "Zero-bond call under Vasicek — MC vs closed form",
            ylabel="PV",
        )
        print(f"saved {path}")
        return path
    return curves


if __name__ == "__main__":
    main()
