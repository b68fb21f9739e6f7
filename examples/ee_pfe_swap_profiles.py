"""Exposure profiles (EPE / ENE / PFE) for a payer swap under Vasicek.

Counterpart of the reference demo scripts in tests/exposure_tests/ (e.g.
ee_pfe_swap_collateralized.py): prints the exposure profile table for an
uncollateralized vs a collateralized (MPoR) netting set.

Run: python examples/ee_pfe_swap_profiles.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from montecarlo_risk_engine_tpu import (
    ENEMetric,
    EPEMetric,
    InterestRateSwap,
    IRSType,
    NettingSet,
    PFEMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
    VasicekModel,
)


def run(margin_period_of_risk=None, num_paths=50_000):
    model = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                         volatility=0.012, asset_id="irs")
    swap = InterestRateSwap(0.0, 5.0, notional=100.0, fixed_rate=0.032,
                            tenor_fixed=0.5, tenor_float=0.5,
                            irs_type=IRSType.PAYER, asset_id="irs")
    timeline = np.linspace(0.0, 5.0, 21)
    controller = SimulationController(
        netting_sets=[NettingSet(name="swap_ns", products=[swap],
                                 margin_period_of_risk=margin_period_of_risk)],
        model=model,
        risk_metrics=RiskMetrics(metrics=[EPEMetric(), ENEMetric(), PFEMetric(0.95)],
                                 exposure_timeline=timeline),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=2,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    results = controller.run_simulation()
    return timeline, results


def main():
    for label, mpor in (("uncollateralized", None), ("collateralized MPoR=0.25", 0.25)):
        timeline, results = run(mpor)
        epe = results.get_results("swap_ns", "epe")
        ene = results.get_results("swap_ns", "ene")
        pfe = results.get_results("swap_ns", "pfe[0.95]")
        print(f"\n== {label} ==")
        print(f"{'t':>6} {'EPE':>10} {'ENE':>10} {'PFE95':>10}")
        for t, a, b, c in zip(timeline, epe, ene, pfe):
            print(f"{t:6.2f} {a:10.4f} {b:10.4f} {c:10.4f}")


if __name__ == "__main__":
    main()
