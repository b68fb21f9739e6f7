"""CVA vs inter-asset correlation: a wrong-way-risk sweep.

Counterpart of the reference demo tests/exposure_tests/cva_interest_rate_swap.py
(CVA-vs-rho sweep): prices the CVA of a payer swap under a hybrid
Vasicek (rates) x CIR++ (credit) model for a grid of rate-credit correlations.

Run: python examples/cva_wwr_sweep.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from montecarlo_risk_engine_tpu import (
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

HAZARDS = {1.0: 0.02, 2.0: 0.022, 3.0: 0.025, 5.0: 0.028, 10.0: 0.02}
CP = "counterparty"


def cva_for_rho(rho: float, num_paths=50_000):
    rates = VasicekModel(0.0, rate=0.03, mean=0.05, mean_reversion_speed=0.05,
                         volatility=0.015, asset_id="irs")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZARDS, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig([rates, credit],
                        inter_asset_correlation_matrix=[np.array([[rho]])])
    swap = InterestRateSwap(0.0, 5.0, notional=100.0, fixed_rate=0.03,
                            tenor_fixed=0.25, tenor_float=0.25,
                            irs_type=IRSType.PAYER, asset_id="irs")
    metric = CVAMetric(counterparty_id=CP, recovery_rate=0.4)
    controller = SimulationController(
        netting_sets=[NettingSet(name="ns", products=[swap], counterparty_id=CP)],
        model=model,
        risk_metrics=RiskMetrics(metrics=[metric],
                                 exposure_timeline=np.linspace(0.0, 5.0, 40)),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=2,
        simulation_scheme=SimulationScheme.EULER,
    )
    results = controller.run_simulation()
    return (
        float(results.get_results("ns", metric.get_name(), evaluation_idx=0)),
        float(results.get_mc_error("ns", metric.get_name(), evaluation_idx=0)),
    )


def main():
    print(f"{'rho':>6} {'CVA':>10} {'SE':>8}")
    for rho in (-0.9, -0.5, 0.0, 0.5, 0.9):
        cva, se = cva_for_rho(rho)
        print(f"{rho:6.2f} {cva:10.5f} {se:8.5f}")


if __name__ == "__main__":
    main()
