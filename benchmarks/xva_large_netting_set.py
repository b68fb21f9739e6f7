"""Exposure/CVA benchmark on a multi-product netting set.

Mirrors the reference harnesses
tests/exposure_tests/ee_performance_large_netting_set.py and
tests/exposure_tests/cva_perfprmance_large_netting_set.py: exposure-profile
pipeline including LSM regression, netting, and CVA on a hybrid
Vasicek + BS + CIR++ model, reporting products_per_second / total_seconds.

This is also the driver's second headline config (BASELINE.md: "CVA+AAD
Greeks wall-clock"): pass --aad to differentiate every metric.

Usage: python benchmarks/xva_large_netting_set.py [num_products] [num_paths] [--aad]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks import _cache

_cache.enable()

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    CIRPPModel,
    CVAMetric,
    EPEMetric,
    Equity,
    EuropeanOption,
    InterestRateSwap,
    IRSType,
    ModelConfig,
    NettingSet,
    OptionType,
    PFEMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)

HAZARDS = {1.0: 0.02, 2.0: 0.022, 3.0: 0.025, 5.0: 0.028, 10.0: 0.02}
CP = "counterparty"


def build(num_products: int, num_paths: int, differentiate: bool):
    from montecarlo_risk_engine_tpu import VasicekModel

    rates = VasicekModel(0.0, rate=0.03, mean=0.04, mean_reversion_speed=0.3,
                         volatility=0.012, asset_id="irs")
    equity = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.22, asset_id="eq")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZARDS, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig(
        [rates, equity, credit],
        inter_asset_correlation_matrix=[
            np.array([[0.25]]), np.array([[0.4]]), np.array([[0.15]]),
        ],
    )

    products = []
    for i in range(num_products):
        if i % 2 == 0:
            products.append(InterestRateSwap(
                0.0, 2.0 + (i % 4), notional=1.0, fixed_rate=0.025 + 0.002 * (i % 5),
                tenor_fixed=0.5, tenor_float=0.5,
                irs_type=IRSType.PAYER if i % 4 < 2 else IRSType.RECEIVER,
                asset_id="irs"))
        else:
            products.append(EuropeanOption(
                Equity("eq"), 1.0 + 0.5 * (i % 5), 90.0 + 5.0 * (i % 5),
                OptionType.CALL if i % 4 < 2 else OptionType.PUT, asset_id="eq"))

    netting_set = NettingSet(name="xva_book", products=products, counterparty_id=CP,
                             margin_period_of_risk=None)
    controller = SimulationController(
        netting_sets=[netting_set],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[CVAMetric(counterparty_id=CP, recovery_rate=0.4),
                     EPEMetric(), PFEMetric(0.95)],
            exposure_timeline=np.linspace(0.0, 6.0, 25),
        ),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=differentiate,
    )
    return controller


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_products = int(args[0]) if args else 100
    num_paths = int(args[1]) if len(args) > 1 else 10_000
    aad = "--aad" in sys.argv

    controller = build(num_products, num_paths, aad)
    t0 = time.perf_counter()
    results = controller.run_simulation()
    elapsed = time.perf_counter() - t0
    # warm re-run for the compile-free number
    t1 = time.perf_counter()
    controller.run_simulation()
    warm = time.perf_counter() - t1

    cva = float(results.get_results("xva_book", f"cva[{CP}]", evaluation_idx=0))
    print(json.dumps({
        "metric": "cva_aad_wallclock" if aad else "ee_pipeline_wallclock",
        "value": num_products / warm,
        "unit": "products/sec (warm)",
        "num_products": num_products,
        "num_paths": num_paths,
        "total_seconds_cold": elapsed,
        "total_seconds_warm": warm,
        "aad": aad,
        "cva": cva,
    }))


if __name__ == "__main__":
    main()
