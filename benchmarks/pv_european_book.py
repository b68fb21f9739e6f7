"""European-option book PV throughput (kernel-in-API fast path).

Mirrors the reference harness tests/pv_tests/pv_performance_bs_multi_european_option_book.py
(options-per-second on a BS-multi European book at 100k paths) — here the
book runs through SimulationController with ``use_pallas="auto"``, so on TPU
the fused hardware-PRNG Pallas kernel generates the paths (VERDICT r1 #3:
kernels must reach users through the API).

Usage: python benchmarks/pv_european_book.py [num_options] [num_paths]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks import _cache

_cache.enable()

from montecarlo_risk_engine_tpu import (
    BlackScholesMulti,
    Equity,
    EuropeanOption,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)


def main(num_options: int = 10_000, num_paths: int = 1 << 20):
    asset_ids = [f"asset_{i}" for i in range(4)]
    corr = np.full((4, 4), 0.35)
    np.fill_diagonal(corr, 1.0)
    model = BlackScholesMulti(
        0.0, rate=0.03, asset_ids=asset_ids,
        spots=[95.0 + 7.5 * i for i in range(4)],
        volatilities=[0.18 + 0.03 * i for i in range(4)],
        correlation_matrix=corr,
    )
    products = [
        EuropeanOption(
            Equity(asset_ids[i % 4]), 0.5 + 0.25 * (i % 10),
            80.0 + (i % 9) * 5.0,
            OptionType.CALL if i % 2 == 0 else OptionType.PUT,
            asset_id=asset_ids[i % 4],
        )
        for i in range(num_options)
    ]
    controller = SimulationController(
        netting_sets=[NettingSet(name="european_book", products=products)],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=0,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    t0 = time.perf_counter()
    results = controller.run_simulation()
    cold = time.perf_counter() - t0
    t1 = time.perf_counter()
    controller.run_simulation()
    warm = time.perf_counter() - t1

    pv = float(results.get_results("european_book", "pv", evaluation_idx=0))
    print(json.dumps({
        "metric": "options_per_second_european_book",
        "value": num_options / warm,
        "unit": "options/sec (warm)",
        "num_options": num_options,
        "num_paths": num_paths,
        "pallas_active": controller._pallas_active,
        "total_seconds_cold": cold,
        "total_seconds_warm": warm,
        "pv": pv,
    }))


if __name__ == "__main__":
    n_opts = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_paths = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    main(n_opts, n_paths)
