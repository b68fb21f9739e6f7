"""CVA on a large mixed exposure book (the reference's CVA benchmark).

Mirrors tests/exposure_tests/cva_perfprmance_large_netting_set.py: a
5,000-product mixed book (same families as the PV benchmark at 1/10 scale) on
a hybrid 4-asset BSMulti + CIR++ credit model, MPoR-collateralized netting
set, 80 exposure dates, CVA metric, 1,000 main + 1,000 pre paths.

Usage: python benchmarks/cva_large_book.py [scale] [--aad]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks import _cache

_cache.enable()

from benchmarks.pv_large_book import build_book
from montecarlo_risk_engine_tpu import (
    BlackScholesMulti,
    CIRPPModel,
    CVAMetric,
    ModelConfig,
    NettingSet,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)

CP = "counterparty"
# the reference CVA harness's bootstrapped hazard curve
# (cva_perfprmance_large_netting_set.py:31-43) so the CVA level is directly
# comparable in benchmarks/cva_aad_vs_reference.py
HAZARDS = {0.5: 0.006402303360855854, 1.0: 0.01553038972325307,
           2.0: 0.009729741230773657, 3.0: 0.015552544648116201,
           4.0: 0.021196186202801115, 5.0: 0.02284319986706472,
           7.0: 0.010111423894480876, 10.0: 0.00613267811172937,
           15.0: 0.0036969930706003337, 20.0: 0.003791311459217732}


def main(scale: float = 1.0, aad: bool = False, num_paths: int = 1000,
         grad_mode: str = "auto"):
    full = {"european": 3940, "binary": 100, "basket": 100, "asian": 200,
            "barrier": 400, "american": 180, "flexicall": 70, "storage": 10}
    counts = {k: max(1, int(v * scale)) for k, v in full.items()}

    asset_ids = [f"asset_{i}" for i in range(4)]
    corr = np.full((4, 4), 0.35)
    np.fill_diagonal(corr, 1.0)
    market = BlackScholesMulti(
        0.0, rate=0.03, asset_ids=asset_ids,
        spots=[95.0 + 7.5 * i for i in range(4)],
        volatilities=[0.18 + 0.03 * i for i in range(4)],
        correlation_matrix=corr,
    )
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZARDS, kappa=0.10,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig(
        [market, credit],
        inter_asset_correlation_matrix=[np.zeros((4, 1))],
    )

    products = build_book(asset_ids, counts)
    horizon = max(p.modeling_timeline[-1] for p in products)
    netting_set = NettingSet(
        name="cva_book", products=products, counterparty_id=CP,
        margin_period_of_risk=10 / 252,
    )
    controller = SimulationController(
        netting_sets=[netting_set],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[CVAMetric(counterparty_id=CP, recovery_rate=0.4)],
            exposure_timeline=np.linspace(0.0, horizon, 80),
        ),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=aad,
        grad_mode=grad_mode,
    )

    t0 = time.perf_counter()
    results = controller.run_simulation()
    cold = time.perf_counter() - t0
    t1 = time.perf_counter()
    controller.run_simulation()
    warm = time.perf_counter() - t1

    cva = float(results.get_results("cva_book", f"cva[{CP}]", evaluation_idx=0))
    cva_se = float(results.get_mc_error("cva_book", f"cva[{CP}]", evaluation_idx=0))
    out = {
        "metric": "cva_large_book_products_per_second",
        "value": len(products) / warm,
        "unit": "products/sec (warm)",
        "num_products": len(products),
        "total_seconds_cold": cold,
        "total_seconds_warm": warm,
        "aad": aad,
        "grad_mode": grad_mode,
        "cva": cva,
        "cva_se": cva_se,
    }
    if aad:
        d = results.get_derivatives("cva_book", f"cva[{CP}]", evaluation_idx=0)
        spot_name = next(n for n in results.get_model_param_names() if "spot" in n)
        out["dcva_dspot0"] = float(d[spot_name])
    print(json.dumps(out))


if __name__ == "__main__":
    scale = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 1.0
    gm = "auto"
    for a in sys.argv[1:]:
        if a.startswith("--grad-mode="):
            gm = a.split("=")[1]
    main(scale, aad="--aad" in sys.argv, grad_mode=gm)
