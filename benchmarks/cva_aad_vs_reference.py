"""CVA(+AAD) wall-clock: this framework on TPU vs the reference on torch CPU.

Produces the second BASELINE.json metric ("CVA+AAD Greeks wall-clock vs
reference") as a regenerable JSON artifact, `benchmarks/CVA_AAD_VS_REF.json`,
holding BOTH sides measured on the same machine:

  * reference side — the reference's own CVA benchmark book (5,000-product
    mixed book on hybrid BSMulti+CIR++, MPoR netting set, 80 exposure dates,
    1,000+1,000 paths; tests/exposure_tests/cva_perfprmance_large_netting_set.py:69-185)
    executed through the REFERENCE engine (torch CPU float64), once exactly
    as published (differentiate=False — the reference harness has no AAD
    mode) and once with differentiate=True so the differentiated comparison
    is like-for-like;
  * tpu side — the same book through this framework
    (benchmarks/cva_large_book.py) with full first-order AAD, cold and warm.

Usage:
  python benchmarks/cva_aad_vs_reference.py tpu         # TPU side only
  python benchmarks/cva_aad_vs_reference.py reference   # reference, no AAD
  python benchmarks/cva_aad_vs_reference.py reference --aad
  python benchmarks/cva_aad_vs_reference.py combine     # recompute speedups

Each invocation merges its measurements into the JSON artifact, so the slow
reference-AAD run can be (re)done independently of the TPU side.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

ARTIFACT = Path(__file__).parent / "CVA_AAD_VS_REF.json"
REFERENCE_ROOT = Path(os.environ.get("REFERENCE_ROOT", "/root/reference"))


def _load():
    if ARTIFACT.exists():
        return json.loads(ARTIFACT.read_text())
    return {
        "description": "CVA on the reference's 5,000-product mixed book "
                       "(hybrid BSMulti+CIR++, MPoR netting, 80 exposure "
                       "dates, 1,000 main + 1,000 pre paths): reference "
                       "torch-CPU engine vs this framework on one TPU chip.",
        "book": {"products": 5000, "paths_main": 1000, "paths_pre": 1000,
                 "exposure_points": 80, "scheme": "EULER"},
    }


def _save(data):
    ARTIFACT.write_text(json.dumps(data, indent=2) + "\n")
    print(json.dumps(data, indent=2))


def run_reference(aad: bool):
    """Reference engine, reference book, reference code paths (torch CPU).

    Reuses the reference's OWN builders (build_mixed_book etc.) so the
    workload is theirs by construction, with differentiate the only knob."""
    sys.path.insert(0, str(REFERENCE_ROOT / "src"))
    sys.path.insert(0, str(REFERENCE_ROOT / "tests" / "pv_tests"))
    import numpy as np

    from common.enums import SimulationScheme
    from controller.controller import SimulationController
    from products.netting_set import NettingSet
    from metrics.cva_metric import CVAMetric
    from metrics.risk_metrics import RiskMetrics
    from models.black_scholes_multi import BlackScholesMulti
    from models.cirpp import CIRPPModel
    from models.model_config import ModelConfig
    from pv_performance_large_netting_set import (
        build_correlation_matrix,
        build_mixed_book,
        synchronize_device,
    )

    cp = "mixed_book_counterparty"
    hazards = {0.5: 0.006402303360855854, 1.0: 0.01553038972325307,
               2.0: 0.009729741230773657, 3.0: 0.015552544648116201,
               4.0: 0.021196186202801115, 5.0: 0.02284319986706472,
               7.0: 0.010111423894480876, 10.0: 0.00613267811172937,
               15.0: 0.0036969930706003337, 20.0: 0.003791311459217732}
    asset_ids = [f"asset_{i}" for i in range(4)]
    market = BlackScholesMulti(
        calibration_date=0.0, rate=0.03, asset_ids=asset_ids,
        spots=[95.0 + 7.5 * i for i in range(4)],
        volatilities=[0.18 + 0.03 * i for i in range(4)],
        correlation_matrix=build_correlation_matrix(num_assets=4, rho=0.35),
    )
    credit = CIRPPModel(calibration_date=0.0, asset_id=cp,
                        hazard_rates=hazards, kappa=0.10, theta=0.01,
                        volatility=0.02, y0=0.0001)
    model = ModelConfig(models=[market, credit],
                        inter_asset_correlation_matrix=[np.zeros((4, 1))])
    products, _ = build_mixed_book(
        asset_ids=asset_ids, num_european=3940, num_binary=100,
        num_basket=100, num_asian=200, num_barrier=400, num_american=180,
        num_flexicall=70, num_storage=10,
    )
    horizon = max(float(p.modeling_timeline[-1].item()) for p in products)
    netting_set = NettingSet(
        name="cva_book", products=products, counterparty_id=cp,
        margin_period_of_risk=10 / 252,
    )
    controller = SimulationController(
        netting_sets=[netting_set], model=model,
        risk_metrics=RiskMetrics(
            metrics=[CVAMetric(counterparty_id=cp, recovery_rate=0.4)],
            exposure_timeline=np.linspace(0.0, horizon, 80),
        ),
        num_paths_mainsim=1000, num_paths_presim=1000, num_steps=1,
        simulation_scheme=SimulationScheme.EULER, differentiate=aad,
    )
    synchronize_device()
    t0 = time.perf_counter()
    results = controller.run_simulation()
    synchronize_device()
    elapsed = time.perf_counter() - t0

    cva = float(results.get_results("cva_book", f"cva[{cp}]", evaluation_idx=0))
    key = "reference_aad" if aad else "reference"
    entry = {"engine": "reference torch CPU float64", "aad": aad,
             "total_seconds": elapsed, "cva": cva,
             "products_per_second": len(products) / elapsed}
    if aad:
        grads = results.get_derivatives("cva_book", f"cva[{cp}]",
                                        evaluation_idx=0)
        spot_name = next(n for n in grads if "spot" in n)
        entry["dcva_dspot0"] = float(grads[spot_name])
    data = _load()
    data[key] = entry
    _save(data)


def run_tpu():
    """This framework's side: same book, full first-order AAD, one chip."""
    import subprocess

    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "benchmarks/cva_large_book.py", "1.0", "--aad"],
        capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    r = json.loads(line)
    data = _load()
    data["tpu_aad"] = {
        "engine": "this framework (jax/Pallas), one TPU chip",
        "aad": True,
        "total_seconds_cold": r["total_seconds_cold"],
        "total_seconds_warm": r["total_seconds_warm"],
        "cva": r["cva"],
        "cva_se": r.get("cva_se"),
        "dcva_dspot0": r.get("dcva_dspot0"),
        "num_params": 14,
        "subprocess_seconds": time.perf_counter() - t0,
    }
    _save(data)


def combine():
    data = _load()
    ref = data.get("reference", {}).get("total_seconds")
    ref_aad = data.get("reference_aad", {}).get("total_seconds")
    tpu = data.get("tpu_aad", {})
    if tpu:
        if ref:
            data["speedup_tpu_aad_vs_reference_no_aad_warm"] = (
                ref / tpu["total_seconds_warm"])
            data["speedup_tpu_aad_vs_reference_no_aad_cold"] = (
                ref / tpu["total_seconds_cold"])
        if ref_aad:
            data["speedup_tpu_aad_vs_reference_aad_warm"] = (
                ref_aad / tpu["total_seconds_warm"])
            data["speedup_tpu_aad_vs_reference_aad_cold"] = (
                ref_aad / tpu["total_seconds_cold"])
    _save(data)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "combine"
    if cmd == "reference":
        run_reference(aad="--aad" in sys.argv)
    elif cmd == "tpu":
        run_tpu()
    elif cmd == "combine":
        combine()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
