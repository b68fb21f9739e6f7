"""North-star rehearsal: full xVA run on a 10-product netting set.

BASELINE.md target: CVA + first/second-order Greeks, 10-product netting set,
16M paths on v5p-8.  This harness runs the same pipeline shape on whatever
device is attached (single v5e chip here: 1M paths, f32) and prints the
wall-clock per phase; on a v5p-8 pod slice the same code shards 16M paths over
the mesh via ``path_sharding``.

Usage: python benchmarks/north_star.py [num_paths] [--hessian]
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
    VasicekModel,
    SimulationScheme,
)

HAZARDS = {1.0: 0.02, 2.0: 0.022, 3.0: 0.025, 5.0: 0.028, 10.0: 0.02}
CP = "counterparty"


def build(num_paths: int, hessian: bool, path_sharding=None, grad_chunk_size: int = 8,
          remat_paths: bool = False, streaming="auto", differentiate: bool = True,
          num_paths_presim=None, grad_mode: str = "auto"):
    rates = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
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
    for i in range(5):
        products.append(InterestRateSwap(
            0.0, 2.0 + i, notional=1.0, fixed_rate=0.028 + 0.001 * i,
            tenor_fixed=0.5, tenor_float=0.5,
            irs_type=IRSType.PAYER if i % 2 == 0 else IRSType.RECEIVER,
            asset_id="irs"))
    for i in range(5):
        products.append(EuropeanOption(
            Equity("eq"), 1.0 + 0.75 * i, 90.0 + 5.0 * i,
            OptionType.CALL if i % 2 == 0 else OptionType.PUT, asset_id="eq"))

    netting_set = NettingSet(name="north_star", products=products,
                             counterparty_id=CP, margin_period_of_risk=10 / 252)
    controller = SimulationController(
        netting_sets=[netting_set],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[CVAMetric(counterparty_id=CP, recovery_rate=0.4),
                     EPEMetric(), PFEMetric(0.95)],
            exposure_timeline=np.linspace(0.0, 7.0, 29),
        ),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths if num_paths_presim is None else num_paths_presim,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=differentiate,
        path_sharding=path_sharding,
        grad_chunk_size=grad_chunk_size,
        remat_paths=remat_paths,
        streaming=streaming,
        grad_mode=grad_mode,
    )
    if hessian:
        controller.compute_higher_derivatives()
    return controller


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_paths = int(args[0]) if args else 1_000_000
    hessian = "--hessian" in sys.argv
    chunk = 8
    for a in sys.argv[1:]:
        if a.startswith("--chunk="):
            chunk = int(a.split("=")[1])

    streaming = "auto"
    if "--plane" in sys.argv:
        streaming = False
    elif "--streaming" in sys.argv:
        streaming = True
    grad_mode = "auto"
    for a in sys.argv[1:]:
        if a.startswith("--grad-mode="):
            grad_mode = a.split("=")[1]
    controller = build(num_paths, hessian, grad_chunk_size=chunk,
                       remat_paths="--remat" in sys.argv,
                       streaming=streaming, grad_mode=grad_mode)
    t0 = time.perf_counter()
    results = controller.run_simulation()
    cold = time.perf_counter() - t0
    t1 = time.perf_counter()
    controller.run_simulation()
    warm = time.perf_counter() - t1

    cva = float(results.get_results("north_star", f"cva[{CP}]", evaluation_idx=0))
    grads = results.get_derivatives("north_star", f"cva[{CP}]", evaluation_idx=0)
    out = {
        "metric": "north_star_xva_wallclock",
        "value": warm,
        "unit": "seconds (warm, CVA+EPE+PFE+first-order AAD)",
        "num_paths": num_paths,
        "hessian": hessian,
        "total_seconds_cold": cold,
        "cva": cva,
        "dcva_drate": float(grads["irs.rate"]),
        "dcva_dspot": float(grads["eq.spot"]),
    }
    if hessian:
        h = results.get_second_derivatives("north_star", f"cva[{CP}]",
                                           param1="eq.spot", param2="eq.spot",
                                           evaluation_idx=0)
        out["d2cva_dspot2"] = float(h)
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats:
            out["hbm_peak_bytes"] = int(
                stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)))
            out["hbm_limit_bytes"] = int(stats.get("bytes_limit", 0))
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
