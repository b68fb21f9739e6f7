"""Headline benchmark: Heston QE path-generation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload (BASELINE.md driver metric): Andersen-QE Heston path generation,
1M paths x 40 sub-steps, matching the reference engine's hot loop
(reference: src/engine/engine.py:95-123 + src/models/heston.py:161-253).

Baseline: the reference engine (torch 2.4 CPU float64) measured on this
machine at 1M paths — 5.03e6 path-steps/sec (see BENCH_NOTES.md).
"""

import json
import time

import jax

# Use the fastest supported dtype on the accelerator (f32 on TPU; the
# reference contract's f64 accuracy tests run on CPU under x64 — see tests/).

from montecarlo_risk_engine_tpu import rng
from montecarlo_risk_engine_tpu.config import SimulationScheme
from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
from montecarlo_risk_engine_tpu.models.heston import HestonModel

REFERENCE_PATH_STEPS_PER_SEC = 5.03e6  # torch f64 CPU, measured 2026-08-16

NUM_PATHS = 1_000_000
NUM_POINTS = 10
NUM_STEPS = 4


def main():
    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.7,
                        kappa=2.0, theta=0.06, v0=0.04)
    params = model.initial_params()
    timeline = [0.1 * (i + 1) for i in range(NUM_POINTS)]

    @jax.jit
    def run(p):
        states = simulate_paths(
            model, p, SimulationScheme.QE, timeline, NUM_PATHS, NUM_STEPS,
            rng.PHASE_MAINSIM,
        )
        # Tiny reduced output: forces the full computation while keeping the
        # host transfer negligible (block_until_ready alone does not reliably
        # synchronize on remote-relay platforms).
        return states[-1].mean(axis=0)

    import numpy as np

    np.asarray(run(params))  # compile + warm-up

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(params))
        best = min(best, time.perf_counter() - t0)

    path_steps = NUM_PATHS * NUM_POINTS * NUM_STEPS
    value = path_steps / best
    print(json.dumps({
        "metric": "path_steps_per_sec_heston_qe_1m",
        "value": value,
        "unit": "path-steps/sec/chip",
        "vs_baseline": value / REFERENCE_PATH_STEPS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
