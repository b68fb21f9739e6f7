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
from montecarlo_risk_engine_tpu.config import SimulationScheme, enable_compilation_cache
from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
from montecarlo_risk_engine_tpu.models.heston import HestonModel

# Persistent compile cache: repeat runs skip the minutes-long remote AOT
# step; the throughput measurement itself happens after an in-process warmup
# so cached compilation never affects the reported number.
try:
    enable_compilation_cache("/tmp/jax_compile_cache")
except Exception:
    pass

REFERENCE_PATH_STEPS_PER_SEC = 5.03e6  # torch f64 CPU, measured 2026-08-16

NUM_PATHS = 1_000_000
NUM_POINTS = 10
NUM_STEPS = 4


def main():
    import numpy as np

    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.7,
                        kappa=2.0, theta=0.06, v0=0.04)
    params = model.initial_params()
    timeline = [0.1 * (i + 1) for i in range(NUM_POINTS)]

    # Sustained throughput: REPS independent full path generations inside ONE
    # jit program (distinct traced seeds, so nothing CSEs), reduced outputs
    # summed and fetched once.  A single dispatch through the axon relay
    # carries a fixed ~20ms host round-trip that does not exist on attached
    # hardware (measured: 1 kernel 25.7ms vs 4-in-one-program 41.6ms — a
    # 5.3ms marginal kernel); amortizing over REPS reports the chip's
    # sustained rate, which is what a production run — many kernels per
    # program — actually sees.
    REPS = 32

    # Preferred path: fused Pallas kernel with hardware PRNG (TPU only);
    # falls back to the XLA scan engine elsewhere.
    run = None
    if jax.default_backend() == "tpu":
        try:
            from montecarlo_risk_engine_tpu.ops.pallas_paths import heston_qe_paths

            n_pallas = 1_048_576  # multiple of the kernel block size

            @jax.jit
            def run_pallas(seed):
                acc = 0.0
                for i in range(REPS):
                    states = heston_qe_paths(
                        params, timeline, n_pallas, NUM_STEPS, seed=seed + i
                    )
                    acc = acc + states[-1].mean(axis=0)
                return acc

            np.asarray(run_pallas(0))
            run, n_eff = run_pallas, n_pallas
        except Exception:
            run = None
    if run is None:
        @jax.jit
        def run_jnp(seed):
            acc = 0.0
            for i in range(REPS):
                states = simulate_paths(
                    model, params, SimulationScheme.QE, timeline, NUM_PATHS,
                    NUM_STEPS, rng.PHASE_MAINSIM, root_seed=seed + i,
                )
                # Tiny reduced output: forces the full computation while
                # keeping the host transfer negligible (block_until_ready
                # alone does not reliably synchronize on remote relays).
                acc = acc + states[-1].mean(axis=0)
            return acc

        np.asarray(run_jnp(0))
        run, n_eff = run_jnp, NUM_PATHS

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(0))
        best = min(best, time.perf_counter() - t0)

    path_steps = n_eff * NUM_POINTS * NUM_STEPS * REPS
    value = path_steps / best
    print(json.dumps({
        "metric": "path_steps_per_sec_heston_qe_1m",
        "value": value,
        "unit": "path-steps/sec/chip",
        "vs_baseline": value / REFERENCE_PATH_STEPS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
