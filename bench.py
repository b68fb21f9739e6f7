"""Headline benchmark: Heston QE path-generation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload (BASELINE.md driver metric): Andersen-QE Heston path generation,
1M paths x 40 sub-steps, matching the reference engine's hot loop
(reference: src/engine/engine.py:95-123 + src/models/heston.py:161-253).

Baseline: the reference engine (torch 2.4 CPU float64) measured on this
machine at 1M paths — 5.03e6 path-steps/sec (see BENCH_NOTES.md).

Cold-run budget: round 3 unrolled REPS=32 kernel calls into one program,
which produced a 94 MB executable whose compile/load alone blew the
driver's capture window (BENCH_r03.json rc=124).  This version iterates ONE
kernel instance with ``lax.fori_loop`` over a *traced* seed — the program
contains a single Pallas launch, compiles in seconds, and still amortizes
the per-dispatch host round-trip over REPS launches (the sustained-rate
argument from BENCH_NOTES round 3 is unchanged: production programs issue
many kernels per dispatch).
"""

import json
import time

import jax
import jax.numpy as jnp

from montecarlo_risk_engine_tpu import rng
from montecarlo_risk_engine_tpu.config import SimulationScheme, enable_compilation_cache
from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
from montecarlo_risk_engine_tpu.models.heston import HestonModel

# Persistent compile cache: repeat runs skip the remote AOT step entirely;
# the throughput measurement happens after an in-process warmup either way.
try:
    enable_compilation_cache("/tmp/jax_compile_cache")
except Exception:
    pass

REFERENCE_PATH_STEPS_PER_SEC = 5.03e6  # torch f64 CPU, measured 2026-08-16

NUM_PATHS = 1_000_000
NUM_POINTS = 10
NUM_STEPS = 4
# Kernel launches per timed dispatch (fori_loop trips).  The fori_loop makes
# REPS free at compile time (one kernel instance regardless), and the fixed
# per-program cost (~20ms relay dispatch + loop warmup, ~35ms total) no
# longer caps the reported rate: 32 reps measured 10.5G path-steps/s, 256
# reps 12.6G against a ~3.1ms marginal kernel+reduction cost per rep.
REPS = 256
WARMUP_BUDGET_S = 210.0  # if compile+warmup ate more than this, time 1 rep only


def main():
    import numpy as np

    t_start = time.perf_counter()
    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.7,
                        kappa=2.0, theta=0.06, v0=0.04)
    params = model.initial_params()
    timeline = [0.1 * (i + 1) for i in range(NUM_POINTS)]

    # Preferred path: fused Pallas kernel with hardware PRNG (TPU only);
    # falls back to the XLA scan engine elsewhere.  Both variants drive the
    # generator REPS times inside one jit program via fori_loop over a traced
    # seed — one compiled kernel instance, REPS launches, a tiny reduced
    # output fetched once (block_until_ready alone does not reliably
    # synchronize on remote relays).
    run = None
    if jax.default_backend() == "tpu":
        try:
            from montecarlo_risk_engine_tpu.ops.pallas_paths import heston_qe_paths

            n_pallas = 1_048_576  # multiple of the kernel block size

            @jax.jit
            def run_pallas(seed0):
                def body(i, acc):
                    # rows_per_block=64: measured optimum of the round-5
                    # block-size sweep (BENCH_NOTES) — 15.0G vs 12.7G at 256.
                    states = heston_qe_paths(
                        params, timeline, n_pallas, NUM_STEPS, seed=seed0 + i,
                        rows_per_block=64,
                    )
                    return acc + states[-1].mean(axis=0)
                return jax.lax.fori_loop(
                    0, REPS, body, jnp.zeros((2,), jnp.float32))

            np.asarray(run_pallas(0))
            run, n_eff = run_pallas, n_pallas
        except Exception:
            run = None
    if run is None:
        @jax.jit
        def run_jnp(seed0):
            def body(i, acc):
                states = simulate_paths(
                    model, params, SimulationScheme.QE, timeline, NUM_PATHS,
                    NUM_STEPS, rng.PHASE_MAINSIM, root_seed=seed0 + i,
                )
                return acc + states[-1].mean(axis=0).astype(jnp.float32)
            return jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((2,), jnp.float32))

        np.asarray(run_jnp(0))
        run, n_eff = run_jnp, NUM_PATHS

    # Wall-clock guard: a cold compile through the axon relay may be slow;
    # never let measurement overhead push the whole run past the driver's
    # capture budget.
    timed_reps = 3 if (time.perf_counter() - t_start) < WARMUP_BUDGET_S else 1
    best = float("inf")
    for _ in range(timed_reps):
        t0 = time.perf_counter()
        np.asarray(run(1))
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
