"""Counter-based RNG key discipline.

The reference relies on torch's *global* RNG with seeds 42 (pre-simulation)
and 43 (main simulation) (engine.py:25), extra in-step uniforms for the
Heston QE exp-mixture branch (heston.py:192), and a separate numpy
Generator(12345) for barrier Brownian-bridge uniforms (barrier_option.py:50).

TPU-native replacement: a single threefry root key, deterministically folded
per (phase, step, purpose).  This makes every random draw a pure function of
(root_seed, coordinates) — reproducible regardless of device count, sharding,
or evaluation order, which is the distributed-determinism property SURVEY.md
§5 calls for.
"""

from __future__ import annotations

import jax.random as jrandom

# Phase identifiers (folded into the root key).
PHASE_PRESIM = 42       # reference pre-simulation seed (engine.py:25)
PHASE_MAINSIM = 43      # reference main-simulation seed (engine.py:25)
PHASE_BRIDGE = 12345    # barrier Brownian-bridge stream (barrier_option.py:50)

# Purpose identifiers within a step.
PURPOSE_NORMAL = 0      # correlated Gaussian increments
PURPOSE_UNIFORM = 1     # QE exp-mixture uniforms (heston.py:192)
PURPOSE_QMC_SHIFT = 2   # per-dimension digital-shift words (ops/sobol.py)


def root_key(seed: int = 0):
    return jrandom.key(seed)


def phase_key(root, phase: int):
    return jrandom.fold_in(root, phase)


def step_key(phase, step_index, purpose: int):
    """Key for one (sub)step and purpose; step_index may be traced."""
    return jrandom.fold_in(jrandom.fold_in(phase, step_index), purpose)


def normals(key, shape, dtype):
    return jrandom.normal(key, shape, dtype=dtype)


def uniforms(key, shape, dtype):
    return jrandom.uniform(key, shape, dtype=dtype)


def qmc_shift(phase, num_dims: int):
    """Per-dimension 32-bit digital-shift words for the Sobol sampler.

    Drawn once per phase from the same threefry tree as every other stream,
    so scrambled-QMC runs keep the (root_seed, coordinates)-pure determinism
    contract; presim/mainsim shifts are independent."""
    import jax.numpy as jnp

    return jrandom.bits(
        step_key(phase, 0, PURPOSE_QMC_SHIFT), (num_dims,), dtype=jnp.uint32
    )
