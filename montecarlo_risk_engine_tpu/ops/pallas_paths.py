"""Fused Pallas TPU path-generation kernels.

The jnp engine (engine/engine.py) spends ~75% of Heston-QE path-generation
time in threefry bit generation (measured: 42ms of 57ms for 40M path-steps on
v5e).  These kernels fuse the whole trajectory into one Pallas program per
path block:

  * hardware PRNG (`pltpu.prng_seed` / `prng_random_bits`) replaces threefry;
  * normals come from Box–Muller on hardware uniform bits;
  * the state never leaves VMEM between sub-steps — HBM traffic is only the
    per-timeline-point emission;
  * all model parameters ride in SMEM; per-interval dts are compile-time
    constants (static timeline), so the step loop fully unrolls.

Determinism: draws are a pure function of (seed, phase, global block index),
packed into the two ``pltpu.prng_seed`` words as (seed<<8|phase, block) —
phase only ever varies within word 0 and block within word 1, so pre-sim
(phase 42) and main-sim (phase 43) streams can never collide for any block
layout (round-2 advisor finding: the old packed seed ``(root<<1)|phase`` plus
``seed+block`` made mainsim block b replay presim block b+1, which would have
put LSM regressions in-sample).  ``block_offset`` shifts the global block
index so a shard_map'd kernel draws the same stream per *global* block as the
unsharded kernel.  They are a *different* (equally valid) stream from the
threefry engine, so kernel paths are statistically — not bitwise —
equivalent to the jnp engine's.

This module keeps the Heston-QE kernel (QE branch mixing needs the
noise-emitting variant for AD) plus the shared PRNG/seeding/blocking helpers;
every other model family runs as blocks of the time-chunked hybrid kernel
(ops/pallas_hybrid.py).  Differentiated books compose with these kernels via
custom-JVP noise recovery (ops/pallas_paths_ad.py).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TWO_PI = 2.0 * math.pi


def _seed_words(seed, phase, block_offset):
    """SMEM seed vector [seed<<8 | phase, block_offset] (each may be traced).

    Mosaic supports at most TWO prng_seed words, so phase is packed into the
    low byte of word 0 — within a run only the phase varies, so pre-sim and
    main-sim word-0 values are always distinct (no arithmetic sliding like
    the old ``seed + block`` scheme); word 1 is the global block index."""
    word0 = jnp.asarray(seed, dtype=jnp.int32) << 8 | (
        jnp.asarray(phase, dtype=jnp.int32) & 0xFF
    )
    return jnp.stack([word0, jnp.asarray(block_offset, dtype=jnp.int32)])


def _uniforms(shape):
    """U(0,1) in (0, 1): top 24 bits of hardware random words."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    # logical (not arithmetic) shift keeps the top 24 bits non-negative;
    # int32 -> f32 is the only supported Mosaic cast here.
    top24 = jax.lax.shift_right_logical(bits, 8)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _normal_pair(shape):
    """Two independent N(0,1) arrays via Box–Muller."""
    u1 = _uniforms(shape)
    u2 = _uniforms(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _heston_qe_substep(log_s, v, z_s, z_v, u, dt, sigma, rate, rho, kappa, theta,
                       smoothing: bool = False):
    """One Andersen-QE update — same math as HestonModel.step_qe
    (models/heston.py), specialised to f32 VPU arrays.  Model parameters are
    f32 scalars read from SMEM (traced — the controller pipeline jits over
    them), dt is a compile-time constant.

    ``smoothing`` mirrors the model's fuzzy branch indicators (mass-at-zero
    width 0.3, psi-switch width 0.5 — symmetric_linear_smoothing in
    utils/maths.py) so a differentiated kernel run produces the SAME smoothed
    trajectory the XLA engine's validated AAD contract uses; False keeps the
    hard branches of the forward-only speed path.

    Every subexpression that depends only on (params, dt) is grouped into a
    scalar BEFORE touching the per-path vectors: Mosaic does not reassociate
    float math, so ``v * sigma * sigma * ekt ...`` costs one VPU op per
    factor while ``v * c1`` costs one total.  The regrouping (plus
    ``sqrt(a)*sqrt(b) -> sqrt(a*b)``) is worth 1.21x on the whole kernel
    (marginal 3.48 -> 2.88 ms at 1M paths x 40 steps on v5e — BENCH_NOTES
    round 3, "where the kernel time actually goes"); the trajectory is the
    same map up to f32 rounding (statistical-equivalence suites unchanged).
    """
    eps = 1e-12
    # ---- scalars (params x dt only; dt is a compile-time constant) ----
    ekt = jnp.exp(-kappa * dt)
    one_m_ekt = 1.0 - ekt
    sig2 = sigma * sigma
    c_m = theta * one_m_ekt                      # m = c_m + v * ekt
    c1 = sig2 * ekt * one_m_ekt / kappa          # s2 = v * c1 + c2
    c2 = theta * sig2 * one_m_ekt * one_m_ekt / (2.0 * kappa)
    k0 = -rho * kappa * theta / sigma * dt
    k1 = (kappa * rho / sigma - 0.5) * dt - rho / sigma
    k2 = rho / sigma
    k3 = (1.0 - rho * rho) * dt
    drift = rate * dt + k0

    # ---- per-path vector ops ----
    m = c_m + v * ekt
    s2 = v * c1 + c2
    m2 = m * m + eps
    psi = s2 / m2
    inv_psi = m2 / (s2 + eps)

    tail = jnp.maximum(2.0 * inv_psi - 1.0, 0.0)
    b2 = jnp.maximum(tail + jnp.sqrt(2.0 * inv_psi * tail), 0.0)
    a = m / (1.0 + b2)
    sb2_z = jnp.sqrt(b2) + z_v
    v_quad = a * (sb2_z * sb2_z)

    p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-6)
    one_m_p = 1.0 - p
    v_tail = (
        jnp.log(jnp.maximum(one_m_p, eps) / jnp.maximum(1.0 - u, eps))
        * (m + eps) / (one_m_p + eps)
    )
    if smoothing:
        w_mass = jnp.clip((u - p + 0.3) / 0.6, 0.0, 1.0)
        v_exp = w_mass * v_tail
        w = jnp.clip(psi - 1.0, 0.0, 1.0)
        v_next = (1.0 - w) * v_quad + w * v_exp
    else:
        v_exp = jnp.where(u > p, v_tail, 0.0)
        v_next = jnp.where(psi > 1.5, v_exp, v_quad)

    vol = jnp.sqrt(jnp.maximum(k3 * v, eps))
    log_s_next = (log_s + drift) + k1 * v + k2 * v_next + vol * z_s
    return log_s_next, v_next


def heston_qe_paths(
    params,
    timeline: Sequence[float],
    num_paths: int,
    num_steps: int,
    seed: int = 0,
    phase: int = 0,
    block_offset=0,
    calibration_date: float = 0.0,
    rows_per_block: int = 256,
    smoothing: bool = False,
    emit_noise: bool = False,
):
    """Generate Heston QE states at timeline points: returns [T, N, 2] f32.

    Any ``num_paths``: the kernel simulates the next multiple of
    rows_per_block * 128 and slices the tail off.  ``params`` may be traced
    (the controller's jitted pipeline is a function of the flat model
    parameters): the seven scalars ride into the kernel through SMEM.

    ``emit_noise=True`` (requires ``num_steps == 1`` — the AD wrapper's
    substep-dense timeline) additionally returns the per-step raw draws
    ``(z [T, N, 2], u [T, N])`` so the emitted-noise tangent rule
    (ops/pallas_paths_ad.emitted_noise_paths) can re-derive the smoothed QE
    recurrence in XLA — the QE transition is NOT noise-invertible (branch
    mixing and the extra uniform), so unlike the invertible models the
    kernel must ship its own draws.  Zero-dt points emit zero draws.
    """
    if emit_noise and num_steps != 1:
        raise ValueError("emit_noise requires the substep-dense timeline "
                         "(num_steps == 1)")
    params_vec = jnp.stack([jnp.asarray(p, dtype=jnp.float32) for p in params])
    block_paths = rows_per_block * _LANES
    padded = padded_paths(num_paths, rows_per_block)
    n_blocks = padded // block_paths
    total_rows = padded // _LANES

    points = [float(t) for t in timeline]
    t_prev = float(calibration_date)
    intervals = []
    for t in points:
        intervals.append((t - t_prev) / num_steps)
        t_prev = t
    num_points = len(points)

    def kernel(seed_ref, p_ref, logs_ref, v_ref, *noise_refs):
        block = pl.program_id(0)
        # two independent seed words (Mosaic's limit): phase-distinct word 0,
        # global block (= offset + local block under shard_map) as word 1 --
        # no cross-phase or cross-shard stream collisions
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + block)
        shape = (rows_per_block, _LANES)
        spot, sigma, rate, rho = p_ref[0], p_ref[1], p_ref[2], p_ref[3]
        kappa, theta, v0 = p_ref[4], p_ref[5], p_ref[6]
        log_s = jnp.full(shape, 0.0, dtype=jnp.float32) + jnp.log(spot)
        v = jnp.full(shape, 0.0, dtype=jnp.float32) + v0

        for point in range(num_points):
            dt = intervals[point]
            if dt > 0.0:
                for _ in range(num_steps):
                    z_s, z_v = _normal_pair(shape)
                    u = _uniforms(shape)
                    log_s, v = _heston_qe_substep(
                        log_s, v, z_s, z_v, u, dt,
                        sigma, rate, rho, kappa, theta,
                        smoothing=smoothing,
                    )
                if emit_noise:
                    zs_ref, zv_ref, u_ref = noise_refs
                    zs_ref[point] = z_s
                    zv_ref[point] = z_v
                    u_ref[point] = u
            elif emit_noise:
                zs_ref, zv_ref, u_ref = noise_refs
                zero = jnp.zeros(shape, jnp.float32)
                zs_ref[point] = zero
                zv_ref[point] = zero
                u_ref[point] = zero
            logs_ref[point] = log_s
            v_ref[point] = v

    out_shape = jax.ShapeDtypeStruct((num_points, total_rows, _LANES), jnp.float32)
    block_spec = pl.BlockSpec(
        (num_points, rows_per_block, _LANES),
        lambda i: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    n_out = 5 if emit_noise else 2
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(block_spec,) * n_out,
        out_shape=(out_shape,) * n_out,
        compiler_params=_compiler_params(),
    )(_seed_words(seed, phase, block_offset), params_vec)

    flat = [o.reshape(num_points, padded)[:, :num_paths] for o in outs]
    states = jnp.stack(flat[:2], axis=-1)
    if not emit_noise:
        return states
    z = jnp.stack(flat[2:4], axis=-1)  # [T, N, 2] standard normals
    return states, z, flat[4]


# Per-block output budget: the whole [T*D, rows, 128] f32 emission block
# lives in scoped VMEM alongside the step temps — and Mosaic DOUBLE-BUFFERS
# the output window across grid steps, so the block counts twice.  The
# default scoped limit is 16MB (a budgeted 8MB block + its double buffer +
# temps overflowed it for wide-state hybrid kernels); v5e/v5p have 128MB of
# physical VMEM per core, so every kernel raises the limit explicitly and
# the 8MB budget keeps 2x8MB + temps comfortably inside it.
_VMEM_BLOCK_BUDGET_BYTES = 8 << 20
_VMEM_LIMIT_BYTES = 64 << 20


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def pick_rows_per_block(num_paths: int, preferred: int = 256,
                        outputs_per_path: int = 1):
    """Largest rows-per-block <= preferred whose per-block emission
    (outputs_per_path f32 values per path) stays inside the scoped-VMEM
    budget.  The path count does NOT constrain the choice: kernels pad
    internally to a block multiple (see :func:`padded_paths`), so any
    ``num_paths`` is blockable.

    Returns None when no block size >= 8 fits the VMEM budget (the caller
    should fall back to the XLA scan engine)."""
    del num_paths  # kept in the signature for call-site stability
    budget_rows = _VMEM_BLOCK_BUDGET_BYTES // max(1, outputs_per_path * _LANES * 4)
    rows = preferred
    while rows > budget_rows and rows >= 8:
        rows //= 2
    return rows if rows >= 8 else None


def pick_rows_for_model(model, num_paths: int, outputs_per_path: int,
                        preferred: int = None):
    """rows_per_block for ``model``'s kernel, or None (XLA engine fallback).

    Time-chunked kernels (``model.pallas_time_chunked`` — the hybrid kernel,
    ops/pallas_hybrid.py) stream emissions to HBM chunk by chunk, so any
    timeline length fits at the preferred row count; single-pass kernels must
    fit the whole trajectory block in scoped VMEM (pick_rows_per_block).

    ``preferred`` defaults to the model's ``pallas_preferred_rows`` (so the
    sharded and unsharded paths always agree on the block layout — the
    global-block seeding contract, ops/pallas_shard.py)."""
    if preferred is None:
        preferred = getattr(model, "pallas_preferred_rows", 256)
    if getattr(model, "pallas_time_chunked", False):
        return preferred
    return pick_rows_per_block(num_paths, preferred=preferred,
                               outputs_per_path=outputs_per_path)


def padded_paths(num_paths: int, rows_per_block: int) -> int:
    """Smallest multiple of the kernel block (rows*128) >= num_paths.

    Kernels simulate the padded count and slice the tail off: seeding is
    per block, so the real paths' draws are untouched and ANY path count is
    kernel-eligible (1,000,000 is not divisible by any rows*128 — the
    pre-padding gate silently sent such books to the scan engine)."""
    bp = rows_per_block * _LANES
    return -(-num_paths // bp) * bp


