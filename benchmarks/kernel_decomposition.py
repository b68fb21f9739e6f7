"""Decompose the Heston-QE kernel's cost structure on TPU hardware.

Measures MARGINAL per-kernel cost (k-in-one-program minus 1-in-one-program,
divided by k-1) for a ladder of substep variants, isolating:

  * the fixed per-dispatch host round-trip (axon relay ~20ms — absent on an
    attached chip), which single-dispatch timings are dominated by;
  * the hardware-PRNG bit cost (unmeasurably small);
  * Box-Muller's transcendentals (the real floor, ~2.2ms / 40M path-steps);
  * the QE substep math (scalar-grouped vs naive grouping).

Evidence base for BENCH_NOTES "Where the kernel time actually goes" and for
bench.py's amortized-throughput methodology.  Usage:

    python benchmarks/kernel_decomposition.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_risk_engine_tpu.ops.pallas_paths import (
    _LANES,
    _compiler_params,
    _heston_qe_substep,
    _normal_pair,
    _seed_words,
    _uniforms,
    padded_paths,
)

NUM_PATHS = 1_000_000
NUM_POINTS = 10
NUM_STEPS = 4
ROWS = 256
PARAMS = (100.0, 0.5, 0.03, -0.7, 2.0, 0.06, 0.04)
TIMELINE = [0.1 * (i + 1) for i in range(NUM_POINTS)]


def timeit(fn, *args):
    """Best-of-5 wall clock around a tiny host fetch (block_until_ready does
    not reliably synchronize on remote-relay platforms — same method as
    bench.py)."""
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def substep_none(shape, log_s, v, dt, p):
    """No draws: pure per-substep FMAs — grid/emission overhead floor."""
    return log_s * 0.9999 + 1e-6, v * 0.9999 + 1e-6


def substep_bits(shape, log_s, v, dt, p):
    """3 raw hardware words per path-substep, consumed with an XOR chain."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b3 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    acc = (b1 ^ b2 ^ b3).astype(jnp.float32)
    return log_s + 1e-12 * acc, v + 1e-12 * acc


def substep_box_muller(shape, log_s, v, dt, p):
    """Full draw pipeline (normal pair + uniform), trivial consumption."""
    z1, z2 = _normal_pair(shape)
    u = _uniforms(shape)
    return log_s + 1e-3 * (z1 + z2), v + 1e-3 * u


def _normal_icdf(u):
    """N(0,1) quantile via Giles' single-precision erfinv polynomial:
    z = sqrt(2) * erfinv(2u - 1).  Per normal: 1 log + 1 sqrt (the tail
    branch — the VPU evaluates both branches and selects) + ~18 fma,
    versus Box-Muller's amortized (log + sqrt + sin + cos) / 2 per normal
    but only ONE uniform per normal instead of one per pair."""
    x = 2.0 * u - 1.0
    w = -jnp.log((1.0 - x) * (1.0 + x))
    # central branch |x| <~ 0.993
    wc = w - 2.5
    pc = jnp.float32(2.81022636e-08)
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06, 2.1858087e-04,
              -1.25372503e-03, -4.17768164e-03, 2.46640727e-01, 1.50140941e+00):
        pc = pc * wc + jnp.float32(c)
    # tail branch
    wt = jnp.sqrt(w) - 3.0
    pt = jnp.float32(-2.00214257e-04)
    for c in (1.00950558e-04, 1.34934322e-03, -3.67342844e-03, 5.73950773e-03,
              -7.62246130e-03, 9.43887047e-03, 1.00167406e+00, 2.83297682e+00):
        pt = pt * wt + jnp.float32(c)
    p = jnp.where(w < 5.0, pc, pt)
    return jnp.float32(math_sqrt2) * p * x


math_sqrt2 = 1.4142135623730951


def substep_icdf(shape, log_s, v, dt, p):
    """Draw pipeline with inverse-CDF normals (1 uniform per normal) instead
    of Box-Muller pairs — the VERDICT r3 #6 experiment."""
    z1 = _normal_icdf(_uniforms(shape))
    z2 = _normal_icdf(_uniforms(shape))
    u = _uniforms(shape)
    return log_s + 1e-3 * (z1 + z2), v + 1e-3 * u


def substep_qe_icdf(shape, log_s, v, dt, p):
    """Production QE substep fed by inverse-CDF normals."""
    z_s = _normal_icdf(_uniforms(shape))
    z_v = _normal_icdf(_uniforms(shape))
    u = _uniforms(shape)
    sigma, rate, rho, kappa, theta = p[1], p[2], p[3], p[4], p[5]
    return _heston_qe_substep(log_s, v, z_s, z_v, u, dt, sigma, rate, rho,
                              kappa, theta)


def substep_qe(shape, log_s, v, dt, p):
    """The production substep (scalar-grouped QE, pallas_paths.py)."""
    z_s, z_v = _normal_pair(shape)
    u = _uniforms(shape)
    sigma, rate, rho, kappa, theta = p[1], p[2], p[3], p[4], p[5]
    return _heston_qe_substep(log_s, v, z_s, z_v, u, dt, sigma, rate, rho,
                              kappa, theta)


def _uniforms_batched3(shape):
    """All three substep uniforms from ONE hardware-PRNG call: a single
    [3*rows, 128] bit draw sliced into row bands (fewer, larger PRNG ops)."""
    rows, lanes = shape
    bits = pltpu.bitcast(pltpu.prng_random_bits((3 * rows, lanes)), jnp.int32)
    top24 = jax.lax.shift_right_logical(bits, 8)
    u = top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    return u[:rows], u[rows:2 * rows], u[2 * rows:]


def substep_qe_batched_prng(shape, log_s, v, dt, p):
    """Production QE math fed by ONE batched PRNG call per substep."""
    import math as _m

    u1, u2, u = _uniforms_batched3(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta_a = (2.0 * _m.pi) * u2
    z_s, z_v = r * jnp.cos(theta_a), r * jnp.sin(theta_a)
    sigma, rate, rho, kappa, theta = p[1], p[2], p[3], p[4], p[5]
    return _heston_qe_substep(log_s, v, z_s, z_v, u, dt, sigma, rate, rho,
                              kappa, theta)


def _heston_qe_substep_algebra(log_s, v, z_s, z_v, u, dt, sigma, rate, rho,
                               kappa, theta):
    """Division-reduced QE substep (hard-branch path): the psi ratio is
    eliminated — p = (s2-m2)/(s2+m2) replaces (psi-1)/(psi+1) and the branch
    test psi > 1.5 becomes s2 > 1.5*m2, saving one full vector division per
    substep; numerically identical up to f32 rounding."""
    eps = 1e-12
    ekt = jnp.exp(-kappa * dt)
    one_m_ekt = 1.0 - ekt
    sig2 = sigma * sigma
    c_m = theta * one_m_ekt
    c1 = sig2 * ekt * one_m_ekt / kappa
    c2 = theta * sig2 * one_m_ekt * one_m_ekt / (2.0 * kappa)
    k0 = -rho * kappa * theta / sigma * dt
    k1 = (kappa * rho / sigma - 0.5) * dt - rho / sigma
    k2 = rho / sigma
    k3 = (1.0 - rho * rho) * dt
    drift = rate * dt + k0

    m = c_m + v * ekt
    s2 = v * c1 + c2
    m2 = m * m + eps
    inv_psi = m2 / (s2 + eps)

    tail = jnp.maximum(2.0 * inv_psi - 1.0, 0.0)
    b2 = jnp.maximum(tail + jnp.sqrt(2.0 * inv_psi * tail), 0.0)
    a = m / (1.0 + b2)
    sb2_z = jnp.sqrt(b2) + z_v
    v_quad = a * (sb2_z * sb2_z)

    p = jnp.clip((s2 - m2) / (s2 + m2), 0.0, 1.0 - 1e-6)
    one_m_p = 1.0 - p
    v_tail = (
        jnp.log(jnp.maximum(one_m_p, eps) / jnp.maximum(1.0 - u, eps))
        * (m + eps) / (one_m_p + eps)
    )
    v_exp = jnp.where(u > p, v_tail, 0.0)
    v_next = jnp.where(s2 > 1.5 * m2, v_exp, v_quad)

    vol = jnp.sqrt(jnp.maximum(k3 * v, eps))
    log_s_next = (log_s + drift) + k1 * v + k2 * v_next + vol * z_s
    return log_s_next, v_next


def substep_qe_algebra(shape, log_s, v, dt, p):
    """Division-reduced QE substep, standard draws."""
    z_s, z_v = _normal_pair(shape)
    u = _uniforms(shape)
    sigma, rate, rho, kappa, theta = p[1], p[2], p[3], p[4], p[5]
    return _heston_qe_substep_algebra(log_s, v, z_s, z_v, u, dt, sigma, rate,
                                      rho, kappa, theta)


def substep_qe_combined(shape, log_s, v, dt, p):
    """Batched PRNG + division-reduced math."""
    import math as _m

    u1, u2, u = _uniforms_batched3(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta_a = (2.0 * _m.pi) * u2
    z_s, z_v = r * jnp.cos(theta_a), r * jnp.sin(theta_a)
    sigma, rate, rho, kappa, theta = p[1], p[2], p[3], p[4], p[5]
    return _heston_qe_substep_algebra(log_s, v, z_s, z_v, u, dt, sigma, rate,
                                      rho, kappa, theta)


def build(substep, k):
    """k independent full path generations in ONE jit program; the kernels
    differ by a baked seed offset so nothing CSEs; Mosaic compiles the kernel
    body once (identical shapes)."""
    block_paths = ROWS * _LANES
    padded = padded_paths(NUM_PATHS, ROWS)
    n_blocks = padded // block_paths
    total_rows = padded // _LANES
    intervals = []
    t_prev = 0.0
    for t in TIMELINE:
        intervals.append((t - t_prev) / NUM_STEPS)
        t_prev = t

    def make_kernel(seed_off):
        def kernel(seed_ref, p_ref, logs_ref, v_ref):
            block = pl.program_id(0)
            pltpu.prng_seed(seed_ref[0] + seed_off, seed_ref[1] + block)
            shape = (ROWS, _LANES)
            log_s = jnp.full(shape, 0.0, jnp.float32) + jnp.log(p_ref[0])
            v = jnp.full(shape, 0.0, jnp.float32) + p_ref[6]
            for point in range(NUM_POINTS):
                for _ in range(NUM_STEPS):
                    log_s, v = substep(shape, log_s, v, intervals[point], p_ref)
                logs_ref[point] = log_s
                v_ref[point] = v
        return kernel

    out_shape = jax.ShapeDtypeStruct((NUM_POINTS, total_rows, _LANES), jnp.float32)
    block_spec = pl.BlockSpec((NUM_POINTS, ROWS, _LANES), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)

    @jax.jit
    def run(params_vec):
        acc = 0.0
        for i in range(k):
            outs = pl.pallas_call(
                make_kernel(i), grid=(n_blocks,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=(block_spec,) * 2, out_shape=(out_shape,) * 2,
                compiler_params=_compiler_params(),
            )(_seed_words(7, 43, 0), params_vec)
            acc = acc + outs[0][-1].mean(axis=0)
        return acc

    return run


def main():
    if jax.default_backend() != "tpu":
        print("requires a TPU backend")
        return
    params_vec = jnp.stack([jnp.asarray(p, jnp.float32) for p in PARAMS])
    steps = NUM_PATHS * NUM_POINTS * NUM_STEPS
    variants = [
        ("no-draws", substep_none),
        ("raw-bits-x3", substep_bits),
        ("box-muller", substep_box_muller),
        ("icdf", substep_icdf),
        ("qe-full", substep_qe),
        ("qe-icdf", substep_qe_icdf),
        ("qe-batched-prng", substep_qe_batched_prng),
        ("qe-algebra", substep_qe_algebra),
        ("qe-combined", substep_qe_combined),
    ]
    for name, sub in variants:
        t1 = timeit(build(sub, 1), params_vec)
        t5 = timeit(build(sub, 5), params_vec)
        m = (t5 - t1) / 4
        if m < 1e-4:  # below dispatch-latency noise
            rate = "below measurement noise"
        else:
            rate = f"{steps/m/1e9:8.2f} G path-steps/s"
        print(f"{name:12s}: single-dispatch {t1*1e3:7.2f} ms | "
              f"marginal {m*1e3:7.2f} ms  ({rate})")


if __name__ == "__main__":
    main()
