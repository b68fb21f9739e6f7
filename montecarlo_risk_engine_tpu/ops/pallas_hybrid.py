"""Fused hybrid-model Pallas path kernel (joint correlated sub-models).

Round-2 verdict item #6: only BS / BS-multi / Vasicek / Heston-QE had fused
kernels, so CVA books on the hybrid BS+Vasicek+CIR++ model — the north-star
composition (benchmarks/north_star.py, reference
tests/exposure_tests/cva_perfprmance_large_netting_set.py:79-185) — never hit
the kernel path.  This kernel generates ALL sub-model blocks jointly in one
Pallas program per path block:

  * one correlated-normal prologue per substep: ``sim_dim`` hardware-PRNG
    normals combined through the **static** joint Cholesky factor (for the
    supported block set — BS, Vasicek, CIR++ — every intra-block correlation
    is an identity and the inter blocks are user config, so the joint factor
    is compile-time constant, like bs_multi_paths' correlation);
  * per-block updates in VMEM registers: BS (exact log-normal or Euler),
    Vasicek (exact OU or Euler, left-Riemann log_B — quirk Q3), CIR++
    (full-truncation Euler with the lambda accumulator; the psi(t) shift's
    D/E closed forms are scalar SMEM math on traced params, the
    piecewise-constant market hazard is baked per substep);
  * model parameters ride in one flat SMEM vector (traced — the controller
    pipeline jits over them); seeds follow the (seed<<8|phase, global block)
    two-word scheme of ops/pallas_paths.py.

The block list is Python metadata (``KernelBlock``) built by the owning
model's ``pallas_paths``; the kernel is generated per (blocks, timeline,
scheme) combination and cached by jit like any traced function.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_risk_engine_tpu.ops.pallas_paths import (
    _LANES,
    _compiler_params,
    _normal_pair,
    _seed_words,
    padded_paths,
)


@dataclass(frozen=True)
class KernelBlock:
    """One sub-model's slice of the joint kernel.

    kind: "bs" | "bs_multi" | "vasicek" | "cirpp" | "cirpp_det" | "hw" | "s2f"
    scheme: "exact" | "euler" (cirpp: euler only; cirpp_det: no noise)
    param_base: offset of the block's parameters in the flat SMEM vector
    n_state / n_sim: state and driver-noise widths (bs_multi: both =
        num_assets, params [spots..., vols..., rate] per BlackScholesMulti)
    hazard_tenors / hazard_rates: static market hazard curve (cirpp only)
    curve_times / curve_vals: static market curve (hw: f64 piecewise-constant
        segment forwards, one per pillar interval; s2f: baseline forward
        values) — evaluated HOST-side at the static substep times, so only
        the traced-param part of the drift is SMEM math
    """

    kind: str
    scheme: str
    param_base: int
    n_state: int
    n_sim: int
    hazard_tenors: Tuple[float, ...] = field(default=())
    hazard_rates: Tuple[float, ...] = field(default=())
    curve_times: Tuple[float, ...] = field(default=())
    curve_vals: Tuple[float, ...] = field(default=())

    def lambda_market(self, t: float) -> float:
        """Piecewise-constant hazard, flat beyond the last tenor — static
        (host) mirror of CIRPPModel._lambda_market.  Tenor comparison is
        quantized to f32 to match the device searchsorted exactly (a segment
        mismatch at a straddling substep feeds the AD noise inversion a
        different drift than the kernel used)."""
        import numpy as _np

        t32 = _np.float32(t)
        for tenor, rate in zip(self.hazard_tenors, self.hazard_rates):
            if t32 <= _np.float32(tenor):
                return rate
        return self.hazard_rates[-1]

    def hw_fwd0(self, t: float) -> float:
        """Instantaneous market forward f(0,t) — host mirror of
        HullWhiteModel._fwd0.  curve_vals carries the model's f64 host
        segment-forward table directly (curve_times the pillars), so both
        sides read the SAME piecewise-constant value: right-continuous at
        pillars, first/last segment beyond the ends.  Any value gap here
        reappears as spurious sigma-sensitivity through the AD path's noise
        inversion (c/scale contamination — hull_white.py __init__)."""
        import numpy as _np

        # Segment choice quantized to f32: the model's device lookup compares
        # f32(t) against f32 pillars, so a point that straddles a pillar only
        # in f64 must land on the same segment here.
        ts = _np.asarray(self.curve_times, dtype=_np.float32)
        fwds = _np.asarray(self.curve_vals, dtype=_np.float64)
        idx = int(_np.clip(
            _np.searchsorted(ts, _np.float32(t), side="right") - 1,
            0, len(fwds) - 1,
        ))
        return float(fwds[idx])

    def s2f_logf0(self, t: float) -> float:
        """log of the baseline forward curve F0(t) — host mirror of
        SchwartzTwoFactorModel._curve_value (flat extrapolation both ends
        per jnp.interp semantics)."""
        import numpy as _np

        ts, vs = _np.asarray(self.curve_times), _np.asarray(self.curve_vals)
        return float(_np.log(_np.interp(t, ts, vs)))


def _cirpp_psi(p_ref, base: int, t: float, lam_mkt: float):
    """psi(t) = lambda_market(t) + D(t) - y0 E(t) on SMEM scalars (traced
    params, static t) — mirrors CIRPPModel._D/_E closed forms."""
    kappa, theta, sigma, y0 = (
        p_ref[base], p_ref[base + 1], p_ref[base + 2], p_ref[base + 3]
    )
    h = jnp.sqrt(kappa * kappa + 2.0 * sigma * sigma)
    et = jnp.exp(h * t)
    den = 2.0 * h + (kappa + h) * (et - 1.0)
    d_t = (2.0 * kappa * theta / (sigma * sigma)) * (
        0.5 * (kappa + h) - h * (kappa + h) * et / den
    )
    e_t = 4.0 * h * h * et / (den * den)
    return lam_mkt + d_t - y0 * e_t


def _time_chunk_points(state_dim: int, rows_per_block: int) -> int:
    """Timeline points per emission chunk: the out block per grid step is
    [tc, state_dim, rows, 128] f32 and must fit the scoped-VMEM block budget
    (double-buffered by the pipeline).  The grid's sequential minor dimension
    walks the timeline, so ANY timeline length is kernel-eligible — long
    timelines just take more chunks (round-3: the 5k-product CVA book's
    688-point timeline used to fall back to the XLA engine because the whole
    [T, D, rows, 128] trajectory had to live in VMEM at once)."""
    from montecarlo_risk_engine_tpu.ops.pallas_paths import (
        _VMEM_BLOCK_BUDGET_BYTES,
    )

    return max(
        1, _VMEM_BLOCK_BUDGET_BYTES // (state_dim * rows_per_block * _LANES * 4)
    )


def hybrid_paths(
    blocks: Sequence[KernelBlock],
    chol,  # [sim_dim, sim_dim] static lower-triangular joint factor
    timeline: Sequence[float],
    num_paths: int,
    num_steps: int,
    seed: int = 0,
    phase: int = 0,
    block_offset=0,
    calibration_date: float = 0.0,
    rows_per_block: int = 256,
    params_vec=None,
    time_chunk_points: int = None,
):
    """Joint states at timeline points: [T, N, D_state_total] f32.

    ``params_vec``: flat [P] f32 vector of every block's parameters (may be
    traced), indexed by each block's ``param_base``.

    Emission is TIME-CHUNKED: the grid is (path_blocks, time_chunks) with the
    time axis iterated sequentially (the TPU grid's minor dimension), state
    columns carried across chunks in a VMEM scratch, and the hardware PRNG
    seeded once per path block (its register state persists across grid
    steps).  The spare Box–Muller half-pair is also carried in scratch, and
    whether one is pending at a chunk boundary is static (draw count is a
    pure function of the timeline), so the draw stream per (seed, phase,
    global block) is EXACTLY invariant to the chunking — pinned bitwise by
    tests/test_pallas_kernel_tpu.py."""
    import numpy as _np

    chol = _np.asarray(chol, dtype=_np.float64)
    sim_dim = sum(b.n_sim for b in blocks)
    state_dim = sum(b.n_state for b in blocks)
    assert chol.shape == (sim_dim, sim_dim)

    block_paths = rows_per_block * _LANES
    padded = padded_paths(num_paths, rows_per_block)
    n_blocks = padded // block_paths
    total_rows = padded // _LANES

    points = [float(t) for t in timeline]
    t_prev = float(calibration_date)
    substeps: List[List[Tuple[float, float]]] = []  # per point: [(t1, dt)]
    for t in points:
        interval = t - t_prev
        subs = []
        if interval > 0.0:
            dt = interval / num_steps
            for k in range(num_steps):
                subs.append((t_prev + k * dt, dt))
        substeps.append(subs)
        t_prev = t
    num_points = len(points)

    tc = time_chunk_points or _time_chunk_points(state_dim, rows_per_block)
    tc = max(1, min(tc, num_points))
    n_tchunks = -(-num_points // tc)
    # draws consumed before each point — static, so whether a spare
    # Box–Muller half-pair is pending at a chunk boundary is compile-time
    draws_before = [0]
    for p in range(num_points):
        draws_before.append(draws_before[-1] + len(substeps[p]) * sim_dim)

    def _spare_pending(chunk: int) -> bool:
        return (draws_before[chunk * tc] % 2) == 1

    def _init_cols(p_ref, shape):
        cols: List = []
        for b in blocks:
            base = b.param_base
            if b.kind == "bs":
                spot = p_ref[base]
                if b.scheme == "exact":
                    cols.append([jnp.zeros(shape, jnp.float32) + jnp.log(spot)])
                else:
                    cols.append([jnp.zeros(shape, jnp.float32) + spot])
            elif b.kind == "bs_multi":
                if b.scheme == "exact":
                    cols.append([
                        jnp.zeros(shape, jnp.float32) + jnp.log(p_ref[base + d])
                        for d in range(b.n_state)
                    ])
                else:
                    cols.append([
                        jnp.zeros(shape, jnp.float32) + p_ref[base + d]
                        for d in range(b.n_state)
                    ])
            elif b.kind == "vasicek":
                r0 = p_ref[base]
                cols.append([
                    jnp.zeros(shape, jnp.float32) + r0,
                    jnp.zeros(shape, jnp.float32),
                ])
            elif b.kind == "cirpp":
                y0 = p_ref[base + 3]
                cols.append([
                    jnp.zeros(shape, jnp.float32) + y0,
                    jnp.zeros(shape, jnp.float32),
                ])
            elif b.kind == "cirpp_det":
                lam0 = b.lambda_market(calibration_date)
                cols.append([
                    jnp.full(shape, lam0, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                ])
            elif b.kind == "hw":
                r0 = b.hw_fwd0(calibration_date)
                cols.append([
                    jnp.full(shape, r0, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                ])
            elif b.kind == "s2f":
                log_f0 = b.s2f_logf0(calibration_date)
                cols.append([
                    jnp.full(shape, log_f0, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32),
                ])
            else:  # pragma: no cover
                raise ValueError(f"unknown kernel block kind {b.kind}")
        return cols

    def _run_point(p_ref, cols, draw, subs, shape):
        for t1, dt in subs:
                zs = [draw() for _ in range(sim_dim)]
                # static joint Cholesky combine (lower triangular)
                ws = [
                    sum(float(chol[d, e]) * zs[e] for e in range(d + 1)
                        if chol[d, e] != 0.0)
                    for d in range(sim_dim)
                ]
                sqrt_dt = math.sqrt(dt)
                noff = 0
                for bi, b in enumerate(blocks):
                    base = b.param_base
                    w = ws[noff]
                    if b.kind == "bs":
                        spot, sigma, rate = (
                            p_ref[base], p_ref[base + 1], p_ref[base + 2]
                        )
                        (s,) = cols[bi]
                        if b.scheme == "exact":
                            s = s + (rate - 0.5 * sigma * sigma) * dt \
                                + sigma * sqrt_dt * w
                        else:
                            s = s * (1.0 + rate * dt) + sigma * s * sqrt_dt * w
                        cols[bi] = [s]
                    elif b.kind == "bs_multi":
                        # params [spots..., vols..., rate]; each asset's
                        # (already jointly correlated) driver is ws[noff+d]
                        n = b.n_state
                        rate = p_ref[base + 2 * n]
                        new_cols = []
                        for d in range(n):
                            sigma = p_ref[base + n + d]
                            s = cols[bi][d]
                            w_d = ws[noff + d]
                            if b.scheme == "exact":
                                s = s + (rate - 0.5 * sigma * sigma) * dt \
                                    + sigma * sqrt_dt * w_d
                            else:
                                s = s * (1.0 + rate * dt) \
                                    + sigma * s * sqrt_dt * w_d
                            new_cols.append(s)
                        cols[bi] = new_cols
                    elif b.kind == "vasicek":
                        _, sigma, theta, a = (
                            p_ref[base], p_ref[base + 1],
                            p_ref[base + 2], p_ref[base + 3],
                        )
                        r, log_b = cols[bi]
                        log_b = log_b + r * dt
                        if b.scheme == "exact":
                            decay = jnp.exp(-a * dt)
                            scale = jnp.sqrt(
                                (sigma * sigma / (2.0 * a))
                                * (1.0 - decay * decay)
                            )
                            r = theta + (r - theta) * decay + scale * w
                        else:
                            r = r + a * (theta - r) * dt + sigma * sqrt_dt * w
                        cols[bi] = [r, log_b]
                    elif b.kind == "cirpp":
                        kappa, theta, sigma = (
                            p_ref[base], p_ref[base + 1], p_ref[base + 2]
                        )
                        y, log_b = cols[bi]
                        psi = _cirpp_psi(p_ref, base, t1, b.lambda_market(t1))
                        log_b = log_b + (y + psi) * dt
                        sqrt_y = jnp.sqrt(jnp.maximum(y, 0.0))
                        y = jnp.maximum(
                            y + kappa * (theta - y) * dt
                            + sigma * sqrt_y * sqrt_dt * w,
                            1e-12,
                        )
                        cols[bi] = [y, log_b]
                    elif b.kind == "cirpp_det":
                        lam_now = b.lambda_market(t1)
                        lam_next = b.lambda_market(t1 + dt)
                        y, log_b = cols[bi]
                        log_b = log_b + lam_now * dt
                        y = jnp.full(shape, lam_next, jnp.float32)
                        cols[bi] = [y, log_b]
                    elif b.kind == "hw":
                        # Curve-fitted Gaussian short rate on the x-factor
                        # (hull_white.py:108-130): alpha(t) = f_mkt(0,t) +
                        # (sigma^2/2a^2)(1-e^{-a(t-t0)})^2 with f_mkt static.
                        sigma, a = p_ref[base], p_ref[base + 1]
                        r, log_b = cols[bi]
                        log_b = log_b + r * dt
                        s2a = sigma * sigma / (2.0 * a * a)
                        d1 = t1 - calibration_date
                        d2 = d1 + dt
                        alpha1 = b.hw_fwd0(t1) + s2a * (1.0 - jnp.exp(-a * d1)) ** 2
                        alpha2 = b.hw_fwd0(t1 + dt) \
                            + s2a * (1.0 - jnp.exp(-a * d2)) ** 2
                        x = r - alpha1
                        if b.scheme == "exact":
                            decay = jnp.exp(-a * dt)
                            scale = jnp.sqrt(
                                (sigma * sigma / (2.0 * a))
                                * (1.0 - decay * decay)
                            )
                            x = x * decay + scale * w
                        else:
                            x = x - a * x * dt + sigma * sqrt_dt * w
                        cols[bi] = [x + alpha2, log_b]
                    elif b.kind == "s2f":
                        # Schwartz 2F around the baseline curve
                        # (schwartz_two_factor.py:115-136).  The intra-factor
                        # correlation rho is a TRACED param, so it cannot sit
                        # in the static joint Cholesky: this block draws two
                        # RAW drivers and correlates them in SMEM-scalar math
                        # (standalone models only — ModelConfig excludes s2f).
                        kappa, sig_s, mu_l, sig_l, rho = (
                            p_ref[base + 1], p_ref[base + 2],
                            p_ref[base + 3], p_ref[base + 4], p_ref[base + 5],
                        )
                        w2 = ws[noff + 1]
                        log_s, x, y = cols[bi]
                        rho_c = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
                        if b.scheme == "exact":
                            # kappa -> 0 limit guard (schwartz_two_factor.py
                            # covariance_matrix / step_analytical)
                            near0 = jnp.abs(kappa) < 1e-12
                            k_safe = jnp.where(near0, 1.0, kappa)
                            decay = jnp.where(near0, 1.0, jnp.exp(-kappa * dt))
                            var_s = jnp.where(
                                near0,
                                sig_s * sig_s * dt,
                                (sig_s * sig_s / (2.0 * k_safe))
                                * (1.0 - decay * decay),
                            )
                            std_x = jnp.sqrt(var_s)
                            std_y = sig_l * jnp.sqrt(dt)
                            x = x * decay + std_x * w
                            y = y + mu_l * dt + std_y * (rho * w + rho_c * w2)
                        else:
                            x = x - kappa * x * dt + sig_s * sqrt_dt * w
                            y = y + mu_l * dt \
                                + sig_l * sqrt_dt * (rho * w + rho_c * w2)
                        log_s = b.s2f_logf0(t1 + dt) + x + y
                        cols[bi] = [log_s, x, y]
                    noff += b.n_sim
        return cols

    def kernel(seed_ref, p_ref, out_ref, carry_ref):
        blk = pl.program_id(0)
        tch = pl.program_id(1)
        shape = (rows_per_block, _LANES)

        def load_cols():
            cols, idx = [], 0
            for b in blocks:
                cols.append([carry_ref[idx + d] for d in range(b.n_state)])
                idx += b.n_state
            return cols

        for chunk in range(n_tchunks):
            lo = chunk * tc
            hi = min(num_points, (chunk + 1) * tc)

            @pl.when(tch == chunk)
            def _(chunk=chunk, lo=lo, hi=hi):
                if chunk == 0:
                    # one seed per path block; the PRNG register state then
                    # persists across this block's time chunks
                    pltpu.prng_seed(seed_ref[0], seed_ref[1] + blk)
                    cols = _init_cols(p_ref, shape)
                    pending = [None]
                else:
                    cols = load_cols()
                    pending = (
                        [carry_ref[state_dim]] if _spare_pending(chunk)
                        else [None]
                    )

                def draw():
                    if pending[0] is None:
                        z_a, z_b = _normal_pair(shape)
                        pending[0] = z_b
                        return z_a
                    z = pending[0]
                    pending[0] = None
                    return z

                for point in range(lo, hi):
                    cols = _run_point(p_ref, cols, draw, substeps[point], shape)
                    # emit this point's state columns into the chunk block
                    col_idx = 0
                    for bi, b in enumerate(blocks):
                        for c in cols[bi]:
                            if b.kind in ("bs", "bs_multi") and b.scheme == "exact":
                                out_ref[point - lo, col_idx] = jnp.exp(c)
                            else:
                                out_ref[point - lo, col_idx] = c
                            col_idx += 1

                if chunk + 1 < n_tchunks:
                    idx = 0
                    for bi, b in enumerate(blocks):
                        for c in cols[bi]:
                            carry_ref[idx] = c
                            idx += 1
                    if _spare_pending(chunk + 1):
                        carry_ref[state_dim] = pending[0]

    out_shape = jax.ShapeDtypeStruct(
        (n_tchunks * tc, state_dim, total_rows, _LANES), jnp.float32
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tc, state_dim, rows_per_block, _LANES),
            lambda i, t: (t, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((state_dim + 1, rows_per_block, _LANES), jnp.float32),
        ],
        compiler_params=_compiler_params(),
    )(_seed_words(seed, phase, block_offset), params_vec)

    # [T_padded, D, rows, lanes] -> [T, N, D]
    return jnp.moveaxis(
        out.reshape(n_tchunks * tc, state_dim, padded)[
            :num_points, :, :num_paths
        ],
        1,
        -1,
    )
