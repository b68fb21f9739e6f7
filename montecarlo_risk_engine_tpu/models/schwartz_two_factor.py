"""Schwartz two-factor commodity spot model around a baseline forward curve.

Counterpart of reference ``src/models/schwartz_two_factor.py``
(schwartz_two_factor.py:9-216).

log S(t) = log F0(t) + x(t) + y(t); x is a short-term OU factor, y a long-term
Brownian factor with drift.  State = [logS, x, y]; simulation_dim = 2.
Params (reference order): rate, short_term_mean_reversion, short_term_vol,
long_term_drift, long_term_vol, rho.

The reference interpolates the forward curve host-side with ``bisect``
(schwartz_two_factor.py:95-112); here the curve lives on device and is
interpolated with ``jnp.interp`` (flat extrapolation both sides, matching the
reference's clamping) so step times may be traced inside the scan.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import SimulationScheme, asarray, real_dtype
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class SchwartzTwoFactorModel(Model):
    def __init__(
        self,
        calibration_date: float,
        curve_times: Sequence[float],
        curve_values: Sequence[float],
        rate: float,
        short_term_mean_reversion: float,
        short_term_vol: float,
        long_term_drift: float,
        long_term_vol: float,
        rho: float,
        asset_id: str | None = None,
    ):
        super().__init__(
            calibration_date=calibration_date,
            asset_ids=[asset_id] if asset_id else None,
            simulation_dim=2,
            state_dim=3,
        )
        if len(curve_times) != len(curve_values):
            raise ValueError("curve_times and curve_values must have identical lengths.")
        if len(curve_times) < 2:
            raise ValueError("At least two curve points are required.")
        if any(v <= 0.0 for v in curve_values):
            raise ValueError("Curve values must be strictly positive.")
        self.curve_times = asarray([float(t) for t in curve_times])
        self.curve_values = asarray([float(v) for v in curve_values])
        self._init = (
            float(rate),
            float(short_term_mean_reversion),
            float(short_term_vol),
            float(long_term_drift),
            float(long_term_vol),
            float(rho),
        )

    def initial_params(self):
        return tuple(asarray(v) for v in self._init)

    def get_model_param_names(self):
        return [
            "rate",
            "short_term_mean_reversion",
            "short_term_vol",
            "long_term_drift",
            "long_term_vol",
            "rho",
        ]

    @staticmethod
    def _unpack(params):
        rate, kappa, sig_s, mu_l, sig_l, rho = params
        return rate, kappa, sig_s, mu_l, sig_l, rho

    def _curve_value(self, t):
        # Linear interior interpolation, flat extrapolation
        # (schwartz_two_factor.py:95-112).
        return jnp.interp(jnp.asarray(t), self.curve_times, self.curve_values)

    def init_state(self, params, num_paths):
        log_spot = jnp.broadcast_to(jnp.log(self._curve_value(self.calibration_date)), (num_paths,))
        zeros = jnp.zeros((num_paths,), dtype=real_dtype())
        return jnp.stack([log_spot.astype(real_dtype()), zeros, zeros], axis=-1)

    def correlation_matrix(self, params, scheme):
        rho = params[5]
        one = jnp.ones((), dtype=real_dtype())
        return jnp.stack([jnp.stack([one, rho]), jnp.stack([rho, one])])

    def analytic_factor_loadings(self, params):
        _, kappa, sig_s, _, sig_l, _ = self._unpack(params)
        return [(kappa, sig_s), (0.0, sig_l)]

    def covariance_matrix(self, params, delta_t):
        # Exact one-step covariance of (x, y), with the kappa -> 0 limit
        # (schwartz_two_factor.py:124-145).
        _, kappa, sig_s, _, sig_l, rho = self._unpack(params)
        near_zero = jnp.abs(kappa) < 1e-12
        kappa_safe = jnp.where(near_zero, 1.0, kappa)
        var_short_ou = sig_s * sig_s * (1.0 - jnp.exp(-2.0 * kappa_safe * delta_t)) / (2.0 * kappa_safe)
        var_short = jnp.where(near_zero, sig_s * sig_s * delta_t, var_short_ou)
        var_long = sig_l * sig_l * delta_t
        cov = rho * jnp.sqrt(jnp.maximum(var_short * var_long, 0.0))
        return jnp.stack([jnp.stack([var_short, cov]), jnp.stack([cov, var_long])])

    def step_analytical(self, params, t1, t2, state, corr_noise):
        _, kappa, _, mu_l, _, _ = self._unpack(params)
        dt = t2 - t1
        x = state[:, 1]
        y = state[:, 2]
        near_zero = jnp.abs(kappa) < 1e-12
        decay = jnp.where(near_zero, 1.0, jnp.exp(-kappa * dt))
        x_next = x * decay + corr_noise[:, 0]
        y_next = y + mu_l * dt + corr_noise[:, 1]
        log_spot = jnp.log(self._curve_value(t2)) + x_next + y_next
        return jnp.stack([log_spot, x_next, y_next], axis=-1)

    def step_euler(self, params, t1, t2, state, corr_noise):
        _, kappa, sig_s, mu_l, sig_l, _ = self._unpack(params)
        dt = t2 - t1
        sqrt_dt = jnp.sqrt(dt)
        x = state[:, 1]
        y = state[:, 2]
        x_next = x - kappa * x * dt + sig_s * sqrt_dt * corr_noise[:, 0]
        y_next = y + mu_l * dt + sig_l * sqrt_dt * corr_noise[:, 1]
        log_spot = jnp.log(self._curve_value(t2)) + x_next + y_next
        return jnp.stack([log_spot, x_next, y_next], axis=-1)

    step_milstein = step_euler  # constant diffusion coefficients

    def invert_noise(self, params, scheme, t1, t2, state, next_state):
        # Blockwise transition inversion for the differentiable kernel path:
        # (x, y) are affine in the corr_noise columns, logS is derived.
        _, kappa, sig_s, mu_l, sig_l, _ = self._unpack(params)
        dt = t2 - t1
        x, y = state[:, 1:2], state[:, 2:3]
        x_n, y_n = next_state[:, 1:2], next_state[:, 2:3]
        if scheme == SimulationScheme.ANALYTICAL:
            near_zero = jnp.abs(kappa) < 1e-12
            decay = jnp.where(near_zero, 1.0, jnp.exp(-kappa * dt))
            nx = x_n - x * decay
            ny = y_n - y - mu_l * dt
        else:
            sqrt_dt = jnp.sqrt(dt)
            nx = (x_n - x + kappa * x * dt) / (sig_s * sqrt_dt)
            ny = (y_n - y - mu_l * dt) / (sig_l * sqrt_dt)
        return jnp.concatenate([nx, ny], axis=-1)

    # -- fused Pallas path generation ----------------------------------------

    def supports_pallas_paths(self, scheme):
        return scheme in (SimulationScheme.ANALYTICAL, SimulationScheme.EULER,
                          SimulationScheme.MILSTEIN)

    def supports_pallas_ad(self, scheme):
        return self.supports_pallas_paths(scheme)

    # the hybrid kernel streams emissions in time chunks: any timeline length
    pallas_time_chunked = True

    def pallas_paths(self, params, scheme, timeline, num_paths, num_steps,
                     seed, phase=0, block_offset=0, rows_per_block=None):
        """Fused two-factor trajectory as a single "s2f" block of the hybrid
        kernel (ops/pallas_hybrid.py); state [T, N, 3] = [logS, x, y].

        rho is a traced parameter, so the block correlates its two raw
        drivers in SMEM-scalar math instead of the static joint Cholesky —
        standalone models only (ModelConfig excludes s2f blocks)."""
        import numpy as np

        from montecarlo_risk_engine_tpu.ops.pallas_hybrid import (
            KernelBlock,
            hybrid_paths,
        )
        rows = rows_per_block or 256
        block = KernelBlock(
            "s2f",
            "exact" if scheme == SimulationScheme.ANALYTICAL else "euler",
            0, 3, 2,
            curve_times=tuple(np.asarray(self.curve_times).tolist()),
            curve_vals=tuple(np.asarray(self.curve_values).tolist()),
        )
        params_vec = jnp.stack([jnp.asarray(p, dtype=jnp.float32) for p in params])
        return hybrid_paths(
            [block], np.eye(2), timeline, num_paths, num_steps,
            seed=seed, phase=phase, block_offset=block_offset,
            calibration_date=self.calibration_date, rows_per_block=rows,
            params_vec=params_vec,
        )

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        # schwartz_two_factor.py:198-216 — constant-rate discounting.
        rate = params[0]
        if kind == AtomicRequestType.SPOT:
            return jnp.exp(self._state_col(state, 0))
        if kind == AtomicRequestType.DISCOUNT_FACTOR:
            return jnp.exp(-rate * (t1 - self.calibration_date))
        if kind == AtomicRequestType.FORWARD_RATE:
            return jnp.exp(rate * (t2 - t1))
        if kind == AtomicRequestType.LIBOR_RATE:
            return (jnp.exp(rate * (t2 - t1)) - 1.0) / (t2 - t1)
        if kind == AtomicRequestType.NUMERAIRE:
            return jnp.exp(rate * (t1 - self.calibration_date))
        raise NotImplementedError(f"Request type {kind} not supported by SchwartzTwoFactorModel.")
