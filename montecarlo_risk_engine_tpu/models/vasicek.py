"""Vasicek one-factor short-rate model (exact OU discretisation).

Counterpart of reference ``src/models/vasicek.py`` (vasicek.py:24-156).
State = [r, log_B] with log_B the left-Riemann numeraire accumulator
(∫ r dt, vasicek.py:79-80 — quirk Q3, preserved deliberately so exposure
semantics match the reference).
Params (reference order): rate, volatility, mean, mean_reversion_speed.
"""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import asarray, real_dtype
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class VasicekModel(Model):
    def __init__(
        self,
        calibration_date: float,
        rate: float,
        mean: float,
        mean_reversion_speed: float,
        volatility: float,
        asset_id: str | None = None,
    ):
        super().__init__(
            calibration_date=calibration_date,
            state_dim=2,
            asset_ids=[asset_id],
        )
        self._rate0 = float(rate)
        self._vol0 = float(volatility)
        self._mean0 = float(mean)
        self._speed0 = float(mean_reversion_speed)

    def initial_params(self):
        return tuple(asarray(v) for v in (self._rate0, self._vol0, self._mean0, self._speed0))

    def get_model_param_names(self):
        return ["rate", "volatility", "mean", "mean_reversion_speed"]

    @staticmethod
    def _unpack(params):
        rate, vol, mean, speed = params
        return rate, vol, mean, speed

    def init_state(self, params, num_paths):
        rate, *_ = self._unpack(params)
        r0 = jnp.broadcast_to(rate, (num_paths,))
        return jnp.stack([r0, jnp.zeros_like(r0)], axis=-1)

    def supports_pallas_paths(self, scheme):
        from montecarlo_risk_engine_tpu.config import SimulationScheme

        return scheme == SimulationScheme.ANALYTICAL

    def supports_pallas_ad(self, scheme):
        from montecarlo_risk_engine_tpu.config import SimulationScheme

        return scheme in (SimulationScheme.ANALYTICAL, SimulationScheme.EULER)

    def invert_noise(self, params, scheme, t1, t2, state, next_state):
        # Exact-OU / Euler residual of the r column; log_B is a deterministic
        # accumulator (left Riemann on the START state), so it carries no
        # noise and needs no inversion.
        from montecarlo_risk_engine_tpu.config import SimulationScheme

        _, sigma, theta, a = self._unpack(params)
        dt = t2 - t1
        r = state[:, 0:1]
        r_next = next_state[:, 0:1]
        if scheme == SimulationScheme.ANALYTICAL:
            return r_next - theta - (r - theta) * jnp.exp(-a * dt)
        return (r_next - r - a * (theta - r) * dt) / (sigma * jnp.sqrt(dt))

    # single-"vasicek"-block hybrid kernel: time-chunked, any timeline
    pallas_time_chunked = True

    def pallas_paths(self, params, scheme, timeline, num_paths, num_steps,
                     seed, phase=0, block_offset=0, rows_per_block=None):
        """Fused exact-OU trajectory as one "vasicek" block of the
        time-chunked hybrid kernel (ops/pallas_hybrid.py); state
        [T, N, 2] = [r, log_B] (left-Riemann log_B, quirk Q3)."""
        import numpy as np

        from montecarlo_risk_engine_tpu.ops.pallas_hybrid import (
            KernelBlock,
            hybrid_paths,
        )

        from montecarlo_risk_engine_tpu.config import SimulationScheme

        block = KernelBlock(
            "vasicek",
            "exact" if scheme == SimulationScheme.ANALYTICAL else "euler",
            0, 2, 1,
        )
        params_vec = jnp.stack(
            [jnp.asarray(p, dtype=jnp.float32) for p in params]
        )
        return hybrid_paths(
            [block], np.eye(1), timeline, num_paths, num_steps,
            seed=seed, phase=phase, block_offset=block_offset,
            calibration_date=self.calibration_date,
            rows_per_block=rows_per_block or 256, params_vec=params_vec,
        )

    def analytic_factor_loadings(self, params):
        _, sigma, _, a = self._unpack(params)
        return [(a, sigma)]

    def covariance_matrix(self, params, delta_t):
        # Exact conditional variance of the OU increment (vasicek.py:52-60).
        _, sigma, _, a = self._unpack(params)
        decay = jnp.exp(-a * delta_t)
        variance = (sigma * sigma / (2.0 * a)) * (1.0 - decay * decay)
        return variance.reshape(1, 1)

    def step_analytical(self, params, t1, t2, state, corr_noise):
        # r_{t+dt} = theta + (r_t - theta) e^{-a dt} + eta (exact),
        # log_B += r_t dt (left Riemann) — vasicek.py:62-86.
        _, _, theta, a = self._unpack(params)
        dt = t2 - t1
        r = state[:, 0:1]
        log_b = state[:, 1:2] + r * dt
        r_next = theta + (r - theta) * jnp.exp(-a * dt) + corr_noise
        return jnp.concatenate([r_next, log_b], axis=-1)

    def step_euler(self, params, t1, t2, state, corr_noise):
        _, sigma, theta, a = self._unpack(params)
        dt = t2 - t1
        r = state[:, 0:1]
        log_b = state[:, 1:2] + r * dt
        r_next = r + a * (theta - r) * dt + sigma * jnp.sqrt(dt) * corr_noise
        return jnp.concatenate([r_next, log_b], axis=-1)

    # Milstein == Euler for constant diffusion.
    step_milstein = step_euler

    def bond_price(self, params, t1, t2, rate_state):
        """Closed-form zero bond P(t1,t2 | r=rate_state) (vasicek.py:114-128)."""
        _, sigma, theta, a = self._unpack(params)
        dt = asarray(t2) - asarray(t1)
        B = (1.0 - jnp.exp(-a * dt)) / a
        alpha = (theta - sigma * sigma / (2.0 * a * a)) * (B - dt) - (sigma * sigma / (4.0 * a)) * B * B
        return jnp.exp(alpha) * jnp.exp(-B * rate_state)

    # Back-compat alias mirroring the reference method name.
    def compute_bond_price(self, params, t1, t2, rate_state):
        return self.bond_price(params, t1, t2, rate_state)

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        # vasicek.py:130-156
        if kind == AtomicRequestType.SPOT:
            return self._state_col(state, 0)
        if kind == AtomicRequestType.DISCOUNT_FACTOR:
            return self.bond_price(params, self.calibration_date, t1, self._state_col(state, 0))
        if kind == AtomicRequestType.FORWARD_RATE:
            # Reference returns the conditional bond price P(t1,t2) here
            # (vasicek.py:141-144) — the Bond product consumes it as a
            # discount factor.
            return self.bond_price(params, t1, t2, self._state_col(state, 0))
        if kind == AtomicRequestType.LIBOR_RATE:
            p = self.bond_price(params, t1, t2, self._state_col(state, 0))
            return (1.0 / p - 1.0) / (t2 - t1)
        if kind == AtomicRequestType.NUMERAIRE:
            return jnp.exp(self._state_col(state, 1))
        raise NotImplementedError(f"Request type {kind} not supported by VasicekModel.")
