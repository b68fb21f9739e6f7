"""Single-asset Black–Scholes (GBM) model.

Counterpart of reference ``src/models/black_scholes.py`` (params/steps/
request resolution at black_scholes.py:22-111).  State = [S].
Params (reference order): spot, volatility, rate.
"""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import SimulationScheme, asarray, real_dtype
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class BlackScholesModel(Model):
    def __init__(
        self,
        calibration_date: float,
        spot: float,
        rate: float,
        sigma: float,
        asset_id: str | None = None,
    ):
        super().__init__(
            calibration_date=calibration_date,
            asset_ids=[asset_id] if asset_id else None,
        )
        self._spot0 = float(spot)
        self._sigma0 = float(sigma)
        self._rate0 = float(rate)

    # params = (spot, sigma, rate) — reference black_scholes.py:22-26
    def initial_params(self):
        return (asarray(self._spot0), asarray(self._sigma0), asarray(self._rate0))

    def get_model_param_names(self):
        return ["spot", "volatility", "rate"]

    @staticmethod
    def _unpack(params):
        spot, sigma, rate = params
        return spot, sigma, rate

    def init_state(self, params, num_paths):
        spot, _, _ = self._unpack(params)
        return jnp.broadcast_to(spot, (num_paths, 1)).astype(real_dtype())

    def supports_pallas_paths(self, scheme):
        return scheme == SimulationScheme.ANALYTICAL

    def supports_pallas_ad(self, scheme):
        return scheme in (SimulationScheme.ANALYTICAL, SimulationScheme.EULER)

    def invert_noise(self, params, scheme, t1, t2, state, next_state):
        _, sigma, rate = self._unpack(params)
        dt = t2 - t1
        if scheme == SimulationScheme.ANALYTICAL:
            # eta = log(S'/S) - (r - sigma^2/2) dt  (exact GBM inverse)
            return jnp.log(next_state / state) - (rate - 0.5 * sigma * sigma) * dt
        # Euler: S' = S (1 + r dt + sigma sqrt(dt) z)
        return (next_state / state - 1.0 - rate * dt) / (sigma * jnp.sqrt(dt))

    # single-"bs"-block hybrid kernel: time-chunked emission, any timeline
    pallas_time_chunked = True

    def pallas_paths(self, params, scheme, timeline, num_paths, num_steps,
                     seed, phase=0, block_offset=0, rows_per_block=None):
        """Single-asset exact GBM as one "bs" block of the time-chunked
        hybrid kernel (ops/pallas_hybrid.py)."""
        import numpy as np

        from montecarlo_risk_engine_tpu.ops.pallas_hybrid import (
            KernelBlock,
            hybrid_paths,
        )

        block = KernelBlock(
            "bs",
            "exact" if scheme == SimulationScheme.ANALYTICAL else "euler",
            0, 1, 1,
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
        _, sigma, _ = self._unpack(params)
        return [(0.0, sigma)]

    def covariance_matrix(self, params, delta_t):
        _, sigma, _ = self._unpack(params)
        return (sigma * sigma * delta_t).reshape(1, 1)

    def step_analytical(self, params, t1, t2, state, corr_noise):
        # S <- S exp(r dt - 0.5 sigma^2 dt + eta), eta ~ N(0, sigma^2 dt)
        # (reference black_scholes.py:50-67; noise already carries sqrt(dt) sigma)
        _, sigma, rate = self._unpack(params)
        dt = t2 - t1
        return state * jnp.exp(rate * dt - 0.5 * sigma * sigma * dt + corr_noise)

    def step_euler(self, params, t1, t2, state, corr_noise):
        _, sigma, rate = self._unpack(params)
        dt = t2 - t1
        return state + rate * state * dt + sigma * state * jnp.sqrt(dt) * corr_noise

    def step_milstein(self, params, t1, t2, state, corr_noise):
        # Milstein for GBM: Euler + 0.5 sigma^2 S (dW^2 - dt).
        # The reference declares MILSTEIN but never implements it (quirk Q1).
        _, sigma, rate = self._unpack(params)
        dt = t2 - t1
        dw = jnp.sqrt(dt) * corr_noise
        return (
            state
            + rate * state * dt
            + sigma * state * dw
            + 0.5 * sigma * sigma * state * (dw * dw - dt)
        )

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        # Reference black_scholes.py:87-111 — constant short rate closed forms.
        _, _, rate = self._unpack(params)
        if kind == AtomicRequestType.SPOT:
            return self._state_col(state, 0)
        if kind == AtomicRequestType.DISCOUNT_FACTOR:
            return jnp.exp(-rate * (t1 - self.calibration_date))
        if kind == AtomicRequestType.FORWARD_RATE:
            return jnp.exp(rate * (t2 - t1))
        if kind == AtomicRequestType.LIBOR_RATE:
            return (jnp.exp(rate * (t2 - t1)) - 1.0) / (t2 - t1)
        if kind == AtomicRequestType.NUMERAIRE:
            return jnp.exp(rate * (t1 - self.calibration_date))
        raise NotImplementedError(f"Request type {kind} not supported by BlackScholesModel.")
