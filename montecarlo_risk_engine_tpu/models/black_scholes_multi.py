"""Multi-asset Black–Scholes model with user correlation.

Counterpart of reference ``src/models/black_scholes_multi.py``
(black_scholes_multi.py:27-128).  State = [S_1..S_n]; shared constant rate.
Params (reference order): spots..., volatilities..., rate.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.config import SimulationScheme, asarray, real_dtype
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class BlackScholesMulti(Model):
    def __init__(
        self,
        calibration_date: float,
        rate: float,
        asset_ids: Sequence[str],
        spots: Sequence[float],
        volatilities: Sequence[float],
        correlation_matrix,
    ):
        super().__init__(
            calibration_date=calibration_date,
            simulation_dim=len(asset_ids),
            state_dim=len(spots),
            asset_ids=asset_ids,
        )
        self._spots0 = [float(s) for s in spots]
        self._vols0 = [float(v) for v in volatilities]
        self._rate0 = float(rate)
        # User correlation is configuration, not a differentiable parameter
        # (the reference keeps it outside model_params, black_scholes_multi.py:32).
        self._corr = np.asarray(correlation_matrix, dtype=np.float64)

    def initial_params(self):
        vals = self._spots0 + self._vols0 + [self._rate0]
        return tuple(asarray(v) for v in vals)

    def get_model_param_names(self) -> List[str]:
        spot_names = [f"spot[{a}]" for a in self.asset_ids]
        vol_names = [f"volatility[{a}]" for a in self.asset_ids]
        return [*spot_names, *vol_names, "rate"]

    def _spots(self, params):
        return jnp.stack(params[: self.num_assets])

    def _vols(self, params):
        return jnp.stack(params[self.num_assets : 2 * self.num_assets])

    def _rate(self, params):
        return params[2 * self.num_assets]

    def init_state(self, params, num_paths):
        return jnp.broadcast_to(self._spots(params), (num_paths, self.num_assets))

    def supports_pallas_paths(self, scheme):
        return scheme == SimulationScheme.ANALYTICAL

    def supports_pallas_ad(self, scheme):
        return scheme in (SimulationScheme.ANALYTICAL, SimulationScheme.EULER)

    def invert_noise(self, params, scheme, t1, t2, state, next_state):
        # Per-asset inverse: the marginal of each asset is driven by its own
        # (already correlated) Brownian, so inversion is columnwise.
        rate = self._rate(params)
        sigma = self._vols(params)[None, :]
        dt = t2 - t1
        if scheme == SimulationScheme.ANALYTICAL:
            return jnp.log(next_state / state) - (rate - 0.5 * sigma * sigma) * dt
        return (next_state / state - 1.0 - rate * dt) / (sigma * jnp.sqrt(dt))

    # single-"bs_multi"-block hybrid kernel: time-chunked, any timeline
    pallas_time_chunked = True

    def pallas_paths(self, params, scheme, timeline, num_paths, num_steps,
                     seed, phase=0, block_offset=0, rows_per_block=None):
        """Exact correlated-GBM trajectory as one "bs_multi" block of the
        time-chunked hybrid kernel (ops/pallas_hybrid.py) — the intra-asset
        correlation IS the block's static joint Cholesky."""
        import numpy as np

        from montecarlo_risk_engine_tpu.ops.pallas_hybrid import (
            KernelBlock,
            hybrid_paths,
        )

        n = self.num_assets
        block = KernelBlock(
            "bs_multi",
            "exact" if scheme == SimulationScheme.ANALYTICAL else "euler",
            0, n, n,
        )
        chol = np.linalg.cholesky(np.asarray(self._corr, dtype=np.float64))
        params_vec = jnp.stack(
            [jnp.asarray(p, dtype=jnp.float32) for p in params]
        )
        return hybrid_paths(
            [block], chol, timeline, num_paths, num_steps,
            seed=seed, phase=phase, block_offset=block_offset,
            calibration_date=self.calibration_date,
            rows_per_block=rows_per_block or 256, params_vec=params_vec,
        )

    def correlation_matrix(self, params, scheme):
        return asarray(self._corr)

    def analytic_factor_loadings(self, params):
        return [(0.0, v) for v in self._vols(params)]

    def covariance_matrix(self, params, delta_t):
        # sigma_i sigma_j rho_ij dt (black_scholes_multi.py:56-61)
        vols = self._vols(params)
        return jnp.outer(vols, vols) * asarray(self._corr) * delta_t

    def step_analytical(self, params, t1, t2, state, corr_noise):
        dt = t2 - t1
        rate = self._rate(params)
        sigma = self._vols(params)[None, :]
        drift = (rate - 0.5 * sigma * sigma) * dt
        return state * jnp.exp(drift + corr_noise)

    def step_euler(self, params, t1, t2, state, corr_noise):
        dt = t2 - t1
        rate = self._rate(params)
        sigma = self._vols(params)[None, :]
        return state + rate * state * dt + sigma * state * jnp.sqrt(dt) * corr_noise

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        rate = self._rate(params)
        if kind == AtomicRequestType.SPOT:
            return self._state_col(state, self.asset_ids.index(asset_id))
        if kind == AtomicRequestType.DISCOUNT_FACTOR:
            return jnp.exp(-rate * (t1 - self.calibration_date))
        if kind == AtomicRequestType.FORWARD_RATE:
            return jnp.exp(rate * (t2 - t1))
        if kind == AtomicRequestType.LIBOR_RATE:
            return (jnp.exp(rate * (t2 - t1)) - 1.0) / (t2 - t1)
        if kind == AtomicRequestType.NUMERAIRE:
            return jnp.exp(rate * (t1 - self.calibration_date))
        raise NotImplementedError(f"Request type {kind} not supported by BlackScholesMulti.")
