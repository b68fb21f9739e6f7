"""CIR++ shifted square-root default-intensity model.

Counterpart of reference ``src/models/cirpp.py`` (cirpp.py:20-317).

Intensity lambda(t) = y(t) + psi(t); y follows CIR dynamics
dy = kappa (theta - y) dt + sigma sqrt(y) dW with the Feller condition, and
psi(t) = lambda_market(t) + D(t) - y0 E(t) fits the initial market survival
curve (D = d/dt ln A(0,t), E = d/dt B(0,t), cirpp.py:92-142).

State = [y, log_B] where log_B accumulates the pathwise integral of
lambda(t) (left Riemann, cirpp.py:174-198), so SURVIVAL_PROBABILITY resolves
to exp(-log_B) and CONDITIONAL_SURVIVAL_PROBABILITY to the closed-form
S(t,T | y_t) (cirpp.py:246-317).

Params (reference order): kappa, theta, sigma, y0.  Market hazards are static
configuration arrays; all time-dependent quantities (lambda_market, psi) are
implemented with device-side bucket arithmetic so step times may be traced.

Deviations from the reference, decided deliberately:
  * The reference's "analytical" step (moment-matched lognormal proxy) drops
    the log_B column and returns an inconsistent state (quirk Q7,
    cirpp.py:200-237).  Here the analytical step uses the same lognormal
    moment-matching for y but keeps the accumulator consistent.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import asarray, real_dtype
from montecarlo_risk_engine_tpu.helpers.cs_helper import probability_of_default
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType

_EPS = 1e-12


class CIRPPModel(Model):
    def __init__(
        self,
        calibration_date: float,
        asset_id: str,
        hazard_rates: Dict[float, float],
        kappa: float,
        theta: float,
        volatility: float,
        y0: float,
        deterministic: bool = False,
    ):
        super().__init__(
            calibration_date=calibration_date,
            state_dim=2,
            asset_ids=[asset_id],
        )
        if not (2.0 * kappa * theta - volatility**2 > 0.0 and y0 > 0.0):
            raise AssertionError("Feller condition not met.")
        self._init = (float(kappa), float(theta), float(volatility), float(y0))
        self.tenors = asarray(list(hazard_rates.keys()))
        self.hazard_rates = asarray(list(hazard_rates.values()))
        self.deterministic = bool(deterministic)

    def initial_params(self):
        return tuple(asarray(v) for v in self._init)

    def get_model_param_names(self):
        return ["kappa", "theta", "sigma", "y0"]

    @staticmethod
    def _unpack(params):
        kappa, theta, sigma, y0 = params
        return kappa, theta, sigma, y0

    # -- market curve -------------------------------------------------------

    def _lambda_market(self, t):
        """Piecewise-constant market hazard; flat beyond the last tenor
        (cirpp.py:77-88).  ``t`` may be traced."""
        idx = jnp.searchsorted(self.tenors, jnp.asarray(t), side="left")
        idx = jnp.minimum(idx, self.tenors.shape[0] - 1)
        return self.hazard_rates[idx]

    def _market_survival(self, t):
        return 1.0 - probability_of_default(self.hazard_rates, self.tenors, t)

    # -- CIR closed-form building blocks (cirpp.py:92-142) ------------------

    def _h(self, params):
        kappa, _, sigma, _ = self._unpack(params)
        return jnp.sqrt(kappa * kappa + 2.0 * sigma * sigma)

    def _A(self, params, t, T):
        kappa, theta, sigma, _ = self._unpack(params)
        h = self._h(params)
        dt = jnp.asarray(T) - jnp.asarray(t)
        num = 2.0 * h * jnp.exp(0.5 * (kappa + h) * dt)
        den = 2.0 * h + (kappa + h) * (jnp.exp(h * dt) - 1.0)
        return (num / den) ** (2.0 * kappa * theta / (sigma * sigma))

    def _B(self, params, t, T):
        kappa, _, sigma, _ = self._unpack(params)
        h = self._h(params)
        dt = jnp.asarray(T) - jnp.asarray(t)
        e = jnp.exp(h * dt) - 1.0
        return 2.0 * e / (2.0 * h + (kappa + h) * e)

    def _D(self, params, t):
        # d/dt ln A(0,t)
        kappa, theta, sigma, _ = self._unpack(params)
        h = self._h(params)
        et = jnp.exp(h * jnp.asarray(t))
        inner = 0.5 * (kappa + h) - (h * (kappa + h) * et) / (2.0 * h + (kappa + h) * (et - 1.0))
        return (2.0 * kappa * theta / (sigma * sigma)) * inner

    def _E(self, params, t):
        # d/dt B(0,t)
        kappa, _, sigma, _ = self._unpack(params)
        h = self._h(params)
        et = jnp.exp(h * jnp.asarray(t))
        return 4.0 * h * h * et / (2.0 * h + (kappa + h) * (et - 1.0)) ** 2

    def psi(self, params, t):
        _, _, _, y0 = self._unpack(params)
        return self._lambda_market(t) + self._D(params, t) - y0 * self._E(params, t)

    def lambda_t(self, params, t, y_t):
        if self.deterministic:
            return y_t
        return y_t + self.psi(params, t)

    # -- simulation ----------------------------------------------------------

    def init_state(self, params, num_paths):
        _, _, _, y0 = self._unpack(params)
        if self.deterministic:
            y = jnp.broadcast_to(self._lambda_market(self.calibration_date), (num_paths,))
        else:
            y = jnp.broadcast_to(y0, (num_paths,))
        return jnp.stack([y.astype(real_dtype()), jnp.zeros((num_paths,), dtype=real_dtype())], axis=-1)

    def _step_deterministic(self, t1, t2, state):
        # Track the market hazard exactly (cirpp.py:155-172).
        dt = t2 - t1
        lam_now = self._lambda_market(t1)
        lam_next = self._lambda_market(t2)
        log_b = state[:, 1] + lam_now * dt
        y = jnp.full_like(state[:, 0], lam_next)
        return jnp.stack([y, log_b], axis=-1)

    def supports_pallas_paths(self, scheme):
        from montecarlo_risk_engine_tpu.config import SimulationScheme

        return scheme == SimulationScheme.EULER

    def supports_pallas_ad(self, scheme):
        return self.supports_pallas_paths(scheme)

    # the hybrid kernel streams emissions in time chunks: any timeline length
    pallas_time_chunked = True

    def pallas_paths(self, params, scheme, timeline, num_paths, num_steps,
                     seed, phase=0, block_offset=0, rows_per_block=None):
        """Fused full-truncation-Euler trajectory: the 1-block case of the
        hybrid kernel (ops/pallas_hybrid.py); state [T, N, 2] = [y, log_B]."""
        import numpy as np

        from montecarlo_risk_engine_tpu.ops.pallas_hybrid import (
            KernelBlock,
            hybrid_paths,
        )

        rows = rows_per_block or 256
        block = KernelBlock(
            "cirpp_det" if self.deterministic else "cirpp", "euler", 0, 2, 1,
            hazard_tenors=tuple(np.asarray(self.tenors).tolist()),
            hazard_rates=tuple(np.asarray(self.hazard_rates).tolist()),
        )
        params_vec = jnp.stack(
            [jnp.asarray(p, dtype=jnp.float32) for p in params]
        )
        return hybrid_paths(
            [block], np.eye(1), timeline, num_paths, num_steps,
            seed=seed, phase=phase, block_offset=block_offset,
            calibration_date=self.calibration_date, rows_per_block=rows,
            params_vec=params_vec,
        )

    def invert_noise(self, params, scheme, t1, t2, state, next_state):
        # Full-truncation Euler residual of the y column (log_B is a
        # deterministic accumulator of lambda(t1, y_t1)).  Where the
        # diffusion vanishes (y <= 0 under full truncation) the draw is
        # unrecoverable but its tangent coefficient is 0, so return 0.
        # Deterministic mode consumes no noise at all.
        if self.deterministic:
            return jnp.zeros_like(state[:, 0:1])
        kappa, theta, sigma, _ = self._unpack(params)
        dt = t2 - t1
        y = state[:, 0:1]
        y_next = next_state[:, 0:1]
        diff = sigma * jnp.sqrt(jnp.maximum(y, 0.0)) * jnp.sqrt(dt)
        raw = y_next - y - kappa * (theta - y) * dt
        safe = jnp.where(diff > 0.0, diff, 1.0)
        return jnp.where(diff > 0.0, raw / safe, 0.0)

    def step_euler(self, params, t1, t2, state, corr_noise):
        # Full-truncation Euler with lambda accumulator (cirpp.py:174-198).
        if self.deterministic:
            return self._step_deterministic(t1, t2, state)
        kappa, theta, sigma, _ = self._unpack(params)
        dt = t2 - t1
        y = state[:, 0]
        noise = corr_noise[:, 0] if corr_noise.ndim == 2 else corr_noise
        sqrt_y = jnp.sqrt(jnp.maximum(y, 0.0))
        y_next = y + kappa * (theta - y) * dt + sigma * sqrt_y * jnp.sqrt(dt) * noise
        lam = self.lambda_t(params, t1, y)
        log_b = state[:, 1] + lam * dt
        return jnp.stack([jnp.maximum(y_next, 1e-12), log_b], axis=-1)

    def step_milstein(self, params, t1, t2, state, corr_noise):
        # Milstein refinement of the state-dependent sqrt(y) diffusion: adds
        # 0.25 sigma^2 (dW^2 - dt), the same variance-leg correction the
        # Heston CIR variance uses (heston.py Milstein; round-4 verdict #6 —
        # previously this silently aliased Euler).  Not present in the
        # reference (quirk Q1: its Milstein enum never dispatches).
        if self.deterministic:
            return self._step_deterministic(t1, t2, state)
        kappa, theta, sigma, _ = self._unpack(params)
        dt = t2 - t1
        y = state[:, 0]
        noise = corr_noise[:, 0] if corr_noise.ndim == 2 else corr_noise
        sqrt_y = jnp.sqrt(jnp.maximum(y, 0.0))
        dw = jnp.sqrt(dt) * noise
        y_next = (
            y + kappa * (theta - y) * dt + sigma * sqrt_y * dw
            + 0.25 * sigma * sigma * (dw * dw - dt)
        )
        lam = self.lambda_t(params, t1, y)
        log_b = state[:, 1] + lam * dt
        return jnp.stack([jnp.maximum(y_next, 1e-12), log_b], axis=-1)

    def step_analytical(self, params, t1, t2, state, corr_noise):
        # Moment-matched lognormal proxy for the CIR transition
        # (cirpp.py:200-237), with the log_B accumulator kept consistent
        # (fixes quirk Q7).
        if self.deterministic:
            return self._step_deterministic(t1, t2, state)
        kappa, theta, sigma, _ = self._unpack(params)
        dt = t2 - t1
        y = state[:, 0]
        noise = corr_noise[:, 0] if corr_noise.ndim == 2 else corr_noise
        ekt = jnp.exp(-kappa * dt)
        m = theta + (y - theta) * ekt
        v = sigma * sigma * (y * ekt * (1.0 - ekt) / kappa + 0.5 * theta * (1.0 - ekt) ** 2 / kappa)
        var_ratio = jnp.maximum(v / (m * m + _EPS), 1e-12)
        mu_ln = jnp.log(jnp.maximum(m, _EPS)) - 0.5 * jnp.log1p(var_ratio)
        sig_ln = jnp.sqrt(jnp.log1p(var_ratio))
        # The ANALYTICAL scheme feeds covariance-scaled noise (std = sqrt of
        # covariance_matrix); undo that scale to recover a standard normal.
        std = jnp.sqrt(self.covariance_matrix(params, dt)[0, 0])
        z = noise / jnp.maximum(std, _EPS)
        y_next = jnp.exp(mu_ln + sig_ln * z)
        lam = self.lambda_t(params, t1, y)
        log_b = state[:, 1] + lam * dt
        return jnp.stack([jnp.maximum(y_next, 1e-12), log_b], axis=-1)

    def analytic_factor_loadings(self, params):
        """Moment-matched Gaussian factor loading (VERDICT r3 #9).

        At the representative level y = theta the CIR diffusion is an OU
        factor with mean reversion kappa and vol sigma*sqrt(theta): its
        increment variance sigma^2 theta (1 - e^{-2 kappa dt}) / (2 kappa)
        is ALGEBRAICALLY identical to this model's covariance_matrix
        normalisation (expand x = e^{-kappa dt}: x(1-x)/k + (1-x)^2/(2k) =
        (1-x^2)/(2k)).  So under the ANALYTICAL scheme the joint covariance
        assembled by ModelConfig._inter_covariance correlates the
        lognormal-proxy driver z with other Gaussian factors at exactly the
        user-specified rho — the step's std-normalisation recovers z ~
        N(0,1) with the intended cross-correlation.  This closes the
        reference contract gap (model_config.py:193-221 raises for any
        non-BS pair) for the hybrid wrong-way-risk books.
        """
        kappa, theta, sigma, _ = self._unpack(params)
        return [(kappa, sigma * jnp.sqrt(theta))]

    def covariance_matrix(self, params, delta_t):
        # Conditional CIR variance at y = theta as a representative scale —
        # only used to normalise the ANALYTICAL noise stream above.
        kappa, theta, sigma, _ = self._unpack(params)
        ekt = jnp.exp(-kappa * delta_t)
        v = sigma * sigma * theta * (ekt * (1.0 - ekt) / kappa + 0.5 * (1.0 - ekt) ** 2 / kappa)
        return jnp.reshape(jnp.maximum(v, _EPS), (1, 1))

    # -- survival quantities (cirpp.py:246-295) ------------------------------

    def survival_probability(self, params, t, T, y_t):
        if self.deterministic:
            ratio = self._market_survival(T) / self._market_survival(t)
            return jnp.ones_like(y_t) * ratio
        _, _, _, y0 = self._unpack(params)
        zero = jnp.zeros(())
        a0t = self._A(params, zero, t)
        a0T = self._A(params, zero, T)
        b0t = self._B(params, zero, t)
        b0T = self._B(params, zero, T)
        sm_t = self._market_survival(t)
        sm_T = self._market_survival(T)
        a_tT = self._A(params, t, T)
        b_tT = self._B(params, t, T)
        pref = (sm_T / sm_t) * (a0t / a0T) * jnp.exp(-b0t * y0 + b0T * y0)
        return pref * a_tT * jnp.exp(-b_tT * y_t)

    def credit_spread(self, params, t, T, y_t, delta: float = 0.40):
        s = self.survival_probability(params, t, T, y_t)
        dt = jnp.maximum(jnp.asarray(T) - jnp.asarray(t), 1e-12)
        inside = jnp.maximum(delta + (1.0 - delta) * s, 1e-24)
        return -jnp.log(inside) / dt

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        if kind == AtomicRequestType.SURVIVAL_PROBABILITY:
            return jnp.exp(-self._state_col(state, 1))
        if kind == AtomicRequestType.CONDITIONAL_SURVIVAL_PROBABILITY:
            return self.survival_probability(params, t1, t2, self._state_col(state, 0))
        raise NotImplementedError(f"Request type {kind} not supported by CIRPPModel.")
