"""Heston stochastic-volatility model: full-truncation Euler + Andersen QE.

Counterpart of reference ``src/models/heston.py`` (heston.py:35-253).
State = [logS, v]; simulation_dim = 2.
Params (reference order): spot, volatility (vol-of-vol), rate, rho, kappa,
theta, initial_variance.

The QE scheme follows Andersen (2008) with gamma1=1, gamma2=0 K-coefficients
(heston.py:145-159) and the reference's AAD-friendly fuzzy choices preserved
exactly: the mass-at-zero indicator of the exp-mixture branch is smoothed with
width 0.3 and the psi-switch at psi_c = 1.5 with width 0.5, both gated on
``perform_smoothing`` (heston.py:227-236).  Under QE the driver noise is left
uncorrelated — the spot/variance correlation enters through the K-coefficients
(heston.py:85-90).
"""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import SimulationScheme, asarray, real_dtype
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType
from montecarlo_risk_engine_tpu.utils.maths import compute_degree_of_truth

_EPS = 1e-12


class HestonModel(Model):
    def __init__(
        self,
        calibration_date: float,
        spot: float,
        rate: float,
        sigma: float,
        rho: float,
        kappa: float,
        theta: float,
        v0: float,
        asset_id: str | None = None,
        martingale_correction: bool = False,
    ):
        super().__init__(
            calibration_date=calibration_date,
            asset_ids=[asset_id] if asset_id else None,
            simulation_dim=2,
            state_dim=2,
        )
        self._init = (float(spot), float(sigma), float(rate), float(rho),
                      float(kappa), float(theta), float(v0))
        # Andersen's martingale correction (eq. 44): replaces K0 with the
        # branch-dependent K0* so E[S_{t+dt}] = S_t e^{r dt} exactly at any
        # step size.  Off by default — the reference uses plain K0
        # (heston.py:145-159) whose drift bias is O(dt).
        self.martingale_correction = bool(martingale_correction)

    def initial_params(self):
        return tuple(asarray(v) for v in self._init)

    def get_model_param_names(self):
        return ["spot", "volatility", "rate", "rho", "kappa", "theta", "initial_variance"]

    @staticmethod
    def _unpack(params):
        spot, sigma, rate, rho, kappa, theta, v0 = params
        return spot, sigma, rate, rho, kappa, theta, v0

    def init_state(self, params, num_paths):
        spot, *_ , v0 = self._unpack(params)
        log_s = jnp.broadcast_to(jnp.log(spot), (num_paths,))
        v = jnp.broadcast_to(v0, (num_paths,))
        return jnp.stack([log_s, v], axis=-1)

    def correlation_matrix(self, params, scheme):
        if scheme == SimulationScheme.QE:
            return jnp.eye(2, dtype=real_dtype())
        rho = params[3]
        one = jnp.ones((), dtype=real_dtype())
        return jnp.stack([jnp.stack([one, rho]), jnp.stack([rho, one])])

    def uses_uniforms(self, scheme):
        return scheme == SimulationScheme.QE

    # Preferred kernel block size: a v5e block-size sweep (rows
    # 16/32/64/128/256/512, BENCH_NOTES round 5) measured 15.0G
    # path-steps/s at 64 rows vs 12.7G at the old 256 — smaller output
    # windows overlap the grid's compute with the emission DMA better.
    # pick_rows_for_model reads this so the sharded and unsharded paths
    # agree on the block layout (global-block seeding contract).
    pallas_preferred_rows = 64

    def supports_pallas_paths(self, scheme):
        # The kernel mirrors both branch modes: hard indicators forward-only,
        # the fuzzy widths 0.3/0.5 when perform_smoothing (differentiation).
        return scheme == SimulationScheme.QE

    def supports_pallas_ad(self, scheme):
        # QE is not noise-invertible (branch mixing + the extra uniform), but
        # the kernel emits its raw draws and the emitted-noise tangent rule
        # re-derives the smoothed recurrence (ops/pallas_paths_ad.py).
        return scheme == SimulationScheme.QE

    def pallas_ad_mode(self, scheme):
        return "emit"

    def pallas_paths(self, params, scheme, timeline, num_paths, num_steps,
                     seed, phase=0, block_offset=0, rows_per_block=None):
        """Fused QE trajectory via the hardware-PRNG kernel
        (ops/pallas_paths.heston_qe_paths); state [T, N, 2] = [logS, v]."""
        from montecarlo_risk_engine_tpu.ops.pallas_paths import (
            heston_qe_paths,
            pick_rows_per_block,
        )

        rows = rows_per_block or pick_rows_per_block(
            num_paths, preferred=self.pallas_preferred_rows,
            outputs_per_path=2 * len(timeline))
        if rows is None:
            raise ValueError(f"num_paths {num_paths} not blockable for Pallas")
        return heston_qe_paths(
            params, timeline, num_paths, num_steps,
            seed=seed, phase=phase, block_offset=block_offset,
            calibration_date=self.calibration_date, rows_per_block=rows,
            smoothing=self.perform_smoothing,
        )

    def pallas_paths_with_noise(self, params, scheme, timeline, num_paths,
                                seed, phase=0, block_offset=0,
                                rows_per_block=None):
        """Noise-emitting QE kernel forward for the emitted-noise AD wrapper:
        (states [T, N, 2], z [T, N, 2], u [T, N]) at a substep-dense
        timeline."""
        from montecarlo_risk_engine_tpu.ops.pallas_paths import (
            heston_qe_paths,
            pick_rows_per_block,
        )

        rows = rows_per_block or pick_rows_per_block(
            num_paths, preferred=self.pallas_preferred_rows,
            outputs_per_path=self.pallas_emission_width(scheme, True)
            * len(timeline),
        )
        if rows is None:
            raise ValueError(f"num_paths {num_paths} not blockable for Pallas")
        return heston_qe_paths(
            params, timeline, num_paths, 1,
            seed=seed, phase=phase, block_offset=block_offset,
            calibration_date=self.calibration_date, rows_per_block=rows,
            smoothing=self.perform_smoothing, emit_noise=True,
        )

    def step_euler(self, params, t1, t2, state, corr_noise):
        # Full-truncation Euler (heston.py:99-121).
        _, sigma, rate, _, kappa, theta, _ = self._unpack(params)
        dt = t2 - t1
        log_s, v = state[:, 0], state[:, 1]
        sqrt_v = jnp.sqrt(jnp.maximum(v, 0.0))
        sqrt_dt = jnp.sqrt(dt)
        log_s_next = log_s + (rate - 0.5 * v) * dt + sqrt_v * sqrt_dt * corr_noise[:, 0]
        v_next = v + kappa * (theta - v) * dt + sigma * sqrt_v * sqrt_dt * corr_noise[:, 1]
        v_next = jnp.maximum(v_next, 0.0)
        return jnp.stack([log_s_next, v_next], axis=-1)

    def step_milstein(self, params, t1, t2, state, corr_noise):
        # Milstein refinement of the variance leg: adds 0.25 sigma^2 (dW^2-dt)
        # (the log-spot leg has state-independent diffusion given v, so its
        # Milstein term vanishes).  Not present in the reference (quirk Q1).
        _, sigma, rate, _, kappa, theta, _ = self._unpack(params)
        dt = t2 - t1
        log_s, v = state[:, 0], state[:, 1]
        sqrt_v = jnp.sqrt(jnp.maximum(v, 0.0))
        sqrt_dt = jnp.sqrt(dt)
        dw_v = sqrt_dt * corr_noise[:, 1]
        log_s_next = log_s + (rate - 0.5 * v) * dt + sqrt_v * sqrt_dt * corr_noise[:, 0]
        v_next = (
            v + kappa * (theta - v) * dt + sigma * sqrt_v * dw_v
            + 0.25 * sigma * sigma * (dw_v * dw_v - dt)
        )
        return jnp.stack([log_s_next, jnp.maximum(v_next, 0.0)], axis=-1)

    def _cir_conditional_moments(self, params, v, dt):
        # E[v_{t+dt}|v_t] and Var[v_{t+dt}|v_t] for the CIR variance
        # (heston.py:123-143).
        _, sigma, _, _, kappa, theta, _ = self._unpack(params)
        ekt = jnp.exp(-kappa * dt)
        mean = theta + (v - theta) * ekt
        var = (
            v * sigma * sigma * ekt * (1.0 - ekt) / kappa
            + theta * sigma * sigma * (1.0 - ekt) ** 2 / (2.0 * kappa)
        )
        return mean, var

    def _qe_k_coefficients(self, params, dt):
        # Andersen eq.33 coefficients with gamma1=1, gamma2=0 (heston.py:145-159).
        _, sigma, _, rho, kappa, theta, _ = self._unpack(params)
        gamma1, gamma2 = 1.0, 0.0
        k0 = -rho * kappa * theta / sigma * dt
        k1 = (kappa * rho / sigma - 0.5) * gamma1 * dt - rho / sigma
        k2 = (kappa * rho / sigma - 0.5) * gamma2 * dt + rho / sigma
        k3 = (1.0 - rho * rho) * gamma1 * dt
        k4 = (1.0 - rho * rho) * gamma2 * dt
        return k0, k1, k2, k3, k4

    def step_qe(self, params, t1, t2, state, corr_noise, uniform):
        _, sigma, rate, rho, kappa, theta, _ = self._unpack(params)
        dt = t2 - t1
        log_s, v = state[:, 0], state[:, 1]
        z_s, z_v = corr_noise[:, 0], corr_noise[:, 1]
        u = uniform[:, 0] if uniform.ndim == 2 else uniform

        m, s2 = self._cir_conditional_moments(params, v, dt)
        psi = s2 / (m * m + _EPS)

        # Quadratic branch (psi <= 2): v1 = a (b + z)^2 (heston.py:161-189).
        inv_psi = 1.0 / (psi + _EPS)
        tail = jnp.maximum(2.0 * inv_psi - 1.0, 0.0)
        b2 = jnp.maximum(2.0 * inv_psi - 1.0 + jnp.sqrt(2.0 * inv_psi) * jnp.sqrt(tail), 0.0)
        a = m / (1.0 + b2)
        v_quad = a * (jnp.sqrt(b2) + z_v) ** 2

        # Exp-mixture branch (psi >= 1), with fuzzy mass-at-zero indicator
        # width 0.3 (heston.py:192-232).
        p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-6)
        beta = (1.0 - p) / (m + _EPS)
        v_tail = jnp.log(jnp.maximum(1.0 - p, _EPS) / jnp.maximum(1.0 - u, _EPS)) / (beta + _EPS)
        w_mass = compute_degree_of_truth(u - p, self.perform_smoothing, 0.3)
        v_exp = w_mass * v_tail

        # Fuzzy switch between branches around psi_c = 1.5, width 0.5
        # (heston.py:234-236).
        w = compute_degree_of_truth(psi - 1.5, self.perform_smoothing, 0.5)
        v_next = (1.0 - w) * v_quad + w * v_exp

        k0, k1, k2, k3, k4 = self._qe_k_coefficients(params, dt)
        if self.martingale_correction:
            # Andersen eq. 44 with gamma2 = 0 (K4 = 0): K0* = -ln M - (K1 +
            # 0.5 K3) v where M = E[exp(K2 V+)|v] per branch.
            a_coef = m / (1.0 + b2)
            quad_arg = jnp.minimum(k2 * a_coef, 0.5 - 1e-6)
            m_quad = jnp.exp(quad_arg * b2 / (1.0 - 2.0 * quad_arg)) / jnp.sqrt(
                jnp.maximum(1.0 - 2.0 * quad_arg, _EPS)
            )
            beta_safe = jnp.maximum(beta, k2 + 1e-8)
            m_exp = p + beta_safe * (1.0 - p) / (beta_safe - k2)
            mart = jnp.where(psi > 1.5, m_exp, m_quad)
            k0 = -jnp.log(jnp.maximum(mart, _EPS)) - (k1 + 0.5 * k3) * v
        var_int = jnp.maximum(k3 * v + k4 * v_next, 0.0)
        vol = jnp.sqrt(jnp.maximum(var_int, _EPS))
        log_s_next = log_s + rate * dt + k0 + k1 * v + k2 * v_next + vol * z_s
        return jnp.stack([log_s_next, v_next], axis=-1)

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        # heston.py:255-280 — spot from log-state, constant-rate closed forms.
        _, _, rate, *_ = self._unpack(params)
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
        raise NotImplementedError(f"Request type {kind} not supported by HestonModel.")
