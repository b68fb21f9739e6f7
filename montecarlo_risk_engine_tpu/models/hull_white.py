"""Hull–White one-factor short-rate model fitted to an initial discount curve.

The reference ships a broken/legacy Hull-White (stale imports, pre-refactor
step API, "TODO: Fix!!" — hull_white.py:1-7,124; quirk Q2).  This is the
working rebuild on the modern step protocol, with the same role: a
curve-fitted Gaussian short-rate model for swap/swaption exposure books.

Dynamics: r(t) = x(t) + alpha(t) with dx = -a x dt + sigma dW, x(0)=0 and
alpha(t) = f_mkt(0,t) + (sigma^2 / 2a^2)(1 - e^{-a t})^2, which reprices the
input curve exactly.  State = [r, log_B] with the same left-Riemann numeraire
accumulator convention as Vasicek (vasicek.py:79-80).

Zero-coupon bonds conditional on the state:
  P(t,T) = (P0(T)/P0(t)) exp(B(t,T) f(0,t) - sigma^2 B^2 (1-e^{-2at})/(4a)
                              - B(t,T) r(t)) ... standard HW reconstitution
with B(t,T) = (1 - e^{-a(T-t)})/a.

Params: volatility (sigma), mean_reversion (a).  The market curve (discount
factors at pillar times) is static configuration, interpolated on device in
log-space (piecewise-constant forwards).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import asarray, real_dtype
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType

class HullWhiteModel(Model):
    def __init__(
        self,
        calibration_date: float,
        curve_times: Sequence[float],
        curve_discount_factors: Sequence[float],
        volatility: float,
        mean_reversion: float,
        asset_id: str | None = None,
    ):
        super().__init__(
            calibration_date=calibration_date,
            state_dim=2,
            asset_ids=[asset_id],
        )
        if len(curve_times) != len(curve_discount_factors) or len(curve_times) < 2:
            raise ValueError("Provide >= 2 curve pillars with matching lengths.")
        self.curve_times = asarray([float(t) for t in curve_times])
        self.log_dfs = jnp.log(asarray([float(v) for v in curve_discount_factors]))
        # Piecewise-constant instantaneous forwards, precomputed HOST-side in
        # f64: segment k covers [t_k, t_{k+1}) with f = -dlogP/dt (flat-forward
        # convention; right-continuous at pillars, last slope extrapolated).
        # A runtime central difference of logP in f32 loses ~2 digits to
        # cancellation AND disagrees with the Pallas kernel's f64 host mirror
        # (ops/pallas_hybrid.py hw_fwd0) — the recovered driver noise then
        # absorbs the offset as c/scale(sigma), injecting spurious vega into
        # the differentiated kernel path (found by CRN-FD on hardware).
        import numpy as _np

        _t = _np.asarray([float(t) for t in curve_times], dtype=_np.float64)
        _lp = _np.log(_np.asarray([float(v) for v in curve_discount_factors],
                                  dtype=_np.float64))
        self._fwd_segs_host = -_np.diff(_lp) / _np.diff(_t)
        self._fwd_segs = asarray(self._fwd_segs_host)
        self._init = (float(volatility), float(mean_reversion))

    @classmethod
    def from_flat_rate(cls, calibration_date, rate, volatility, mean_reversion,
                       horizon: float = 100.0, asset_id=None):
        times = [calibration_date, calibration_date + horizon]
        dfs = [1.0, float(jnp.exp(-rate * horizon))]
        return cls(calibration_date, times, dfs, volatility, mean_reversion, asset_id=asset_id)

    def initial_params(self):
        return tuple(asarray(v) for v in self._init)

    def get_model_param_names(self):
        return ["volatility", "mean_reversion"]

    # -- market curve --------------------------------------------------------

    def _log_p0(self, t):
        """log P_mkt(0,t), linear in t between pillars (flat-forward)."""
        slope_last = (self.log_dfs[-1] - self.log_dfs[-2]) / (self.curve_times[-1] - self.curve_times[-2])
        t = jnp.asarray(t)
        inside = jnp.interp(t, self.curve_times, self.log_dfs)
        beyond = self.log_dfs[-1] + slope_last * (t - self.curve_times[-1])
        return jnp.where(t > self.curve_times[-1], beyond, inside)

    def _fwd0(self, t):
        """Instantaneous market forward f(0,t): exact segment-slope lookup.

        Right-continuous at pillars, first/last slope beyond the ends — the
        identical table (and convention) the Pallas kernel's host mirror
        reads (ops/pallas_hybrid.py hw_fwd0), so the differentiated kernel
        path's noise inversion sees EXACTLY the alpha the kernel used."""
        idx = jnp.clip(
            jnp.searchsorted(self.curve_times, jnp.asarray(t), side="right") - 1,
            0, self._fwd_segs.shape[0] - 1,
        )
        return self._fwd_segs[idx]

    def _alpha(self, params, t):
        sigma, a = params
        dt = jnp.asarray(t) - self.calibration_date
        return self._fwd0(t) + (sigma * sigma / (2.0 * a * a)) * (1.0 - jnp.exp(-a * dt)) ** 2

    # -- simulation -----------------------------------------------------------

    def init_state(self, params, num_paths):
        r0 = jnp.broadcast_to(self._fwd0(self.calibration_date), (num_paths,)).astype(real_dtype())
        return jnp.stack([r0, jnp.zeros_like(r0)], axis=-1)

    def analytic_factor_loadings(self, params):
        sigma, a = params
        return [(a, sigma)]

    def covariance_matrix(self, params, delta_t):
        sigma, a = params
        var = (sigma * sigma / (2.0 * a)) * (1.0 - jnp.exp(-2.0 * a * delta_t))
        return var.reshape(1, 1)

    def step_analytical(self, params, t1, t2, state, corr_noise):
        # Exact OU transition on x = r - alpha(t); noise already carries the
        # exact conditional std (covariance_matrix above).
        sigma, a = params
        dt = t2 - t1
        r = state[:, 0:1]
        log_b = state[:, 1:2] + r * dt
        x = r - self._alpha(params, t1)
        x_next = x * jnp.exp(-a * dt) + corr_noise
        r_next = x_next + self._alpha(params, t2)
        return jnp.concatenate([r_next, log_b], axis=-1)

    def step_euler(self, params, t1, t2, state, corr_noise):
        # dr = (theta(t) - a r) dt + sigma dW with theta(t) = alpha'(t) + a alpha(t);
        # discretised via the x-factor to avoid differentiating alpha.
        sigma, a = params
        dt = t2 - t1
        r = state[:, 0:1]
        log_b = state[:, 1:2] + r * dt
        x = r - self._alpha(params, t1)
        x_next = x - a * x * dt + sigma * jnp.sqrt(dt) * corr_noise
        r_next = x_next + self._alpha(params, t2)
        return jnp.concatenate([r_next, log_b], axis=-1)

    # Milstein == Euler: the x-factor diffusion sigma is state-independent.
    step_milstein = step_euler

    def invert_noise(self, params, scheme, t1, t2, state, next_state):
        # Exact transition inversion on the x-factor (differentiable kernel
        # path, ops/pallas_paths_ad.py).
        from montecarlo_risk_engine_tpu.config import SimulationScheme

        sigma, a = params
        dt = t2 - t1
        x = state[:, 0:1] - self._alpha(params, t1)
        x_next = next_state[:, 0:1] - self._alpha(params, t2)
        if scheme == SimulationScheme.ANALYTICAL:
            return x_next - x * jnp.exp(-a * dt)
        return (x_next - x + a * x * dt) / (sigma * jnp.sqrt(dt))

    # -- fused Pallas path generation ----------------------------------------

    def supports_pallas_paths(self, scheme):
        from montecarlo_risk_engine_tpu.config import SimulationScheme

        return scheme in (SimulationScheme.ANALYTICAL, SimulationScheme.EULER,
                          SimulationScheme.MILSTEIN)

    def supports_pallas_ad(self, scheme):
        return self.supports_pallas_paths(scheme)

    # the hybrid kernel streams emissions in time chunks: any timeline length
    pallas_time_chunked = True

    def pallas_paths(self, params, scheme, timeline, num_paths, num_steps,
                     seed, phase=0, block_offset=0, rows_per_block=None):
        """Fused curve-fitted-OU trajectory as a single "hw" block of the
        hybrid kernel (ops/pallas_hybrid.py); state [T, N, 2] = [r, log_B].
        The market curve is interpolated host-side at the static substep
        times; only the traced (sigma, a) drift correction is SMEM math."""
        import numpy as np

        from montecarlo_risk_engine_tpu.config import SimulationScheme
        from montecarlo_risk_engine_tpu.ops.pallas_hybrid import (
            KernelBlock,
            hybrid_paths,
        )
        rows = rows_per_block or 256
        # curve_vals carries the f64 HOST segment-forward table (not log
        # discount factors): hw_fwd0 must return bit-identical values to the
        # model's _fwd0 lookup or the AD noise inversion sees a different
        # alpha than the kernel used (spurious vega — see __init__).
        block = KernelBlock(
            "hw",
            "exact" if scheme == SimulationScheme.ANALYTICAL else "euler",
            0, 2, 1,
            curve_times=tuple(float(t) for t in np.asarray(self.curve_times, dtype=np.float64)),
            curve_vals=tuple(float(f) for f in self._fwd_segs_host),
        )
        params_vec = jnp.stack([jnp.asarray(p, dtype=jnp.float32) for p in params])
        return hybrid_paths(
            [block], np.eye(1), timeline, num_paths, num_steps,
            seed=seed, phase=phase, block_offset=block_offset,
            calibration_date=self.calibration_date, rows_per_block=rows,
            params_vec=params_vec,
        )

    # -- observables -----------------------------------------------------------

    def bond_price(self, params, t1, t2, r_state, t_state=None):
        """P(t1,t2 | r(t1)=r_state) via HW reconstitution."""
        sigma, a = params
        t1 = jnp.asarray(t1)
        t2 = jnp.asarray(t2)
        dt0 = t1 - self.calibration_date
        B = (1.0 - jnp.exp(-a * (t2 - t1))) / a
        log_ratio = self._log_p0(t2) - self._log_p0(t1)
        x = r_state - self._alpha(params, t1)
        var_term = (sigma * sigma / (4.0 * a)) * B * B * (1.0 - jnp.exp(-2.0 * a * dt0))
        return jnp.exp(log_ratio - B * x - var_term)

    def resolve_obs(self, params, kind, asset_id, t1, t2, state):
        if kind == AtomicRequestType.SPOT:
            return self._state_col(state, 0)
        if kind == AtomicRequestType.DISCOUNT_FACTOR:
            # Market discount factor to time1 (deterministic at calibration).
            return jnp.exp(self._log_p0(t1) - self._log_p0(self.calibration_date))
        if kind == AtomicRequestType.FORWARD_RATE:
            # Conditional bond price P(t1,t2) — consumed as a discount factor
            # by the Bond product, same convention as Vasicek
            # (vasicek.py:141-144).
            return self.bond_price(params, t1, t2, self._state_col(state, 0))
        if kind == AtomicRequestType.LIBOR_RATE:
            p = self.bond_price(params, t1, t2, self._state_col(state, 0))
            return (1.0 / p - 1.0) / (t2 - t1)
        if kind == AtomicRequestType.NUMERAIRE:
            return jnp.exp(self._state_col(state, 1))
        raise NotImplementedError(f"Request type {kind} not supported by HullWhiteModel.")
