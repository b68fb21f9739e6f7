"""Barrier options (single/double) with optional Brownian-bridge correction.

Counterpart of reference ``src/products/barrier_option.py``
(barrier_option.py:16-314): discrete monitoring over a linspace timeline with
fuzzy max/min-vs-barrier indicators; optionally a Brownian-bridge crossing
correction with per-interval hit probability
``exp(-2 ln(S_i/B) ln(S_{i+1}/B) / (sigma^2 dt))`` compared fuzzily against a
dedicated uniform stream; analytic up-and-out / down-and-out call prices.

Deviations, decided deliberately (SURVEY.md quirks register):
  * Payoffs are deflated by the numeraire at maturity — the reference indexes
    the numeraire at the first observation date (barrier_option.py:312),
    leaving payoffs undiscounted for startdate = 0.
  * Bridge uniforms come from the engine's threefry stream (PHASE_BRIDGE,
    folded with the product id) instead of a host numpy Generator with a
    fixed seed independent of path count (quirk Q4, barrier_option.py:50).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
from jax.scipy.special import ndtr

from montecarlo_risk_engine_tpu import rng
from montecarlo_risk_engine_tpu.config import asarray, real_dtype
from montecarlo_risk_engine_tpu.products.base import OptionType, Product, ProductFamily
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType
from montecarlo_risk_engine_tpu.utils.maths import compute_degree_of_truth

import numpy as np


class BarrierOptionType(enum.Enum):
    DOWNANDOUT = "Down-And-Out"
    UPANDOUT = "Up-And-Out"
    DOWNANDIN = "Down-And-In"
    UPANDIN = "Up-And-In"


def _survival_weight(barrier_type: BarrierOptionType, below_max, above_min, hit_prob=None):
    """Multiplicative payoff weight for one barrier."""
    if barrier_type == BarrierOptionType.UPANDOUT:
        w = below_max
        if hit_prob is not None:
            w = w * (1.0 - hit_prob)
    elif barrier_type == BarrierOptionType.DOWNANDOUT:
        w = above_min
        if hit_prob is not None:
            w = w * (1.0 - hit_prob)
    elif barrier_type == BarrierOptionType.UPANDIN:
        w = 1.0 - below_max
        if hit_prob is not None:
            w = w * hit_prob
    elif barrier_type == BarrierOptionType.DOWNANDIN:
        w = 1.0 - above_min
        if hit_prob is not None:
            w = w * hit_prob
    else:
        raise NotImplementedError(f"Barrier type {barrier_type} not supported.")
    return w


class BarrierOption(Product):
    def __init__(
        self,
        startdate: float,
        maturity: float,
        strike: float,
        num_observation_timepoints: int,
        option_type: OptionType,
        barrier1: float,
        barrier_option_type1: BarrierOptionType,
        barrier2: Optional[float] = None,
        barrier_option_type2: Optional[BarrierOptionType] = None,
        asset_id: str | None = None,
    ):
        super().__init__(
            asset_ids=[asset_id],
            product_family=ProductFamily.BARRIER_PATH_TERMINAL,
        )
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.option_type = option_type
        self.barrier1 = float(barrier1)
        self.barrier_option_type1 = barrier_option_type1
        self.barrier2 = None if barrier2 is None else float(barrier2)
        self.barrier_option_type2 = barrier_option_type2
        self.use_brownian_bridge = False

        self.product_timeline = (self.maturity,)
        self.modeling_timeline = tuple(
            float(t) for t in np.linspace(startdate, maturity, num_observation_timepoints)
        )
        self.regression_timeline = ()

        self.numeraire_requests = {
            idx: AtomicRequest(AtomicRequestType.NUMERAIRE, t)
            for idx, t in enumerate(self.modeling_timeline)
        }
        asset = self.get_asset_id()
        self.spot_requests = {
            (idx, asset): AtomicRequest(AtomicRequestType.SPOT)
            for idx in range(len(self.modeling_timeline))
        }

    def set_use_brownian_bridge(self):
        self.use_brownian_bridge = True

    # -- payoffs --------------------------------------------------------------

    def _vanilla_payoff(self, terminal_spots):
        sign = 1.0 if self.option_type == OptionType.CALL else -1.0
        return jnp.maximum(sign * (terminal_spots - self.strike), 0.0)

    def _discrete_weight(self, spots, barrier, barrier_type):
        max_spot = jnp.max(spots, axis=1)
        min_spot = jnp.min(spots, axis=1)
        below_max = compute_degree_of_truth(barrier - max_spot, True)
        above_min = compute_degree_of_truth(min_spot - barrier, True)
        return _survival_weight(barrier_type, below_max, above_min)

    def _bridge_hit_prob(self, spots, barrier, sigma, uniforms, is_fuzzy):
        # Per-interval crossing probability of a Brownian bridge in log space
        # (barrier_option.py:152-176); overall hit = 1 - prod(1 - p_i).
        #
        # Deliberate deviation: the reference always smooths the
        # bridge-vs-uniform comparison with width 0.05
        # (barrier_option.py:176), which injects ~1.25% spurious hit mass per
        # interval (a large bias for fine monitoring grids — their pytests
        # never enable bridge mode).  Here the indicator is hard unless
        # differentiation requires smoothing, like every other policy/indicator
        # smoothing in the engine (model.py:83-90).
        n_obs = spots.shape[1]
        dt = self.maturity / n_obs
        log_ratio = jnp.log(spots / barrier)
        bridge = jnp.exp(-2.0 * log_ratio[:, :-1] * log_ratio[:, 1:] / (sigma * sigma * dt))
        hit_probs = compute_degree_of_truth(bridge - uniforms, is_fuzzy)
        return 1.0 - jnp.prod(1.0 - hit_probs, axis=1)

    def payoff(self, spots, model, params, bridge_uniforms=None):
        vanilla = self._vanilla_payoff(spots[:, -1])
        if self.use_brownian_bridge:
            sigma = params[1]  # BS-family volatility (barrier_option.py:151)
            is_fuzzy = bool(getattr(model, "perform_smoothing", False))
            hit1 = self._bridge_hit_prob(spots, self.barrier1, sigma, bridge_uniforms[0], is_fuzzy)
            max_spot = jnp.max(spots, axis=1)
            min_spot = jnp.min(spots, axis=1)
            below_max = compute_degree_of_truth(self.barrier1 - max_spot, True)
            above_min = compute_degree_of_truth(min_spot - self.barrier1, True)
            payoff = vanilla * _survival_weight(
                self.barrier_option_type1, below_max, above_min, hit1
            )
            if self.barrier2 is not None and self.barrier_option_type2 is not None:
                hit2 = self._bridge_hit_prob(spots, self.barrier2, sigma, bridge_uniforms[1], is_fuzzy)
                below_max2 = compute_degree_of_truth(self.barrier2 - max_spot, True)
                above_min2 = compute_degree_of_truth(min_spot - self.barrier2, True)
                payoff = payoff * _survival_weight(
                    self.barrier_option_type2, below_max2, above_min2, hit2
                )
            return payoff

        payoff = vanilla * self._discrete_weight(spots, self.barrier1, self.barrier_option_type1)
        if self.barrier2 is not None and self.barrier_option_type2 is not None:
            payoff = payoff * self._discrete_weight(spots, self.barrier2, self.barrier_option_type2)
        return payoff

    def compute_normalized_cashflows(
        self, time_idx, model, params, resolved_requests,
        regression_function=None, state_matrix=None,
    ):
        asset = self.get_asset_id()
        monitored = jnp.stack(
            [
                resolved_requests[0][self.spot_requests[(idx, asset)].handle]
                for idx in range(len(self.modeling_timeline))
            ],
            axis=1,
        )
        numeraire = resolved_requests[0][
            self.numeraire_requests[len(self.modeling_timeline) - 1].handle
        ]
        bridge_uniforms = None
        if self.use_brownian_bridge:
            num_paths = monitored.shape[0]
            n_int = len(self.modeling_timeline) - 1
            base = rng.phase_key(rng.root_key(0), rng.PHASE_BRIDGE)
            k1 = rng.step_key(base, self.product_id, 0)
            k2 = rng.step_key(base, self.product_id, 1)
            bridge_uniforms = (
                rng.uniforms(k1, (num_paths, n_int), real_dtype()),
                rng.uniforms(k2, (num_paths, n_int), real_dtype()),
            )
        normalized = self.payoff(monitored, model, params, bridge_uniforms) / numeraire
        return state_matrix, normalized[:, None]

    # -- analytic prices (barrier_option.py:245-301) ------------------------------

    def compute_pv_analytically(self, model, params):
        spot, sigma, rate = params[0], params[1], params[2]
        barrier = asarray(self.barrier1)
        strike = asarray(self.strike)
        tau = asarray(self.maturity)
        sqrt_tau = jnp.sqrt(tau)

        def d_plus(x_over_y):
            return (jnp.log(x_over_y) + (rate + 0.5 * sigma * sigma) * tau) / (sigma * sqrt_tau)

        if self.barrier_option_type1 == BarrierOptionType.UPANDOUT and self.option_type == OptionType.CALL:
            d1_sk = d_plus(spot / strike)
            d1_sb = d_plus(spot / barrier)
            d1_bk = d_plus(barrier * barrier / (strike * spot))
            d1_bs = d_plus(barrier / spot)
            vol_shift = sigma * sqrt_tau
            term1 = ndtr(d1_sk) - ndtr(d1_sb)
            term2 = ndtr(d1_bk) - ndtr(d1_bs)
            term3 = ndtr(d1_sk - vol_shift) - ndtr(d1_sb - vol_shift)
            term4 = ndtr(d1_bk - vol_shift) - ndtr(d1_bs - vol_shift)
            power = 1.0 + 2.0 * rate / (sigma * sigma)
            term_spot = spot * (term1 - (barrier / spot) ** power * term2)
            term_strike = strike * jnp.exp(-rate * tau) * (
                term3 - (spot / barrier) ** (1.0 - 2.0 * rate / (sigma * sigma)) * term4
            )
            below = (spot < barrier).astype(real_dtype())
            return below * (term_spot - term_strike)

        if self.barrier_option_type1 == BarrierOptionType.DOWNANDOUT and self.option_type == OptionType.CALL:
            d1 = d_plus(spot / strike)
            d2 = d1 - sigma * sqrt_tau
            d1_bk = d_plus(barrier * barrier / (strike * spot))
            d2_bk = d1_bk - sigma * sqrt_tau
            factor = (barrier / spot) ** (2.0 * rate / (sigma * sigma))
            term1 = spot * ndtr(d1) - strike * jnp.exp(-rate * tau) * ndtr(d2)
            term2 = (barrier / spot) * ndtr(d1_bk) - (strike / spot) * jnp.exp(-rate * tau) * ndtr(d2_bk)
            above = (spot > barrier).astype(real_dtype())
            return above * (term1 - spot * factor * term2)

        raise NotImplementedError(
            f"Analytical price for {self.barrier_option_type1}/{self.option_type} not implemented."
        )
