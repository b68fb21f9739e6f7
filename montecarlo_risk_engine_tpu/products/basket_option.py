"""Basket option (arithmetic / geometric) with optional control variate.

Counterpart of reference ``src/products/basket_option.py``
(basket_option.py:6-142): weighted basket terminal payoff; the control-variate
mode prices the arithmetic payoff minus the geometric payoff plus the
closed-form geometric PV (basket_option.py:72-78) — an exact variance
reduction under BSMulti.
"""

from __future__ import annotations

import enum
from typing import Sequence

import jax.numpy as jnp
from jax.scipy.special import ndtr

from montecarlo_risk_engine_tpu.config import asarray
from montecarlo_risk_engine_tpu.products.base import OptionType, Product, ProductFamily
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class BasketOptionType(enum.Enum):
    ARITHMETIC = 0
    GEOMETRIC = 1


class BasketOption(Product):
    def __init__(
        self,
        maturity: float,
        asset_ids: Sequence[str],
        weights: Sequence[float],
        strike: float,
        option_type: OptionType,
        basket_option_type: BasketOptionType = BasketOptionType.ARITHMETIC,
        use_variation_reduction: bool = False,
    ):
        super().__init__(
            asset_ids=asset_ids,
            product_family=ProductFamily.BASKET_TERMINAL_PAYOFF,
        )
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.weights = tuple(float(w) for w in weights)
        self.option_type = option_type
        self.basket_option_type = basket_option_type
        self.use_variation_reduction = use_variation_reduction
        self.product_timeline = (self.maturity,)
        self.modeling_timeline = self.product_timeline
        self.regression_timeline = ()

        self.numeraire_requests = {0: AtomicRequest(AtomicRequestType.NUMERAIRE, maturity)}
        self.spot_requests = {
            (0, asset_id): AtomicRequest(AtomicRequestType.SPOT) for asset_id in self.asset_ids
        }

    def _basket(self, spots, basket_type: BasketOptionType):
        w = asarray(self.weights)
        if basket_type == BasketOptionType.ARITHMETIC:
            return jnp.sum(spots * w, axis=1)
        return jnp.exp(jnp.sum(jnp.log(spots + 1e-10) * w, axis=1))

    def _vanilla_payoff(self, basket):
        sign = 1.0 if self.option_type == OptionType.CALL else -1.0
        return jnp.maximum(sign * (basket - self.strike), 0.0)

    def payoff(self, spots, model, params):
        base = self._vanilla_payoff(self._basket(spots, self.basket_option_type))
        if not self.use_variation_reduction:
            return base
        geometric = self._vanilla_payoff(self._basket(spots, BasketOptionType.GEOMETRIC))
        correction = self.compute_pv_analytically(model, params)
        return base - geometric + correction

    def compute_normalized_cashflows(
        self, time_idx, model, params, resolved_requests,
        regression_function=None, state_matrix=None,
    ):
        spots = jnp.stack(
            [resolved_requests[0][self.spot_requests[(0, a)].handle] for a in self.asset_ids],
            axis=1,
        )
        numeraire = resolved_requests[0][self.numeraire_requests[0].handle]
        normalized = self.payoff(spots, model, params) / numeraire
        return state_matrix, normalized[:, None]

    def compute_pv_analytically(self, model, params):
        """Closed-form geometric basket under BSMulti (basket_option.py:103-140)."""
        n = model.num_assets
        spots = jnp.stack(params[:n])
        sigmas = jnp.stack(params[n : 2 * n])
        rate = params[2 * n]
        tau = asarray(self.maturity)
        w = asarray(self.weights)

        f_bar = jnp.exp(jnp.mean(jnp.log(spots)))
        cov = model.covariance_matrix(params, tau)
        basket_var = w @ cov @ w
        sigma_b = jnp.sqrt(basket_var)
        sum_sq = jnp.sum(sigmas**2)
        fwd = f_bar * jnp.exp((rate - 0.5 * sum_sq / n) * tau + 0.5 * sigma_b**2)

        sig_sqrt_t = sigma_b  # cov already carries tau
        d1 = (jnp.log(fwd / self.strike) + 0.5 * sigma_b**2) / sig_sqrt_t
        d2 = d1 - sig_sqrt_t
        disc = jnp.exp(-rate * tau)
        if self.option_type == OptionType.CALL:
            return disc * (fwd * ndtr(d1) - self.strike * ndtr(d2))
        return disc * (self.strike * ndtr(-d2) - fwd * ndtr(-d1))
