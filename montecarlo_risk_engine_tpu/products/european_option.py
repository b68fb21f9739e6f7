"""European option on a generic underlying (Equity / Bond / Swap).

Counterpart of reference ``src/products/european_option.py``
(european_option.py:15-320): terminal payoff on a composite underlying value,
analytic Black–Scholes PV/exposure fast paths, a Heston characteristic-
function pricer (host-side oracle), a Vasicek bond-option closed form, and
analytic gamma/vomma used by the Hessian tests.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtr
from scipy.integrate import quad

from montecarlo_risk_engine_tpu.config import asarray
from montecarlo_risk_engine_tpu.models.base import Model
from montecarlo_risk_engine_tpu.models.black_scholes import BlackScholesModel
from montecarlo_risk_engine_tpu.models.black_scholes_multi import BlackScholesMulti
from montecarlo_risk_engine_tpu.models.heston import HestonModel
from montecarlo_risk_engine_tpu.models.vasicek import VasicekModel
from montecarlo_risk_engine_tpu.products.base import (
    OptionType,
    Product,
    ProductFamily,
)
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class EuropeanOption(Product):
    def __init__(
        self,
        underlying: Product,
        exercise_date: float,
        strike: float,
        option_type: OptionType,
        asset_id: Optional[str] = None,
    ):
        super().__init__(
            asset_ids=[asset_id],
            product_family=ProductFamily.VANILLA_TERMINAL_OPTION,
        )
        self.exercise_date = float(exercise_date)
        self.strike = float(strike)
        self.option_type = option_type
        self.underlying = underlying
        self.product_timeline = (self.exercise_date,)
        self.modeling_timeline = self.product_timeline
        self.regression_timeline = ()

        self.numeraire_requests = {0: AtomicRequest(AtomicRequestType.NUMERAIRE, exercise_date)}
        self.underlying_requests = {0: underlying.generate_underlying_requests_for_date(exercise_date)}

    # -- payoff (european_option.py:45-68) -----------------------------------

    def payoff(self, underlying_values, model, params):
        sign = 1.0 if self.option_type == OptionType.CALL else -1.0
        return jnp.maximum(sign * (underlying_values - self.strike), 0.0)

    def compute_normalized_cashflows(
        self, time_idx, model, params, resolved_requests,
        regression_function=None, state_matrix=None,
    ):
        value = resolved_requests[1][self.underlying_requests[0].get_handle()]
        numeraire = resolved_requests[0][self.numeraire_requests[0].handle]
        normalized = self.payoff(value, model, params) / numeraire
        return state_matrix, normalized[:, None]

    # -- Black–Scholes analytics (european_option.py:70-145) -------------------

    def _bs_spot_and_vol(self, model, params):
        if isinstance(model, BlackScholesMulti):
            idx = model.asset_ids.index(self.get_asset_id())
            return params[idx], params[model.num_assets + idx]
        spot, sigma, _ = params
        return spot, sigma

    def _bs_price(self, spot, rate, sigma, tau):
        sqrt_tau = jnp.sqrt(tau)
        d1 = (jnp.log(spot / self.strike) + (rate + 0.5 * sigma * sigma) * tau) / (sigma * sqrt_tau)
        d2 = d1 - sigma * sqrt_tau
        disc_k = self.strike * jnp.exp(-rate * tau)
        if self.option_type == OptionType.CALL:
            return spot * ndtr(d1) - disc_k * ndtr(d2)
        return disc_k * ndtr(-d2) - spot * ndtr(-d1)

    def supports_analytic_pv(self, model) -> bool:
        return isinstance(model, (BlackScholesModel, BlackScholesMulti))

    def supports_analytic_exposure(self, model) -> bool:
        return isinstance(model, (BlackScholesModel, BlackScholesMulti))

    def compute_pv_analytically(self, model, params):
        spot, sigma = self._bs_spot_and_vol(model, params)
        rate = params[2 * model.num_assets] if isinstance(model, BlackScholesMulti) else params[2]
        return self._bs_price(spot, rate, sigma, asarray(self.exercise_date - model.calibration_date))

    def compute_discounted_exposure_analytically(self, exposure_time, spot, numeraire, model, params):
        # Discounted forward BS value on each path (european_option.py:123-145).
        tau = self.exercise_date - float(exposure_time)
        if tau <= 0.0:
            return jnp.zeros_like(jnp.reshape(spot, (-1,)))
        _, sigma = self._bs_spot_and_vol(model, params)
        rate = params[2 * model.num_assets] if isinstance(model, BlackScholesMulti) else params[2]
        price = self._bs_price(jnp.reshape(spot, (-1,)), rate, sigma, asarray(tau))
        return price / jnp.reshape(numeraire, (-1,))

    # -- second-order analytics (european_option.py:290-320) --------------------

    def compute_dDeltadSpot_analytically(self, model, params):
        spot, sigma, rate = params[0], params[1], params[2]
        tau = asarray(self.exercise_date)
        d1 = (jnp.log(spot / self.strike) + (rate + 0.5 * sigma * sigma) * tau) / (sigma * jnp.sqrt(tau))
        pdf_d1 = jnp.exp(-0.5 * d1 * d1) / jnp.sqrt(2.0 * math.pi)
        return pdf_d1 / (spot * sigma * jnp.sqrt(tau))

    def compute_dVegadSigma_analytically(self, model, params):
        spot, sigma, rate = params[0], params[1], params[2]
        tau = asarray(self.exercise_date)
        d1 = (jnp.log(spot / self.strike) + (rate + 0.5 * sigma * sigma) * tau) / (sigma * jnp.sqrt(tau))
        d2 = d1 - sigma * jnp.sqrt(tau)
        pdf_d1 = jnp.exp(-0.5 * d1 * d1) / jnp.sqrt(2.0 * math.pi)
        return spot * pdf_d1 * jnp.sqrt(tau) * d1 * d2 / sigma

    # -- Heston semi-analytic price (host-side oracle) ----------------------------
    # Stable characteristic-function form (european_option.py:156-262): the
    # branch with Re(d) <= 0 and exp(-dT) in the log terms.

    @staticmethod
    def _heston_cf(idx, u, T, s0, r, kappa, theta, sigma, rho, v0):
        i = 1j
        a = kappa * theta
        if idx == 1:
            b, u_shift = kappa - rho * sigma, 0.5
        else:
            b, u_shift = kappa, -0.5
        z = (rho * sigma * i * u - b) ** 2 + sigma**2 * (u**2 - 2.0 * i * u * u_shift)
        d = np.sqrt(z)
        if np.real(d) > 0:
            d = -d
        g = (b - rho * sigma * i * u - d) / (b - rho * sigma * i * u + d)
        exp_neg = np.exp(-d * T)
        C = r * i * u * T + (a / sigma**2) * (
            (b - rho * sigma * i * u - d) * T - 2.0 * np.log((1.0 - g * exp_neg) / (1.0 - g))
        )
        D = ((b - rho * sigma * i * u - d) / sigma**2) * ((1.0 - exp_neg) / (1.0 - g * exp_neg))
        return np.exp(C + D * v0 + i * u * np.log(s0))

    def heston_call_price(self, model: HestonModel, strike: float, maturity: float, params=None):
        params = params or model.initial_params()
        s0, sigma, r, rho, kappa, theta, v0 = (float(p) for p in params)

        def q_j(j):
            def integrand(u_real):
                u = u_real + 0j
                phi = self._heston_cf(j, u, maturity, s0, r, kappa, theta, sigma, rho, v0)
                return np.real(np.exp(-1j * u * np.log(strike)) * phi / (1j * u))

            integral, _ = quad(integrand, 0.0, 100.0, limit=200)
            return 0.5 + integral / np.pi

        return s0 * q_j(1) - strike * np.exp(-r * maturity) * q_j(2)

    def compute_pv_analytically_heston(self, model: HestonModel, params=None):
        if not isinstance(model, HestonModel):
            raise TypeError("Expected a HestonModel")
        return self.heston_call_price(model, self.strike, self.exercise_date, params)

    # -- Vasicek bond-option closed form (european_option.py:264-288) --------------

    def compute_pv_bond_option_analytically(self, model: VasicekModel, params):
        from montecarlo_risk_engine_tpu.products.bond import Bond

        if not isinstance(self.underlying, Bond):
            raise TypeError("Expected the underlying to be a Bond")
        rate, sigma, _, a = params
        t0 = model.calibration_date
        p_exercise = model.bond_price(params, t0, self.exercise_date, rate)
        p_maturity = model.bond_price(params, t0, self.underlying.maturity, rate)
        b_ts = (1.0 - jnp.exp(-a * (self.underlying.maturity - self.exercise_date))) / a
        sigma_p = sigma * jnp.sqrt((1.0 - jnp.exp(-2.0 * a * (self.exercise_date - t0))) / (2.0 * a)) * b_ts
        d1 = (jnp.log(p_maturity / (p_exercise * self.strike)) + 0.5 * sigma_p**2) / sigma_p
        d2 = d1 - sigma_p
        if self.option_type == OptionType.CALL:
            return p_maturity * ndtr(d1) - self.strike * p_exercise * ndtr(d2)
        return self.strike * p_exercise * ndtr(-d2) - p_maturity * ndtr(-d1)
