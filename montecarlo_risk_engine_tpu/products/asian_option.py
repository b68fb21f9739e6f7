"""Asian option: arithmetic/geometric average over an observation timeline.

Counterpart of reference ``src/products/asian_option.py`` (asian_option.py:11-95).
The modeling timeline is a linspace of observation dates; the cashflow event
is the single terminal payoff on the average.

Deliberate deviation: the reference indexes its numeraire request with
``len(product_timeline) - 1 == 0`` (asian_option.py:88), i.e. the numeraire at
the *first* observation date, leaving the payoff effectively undiscounted when
startdate = 0.  Here the payoff is deflated by the numeraire at maturity (the
last modeling index), consistent with every other product's discounting
convention (SURVEY.md quirks register).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.products.base import OptionType, Product, ProductFamily
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class AsianAveragingType(enum.Enum):
    ARITHMETIC = 0
    GEOMETRIC = 1


class AsianOption(Product):
    def __init__(
        self,
        startdate: float,
        maturity: float,
        strike: float,
        num_observation_timepoints: int,
        option_type: OptionType,
        averaging_type: AsianAveragingType = AsianAveragingType.ARITHMETIC,
        asset_id: str | None = None,
    ):
        super().__init__(
            asset_ids=[asset_id],
            product_family=ProductFamily.ASIAN_PATH_TERMINAL,
        )
        self.maturity = float(maturity)
        self.strike = float(strike)
        self.option_type = option_type
        self.averaging_type = averaging_type
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

    def _average(self, spots):
        if self.averaging_type == AsianAveragingType.GEOMETRIC:
            return jnp.exp(jnp.mean(jnp.log(spots + 1e-10), axis=1))
        return jnp.mean(spots, axis=1)

    def payoff(self, spots, model, params):
        sign = 1.0 if self.option_type == OptionType.CALL else -1.0
        return jnp.maximum(sign * (self._average(spots) - self.strike), 0.0)

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
        normalized = self.payoff(monitored, model, params) / numeraire
        return state_matrix, normalized[:, None]
