"""FlexiCall: a basket of European options with k <= n exercise rights.

Counterpart of reference ``src/products/flexicall.py`` (flexicall.py:4-186):
states = remaining rights + 1; the per-date exercise rule compares
``immediate + continuation(state - 1) > continuation(state)``
(flexicall.py:135-138) — unlike the Bermudan one-right rule, exercising keeps
the game alive in the decremented state.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.config import real_dtype
from montecarlo_risk_engine_tpu.products.base import OptionType, Product, ProductFamily
from montecarlo_risk_engine_tpu.products.european_option import EuropeanOption
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class FlexiCall(Product):
    def __init__(
        self,
        underlyings: List[EuropeanOption],
        num_exercise_rights: int,
        asset_id: str | None = None,
        itm_only_regression: bool = False,
    ):
        super().__init__(
            asset_ids=[asset_id],
            product_family=ProductFamily.FLEXICALL_EXERCISE,
        )
        assert num_exercise_rights <= len(underlyings), (
            "Number of exercise rights cannot exceed number of underlyings"
        )
        assert all(
            opt.option_type == underlyings[0].option_type for opt in underlyings
        ), "All underlyings must have the same option type"

        self.underlyings = sorted(underlyings, key=lambda opt: opt.exercise_date)
        assert all(
            self.underlyings[i].exercise_date < self.underlyings[i + 1].exercise_date
            for i in range(len(self.underlyings) - 1)
        ), "Exercise dates must be distinct"

        self.num_exercise_rights = int(num_exercise_rights)
        self.itm_only_regression = bool(itm_only_regression)
        self.product_timeline = tuple(opt.exercise_date for opt in self.underlyings)
        self.modeling_timeline = self.product_timeline
        self.regression_timeline = self.product_timeline

        asset = self.get_asset_id()
        self.numeraire_requests = {
            idx: AtomicRequest(AtomicRequestType.NUMERAIRE, t)
            for idx, t in enumerate(self.modeling_timeline)
        }
        self.spot_requests = {
            (idx, asset): AtomicRequest(AtomicRequestType.SPOT)
            for idx in range(len(self.modeling_timeline))
        }
        self.underlying_requests = {
            idx: opt.underlying_requests[0] for idx, opt in enumerate(self.underlyings)
        }

    def get_num_states(self):
        return self.num_exercise_rights + 1

    def get_initial_state(self):
        return self.num_exercise_rights

    def compute_normalized_cashflows(
        self, time_idx, model, params, resolved_requests,
        regression_function=None, state_matrix=None,
    ):
        if regression_function is None or state_matrix is None:
            raise ValueError("Discrete exercise evaluation requires a regression function and state matrix.")

        asset = self.get_asset_id()
        underlying_value = resolved_requests[1][self.underlying_requests[time_idx].get_handle()]
        explanatory = resolved_requests[0][self.spot_requests[(time_idx, asset)].handle]
        numeraire = resolved_requests[0][self.numeraire_requests[time_idx].handle]

        sign = 1.0 if self.underlyings[0].option_type == OptionType.CALL else -1.0
        strike = self.underlyings[time_idx].strike
        immediate = jnp.maximum(sign * (underlying_value - strike), 0.0)[:, None]
        immediate = jnp.broadcast_to(immediate, state_matrix.shape)

        state_after = jnp.where(state_matrix > 0, state_matrix - 1, state_matrix)
        last_date = time_idx == len(self.product_timeline) - 1
        if last_date or self.regression_coeffs is None:
            continuation_hold = jnp.zeros_like(immediate)
            continuation_exercised = jnp.zeros_like(immediate)
        else:
            coeffs = self.regression_coeffs[time_idx]
            continuation_hold = self.compute_continuation_values(
                explanatory=explanatory,
                regression_function=regression_function,
                state_matrix=state_matrix,
                coeffs_all_states=coeffs,
            )
            continuation_exercised = self.compute_continuation_values(
                explanatory=explanatory,
                regression_function=regression_function,
                state_matrix=state_after,
                coeffs_all_states=coeffs,
            )

        should_exercise = (
            (immediate + continuation_exercised > continuation_hold) & (state_matrix > 0)
        )
        numeraire_col = numeraire[:, None] if jnp.ndim(numeraire) == 1 else numeraire
        cashflows = immediate * should_exercise.astype(real_dtype()) / numeraire_col
        next_state = jnp.where(should_exercise, state_after, state_matrix)
        return next_state, cashflows

    # -- scan fast path ---------------------------------------------------------

    def scan_event_strikes(self):
        return [opt.strike for opt in self.underlyings]

    def scan_regression_weights(self, underlying_value, strike):
        if not self.itm_only_regression:
            return None
        sign = 1.0 if self.underlyings[0].option_type == OptionType.CALL else -1.0
        return (sign * (underlying_value - strike) > 0.0).astype(real_dtype())

    def scan_bucket_statics(self):
        return (self.underlyings[0].option_type, self.itm_only_regression)

    def scan_exercise_step(
        self, regression_function, state_matrix, underlying_value,
        explanatory, numeraire, strike, coeffs,
    ):
        sign = 1.0 if self.underlyings[0].option_type == OptionType.CALL else -1.0
        immediate = jnp.maximum(sign * (underlying_value - strike), 0.0)[:, None]
        immediate = jnp.broadcast_to(immediate, state_matrix.shape)
        state_after = jnp.where(state_matrix > 0, state_matrix - 1, state_matrix)
        continuation_hold = self.compute_continuation_values(
            explanatory=explanatory, regression_function=regression_function,
            state_matrix=state_matrix, coeffs_all_states=coeffs,
        )
        continuation_exercised = self.compute_continuation_values(
            explanatory=explanatory, regression_function=regression_function,
            state_matrix=state_after, coeffs_all_states=coeffs,
        )
        should_exercise = (
            (immediate + continuation_exercised > continuation_hold) & (state_matrix > 0)
        )
        cashflows = immediate * should_exercise.astype(real_dtype()) / numeraire[:, None]
        next_state = jnp.where(should_exercise, state_after, state_matrix)
        return next_state, cashflows
