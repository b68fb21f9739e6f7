"""Bermudan / American option via Longstaff–Schwartz.

Counterpart of reference ``src/products/bermudan_option.py``
(bermudan_option.py:6-193): a two-state exercise machine (one exercise right),
per-date decision ``immediate > continuation AND rights > 0`` with a state
decrement on exercise.

Differentiation contract (SURVEY.md §7.3 item 3): the exercise decision stays
a *hard* comparison — gradients flow through the payoff along the chosen
branch, never through the policy (bermudan_option.py:121).

Shapes: the per-date step works on [N, S] matrices where column s is the
hypothetical "current state = s" scenario; the pre-simulation seeds all states
(controller regression) while the main simulation uses a single realized
column (controller.py:388-393).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.config import real_dtype
from montecarlo_risk_engine_tpu.products.base import OptionType, Product, ProductFamily
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class BermudanOption(Product):
    def __init__(
        self,
        underlying: Product,
        exercise_dates: Sequence[float],
        strike: float,
        option_type: OptionType,
        asset_id: str | None = None,
        itm_only_regression: bool = False,
    ):
        super().__init__(
            asset_ids=[asset_id],
            product_family=ProductFamily.BERMUDAN_EXERCISE,
        )
        self.strike = float(strike)
        self.option_type = option_type
        self.num_exercise_rights = 1
        # Beyond-parity option: weight the LSM fit by the in-the-money mask
        # (standard Longstaff–Schwartz).  The reference regresses on ALL paths
        # (controller.py:316-383), which noticeably underprices early-exercise
        # products; default False reproduces reference behaviour.
        self.itm_only_regression = bool(itm_only_regression)
        self.product_timeline = tuple(float(t) for t in exercise_dates)
        self.modeling_timeline = self.product_timeline
        self.regression_timeline = self.product_timeline

        self.numeraire_requests = {
            idx: AtomicRequest(AtomicRequestType.NUMERAIRE, t)
            for idx, t in enumerate(self.modeling_timeline)
        }
        asset = self.asset_ids[0]
        self.spot_requests = {
            (idx, asset): AtomicRequest(AtomicRequestType.SPOT)
            for idx in range(len(self.modeling_timeline))
        }
        self.underlying_requests = {
            idx: underlying.generate_underlying_requests_for_date(t)
            for idx, t in enumerate(self.product_timeline)
        }

    def get_num_states(self):
        return 2

    def get_initial_state(self):
        return 1

    def _immediate_reward(self, values):
        sign = 1.0 if self.option_type == OptionType.CALL else -1.0
        return jnp.maximum(sign * (values - self.strike), 0.0)

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

        immediate = self._immediate_reward(underlying_value)[:, None]  # [N, 1] -> bcast [N, S]
        immediate = jnp.broadcast_to(immediate, state_matrix.shape)

        last_date = time_idx == len(self.product_timeline) - 1
        if last_date or self.regression_coeffs is None:
            continuation = jnp.zeros_like(immediate)
        else:
            continuation = self.compute_continuation_values(
                explanatory=explanatory,
                regression_function=regression_function,
                state_matrix=state_matrix,
                coeffs_all_states=self.regression_coeffs[time_idx],
            )

        should_exercise = (immediate > continuation) & (state_matrix > 0)
        if self.itm_only_regression:
            # standard LSM: exercise is only considered in the money — without
            # this gate, negative extrapolated continuations on OTM paths burn
            # the right for a zero payoff
            should_exercise = should_exercise & (immediate > 0.0)
        state_after = jnp.where(state_matrix > 0, state_matrix - 1, state_matrix)
        numeraire_col = numeraire[:, None] if jnp.ndim(numeraire) == 1 else numeraire
        cashflows = immediate * should_exercise.astype(real_dtype()) / numeraire_col
        next_state = jnp.where(should_exercise, state_after, state_matrix)
        return next_state, cashflows

    # -- scan fast path (controller lax.scan over exercise events) -------------

    def scan_event_strikes(self):
        """Per-product-date scalar fed to scan_exercise_step (constant here)."""
        return [self.strike] * len(self.product_timeline)

    def scan_regression_weights(self, underlying_value, strike):
        """Per-path LSM fit weights, or None for the reference's all-path fit."""
        if not self.itm_only_regression:
            return None
        sign = 1.0 if self.option_type == OptionType.CALL else -1.0
        return (sign * (underlying_value - strike) > 0.0).astype(real_dtype())

    def scan_bucket_statics(self):
        return (self.option_type, self.itm_only_regression)

    def scan_exercise_step(
        self, regression_function, state_matrix, underlying_value,
        explanatory, numeraire, strike, coeffs,
    ):
        """One exercise decision with explicit (traced) per-event inputs.

        Identical semantics to compute_normalized_cashflows, but every date-
        dependent quantity is an argument so the controller can run all dates
        through one lax.scan body.  Continuation-at-the-last-date is zero
        automatically: the backward pass fits those coeffs on zero targets.
        """
        sign = 1.0 if self.option_type == OptionType.CALL else -1.0
        immediate = jnp.maximum(sign * (underlying_value - strike), 0.0)[:, None]
        immediate = jnp.broadcast_to(immediate, state_matrix.shape)
        continuation = self.compute_continuation_values(
            explanatory=explanatory,
            regression_function=regression_function,
            state_matrix=state_matrix,
            coeffs_all_states=coeffs,
        )
        should_exercise = (immediate > continuation) & (state_matrix > 0)
        if self.itm_only_regression:
            should_exercise = should_exercise & (immediate > 0.0)
        state_after = jnp.where(state_matrix > 0, state_matrix - 1, state_matrix)
        cashflows = immediate * should_exercise.astype(real_dtype()) / numeraire[:, None]
        next_state = jnp.where(should_exercise, state_after, state_matrix)
        return next_state, cashflows


class AmericanOption(BermudanOption):
    """American option approximated on a uniform exercise grid
    (bermudan_option.py:176-193)."""

    def __init__(
        self,
        underlying: Product,
        maturity: float,
        num_exercise_dates: int,
        strike: float,
        option_type: OptionType,
        asset_id: str | None = None,
    ):
        exercise_dates = (
            np.linspace(0.0, maturity, num_exercise_dates)
            if num_exercise_dates > 1
            else [maturity]
        )
        super().__init__(
            underlying=underlying,
            exercise_dates=exercise_dates,
            strike=strike,
            option_type=option_type,
            asset_id=asset_id,
        )
