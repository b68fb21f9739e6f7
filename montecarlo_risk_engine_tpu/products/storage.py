"""Gas storage: daily-rollout dynamic program with continuous inventory state.

Counterpart of reference ``src/products/storage.py`` (storage.py:16-308):
inventory lives on a [0, num_states-1] grid in *grid coordinates* (state is a
float; continuation lookups interpolate linearly between integer states,
storage.py:205-217).  Three actions per date — inject / withdraw / hold — with
volume-dependent ramp rates, time-varying volume windows (tightened by the
host-side constraint optimizer at construction) and dated variable costs.
The greedy argmax over action values (payoff + interpolated continuation)
stays hard; gradients flow through the chosen branch's payoff
(storage.py:298, SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.config import asarray, real_dtype
from montecarlo_risk_engine_tpu.products.base import Product, ProductFamily
from montecarlo_risk_engine_tpu.products.storage_config import DATE_TOL, StorageConfig
from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType


class StorageAction(enum.Enum):
    INJECTION = 0
    WITHDRAWAL = 1
    DO_NOTHING = 2


class Storage(Product):
    def __init__(
        self,
        asset_id: str,
        start_date: float,
        end_date: float,
        initial_amount: float,
        storage_config: StorageConfig,
        num_states: int,
        rollout_interval: float = 1.0,
    ):
        super().__init__(
            asset_ids=[asset_id],
            product_family=ProductFamily.STORAGE_EXERCISE,
        )
        if num_states < 2:
            raise ValueError("Storage requires at least two discrete states.")
        if rollout_interval <= 0.0:
            raise ValueError("Rollout interval must be positive.")

        self.start_date = float(start_date)
        self.end_date = float(end_date)
        self.initial_amount = float(initial_amount)
        self.storage_config = storage_config
        self.num_states = int(num_states)
        self.rollout_interval = float(rollout_interval)

        self.storage_config.optimize_volume_constraints(
            start_date=self.start_date,
            end_date=self.end_date,
            rollout_interval=self.rollout_interval,
            initial_volume=self.initial_amount,
        )

        action_dates, next_dates = [], []
        date = self.start_date
        while date < self.end_date - DATE_TOL:
            next_date = min(date + self.rollout_interval, self.end_date)
            action_dates.append(date)
            next_dates.append(next_date)
            date = next_date

        self.product_timeline = tuple(action_dates)
        self.modeling_timeline = self.product_timeline
        self.regression_timeline = self.product_timeline
        self.next_action_dates = tuple(next_dates)

        self.numeraire_requests = {
            idx: AtomicRequest(AtomicRequestType.NUMERAIRE, t)
            for idx, t in enumerate(action_dates)
        }
        self.spot_requests = {
            (idx, asset_id): AtomicRequest(AtomicRequestType.SPOT)
            for idx in range(len(action_dates))
        }

    def get_num_states(self):
        return self.num_states

    def get_initial_state(self):
        return 0.0

    def state_is_continuous(self):
        return True

    # -- grid/volume mapping (storage.py:81-112) --------------------------------

    def _volume_from_state(self, state, vmin: float, vmax: float):
        step = self.storage_config.grid_step(vmin, vmax, self.num_states)
        return vmin + state.astype(real_dtype()) * step

    def _state_from_volume(self, volume, vmin: float, vmax: float):
        scale = self.storage_config.state_scale(vmin, vmax, self.num_states)
        if scale == 0.0:
            return jnp.zeros_like(volume)
        return (volume - vmin) * scale

    def _transition(self, date: float, next_date: float, action: StorageAction, state):
        """Returns (previous_volume, next_volume) for the action
        (storage.py:113-155)."""
        cfg = self.storage_config
        prev_window = cfg.get_volume_constraint(date)
        next_window = cfg.get_volume_constraint(next_date)
        prev_volume = self._volume_from_state(state, prev_window.vmin, prev_window.vmax)
        period = max(next_date - date, 0.0)

        if action == StorageAction.INJECTION:
            pts, rates = cfg.rate_curve_arrays(cfg.get_injection_flexibility_slice(date))
            daily_rate = jnp.interp(prev_volume, asarray(pts), asarray(rates))
            next_volume = jnp.minimum(prev_volume + daily_rate * period, next_window.vmax)
        elif action == StorageAction.WITHDRAWAL:
            pts, rates = cfg.rate_curve_arrays(cfg.get_withdrawal_flexibility_slice(date))
            daily_rate = jnp.interp(prev_volume, asarray(pts), asarray(rates))
            next_volume = jnp.maximum(prev_volume - daily_rate * period, next_window.vmin)
        else:
            next_volume = jnp.clip(prev_volume, next_window.vmin, next_window.vmax)
        return prev_volume, next_volume

    def state_to_volume(self, date: float, state):
        window = self.storage_config.get_volume_constraint(float(date))
        return self._volume_from_state(jnp.asarray(state), window.vmin, window.vmax)

    def compute_next_state(self, date: float, next_date: float, action_type: StorageAction):
        """Mapping factory: previous grid state -> next grid state
        (reference storage.py:157-177 API)."""
        next_window = self.storage_config.get_volume_constraint(next_date)

        def mapping(previous_state):
            _, next_volume = self._transition(date, next_date, action_type, jnp.asarray(previous_state))
            return self._state_from_volume(next_volume, next_window.vmin, next_window.vmax)

        return mapping

    def compute_volume_difference(self, date: float, next_date: float, action_type: StorageAction):
        """Mapping factory: previous grid state -> physical volume change
        (reference storage.py:179-192 API)."""

        def mapping(previous_state):
            prev_volume, next_volume = self._transition(
                date, next_date, action_type, jnp.asarray(previous_state)
            )
            return next_volume - prev_volume

        return mapping

    # -- interpolating state lookup (storage.py:205-217) ---------------------------

    def lookup_state_values(self, values_by_state, state_matrix):
        bounded = jnp.clip(state_matrix.astype(real_dtype()), 0.0, self.num_states - 1.0)
        lower = jnp.floor(bounded).astype(int)
        upper = jnp.ceil(bounded).astype(int)
        weight = bounded - lower.astype(real_dtype())
        lower_vals = jnp.take_along_axis(values_by_state, lower, axis=1)
        upper_vals = jnp.take_along_axis(values_by_state, upper, axis=1)
        return lower_vals + weight * (upper_vals - lower_vals)

    # -- scan fast path ---------------------------------------------------------
    #
    # All per-date static configuration is exported as stacked arrays so the
    # controller can run the whole DP through one lax.scan (same machinery as
    # Bermudan/FlexiCall; per-date rows arrive as traced "extras").

    def scan_event_strikes(self):
        return [0.0] * len(self.product_timeline)

    def scan_bucket_statics(self):
        # All per-date configuration rides in scan_event_extras; nothing else
        # is baked into the traced step.
        return ()

    def _padded_curves(self, slices):
        max_pts = max(len(s) for s in slices)
        pts = np.full((len(slices), max_pts), 0.0)
        rates = np.full((len(slices), max_pts), 0.0)
        for i, s in enumerate(slices):
            p = [rp.point for rp in s]
            r = [rp.rate for rp in s]
            # pad by repeating the last point (flat extrapolation unchanged)
            while len(p) < max_pts:
                p.append(p[-1] + 1.0 + len(p))
                r.append(r[-1])
            pts[i] = p
            rates[i] = r
        return asarray(pts), asarray(rates)

    def scan_event_extras(self):
        cfg = self.storage_config
        dates = self.product_timeline
        next_dates = self.next_action_dates
        prev_win = [cfg.get_volume_constraint(d) for d in dates]
        next_win = [cfg.get_volume_constraint(d) for d in next_dates]
        inj_pts, inj_rates = self._padded_curves(
            [cfg.get_injection_flexibility_slice(d) for d in dates]
        )
        wd_pts, wd_rates = self._padded_curves(
            [cfg.get_withdrawal_flexibility_slice(d) for d in dates]
        )
        return {
            "prev_vmin": asarray([w.vmin for w in prev_win]),
            "prev_vmax": asarray([w.vmax for w in prev_win]),
            "next_vmin": asarray([w.vmin for w in next_win]),
            "next_vmax": asarray([w.vmax for w in next_win]),
            "inj_pts": inj_pts,
            "inj_rates": inj_rates,
            "wd_pts": wd_pts,
            "wd_rates": wd_rates,
            "inj_cost": asarray([cfg.get_variable_injection_cost(d) for d in dates]),
            "wd_cost": asarray([cfg.get_variable_withdrawal_cost(d) for d in dates]),
            "period": asarray([max(n - d, 0.0) for d, n in zip(dates, next_dates)]),
            "is_last": asarray([
                1.0 if n >= self.end_date - DATE_TOL else 0.0 for n in next_dates
            ]),
        }

    def scan_exercise_step(
        self, regression_function, state_matrix, underlying_value,
        explanatory, numeraire, strike, coeffs, extras,
    ):
        spot_col = jnp.broadcast_to(explanatory[:, None], state_matrix.shape)
        s_minus_1 = self.num_states - 1.0

        prev_span = extras["prev_vmax"] - extras["prev_vmin"]
        prev_vol = extras["prev_vmin"] + state_matrix.astype(real_dtype()) * prev_span / s_minus_1
        next_span = jnp.maximum(extras["next_vmax"] - extras["next_vmin"], 1e-30)

        inj_rate = jnp.interp(prev_vol, extras["inj_pts"], extras["inj_rates"])
        wd_rate = jnp.interp(prev_vol, extras["wd_pts"], extras["wd_rates"])

        inj_vol = jnp.minimum(prev_vol + inj_rate * extras["period"], extras["next_vmax"])
        wd_vol = jnp.maximum(prev_vol - wd_rate * extras["period"], extras["next_vmin"])
        hold_vol = jnp.clip(prev_vol, extras["next_vmin"], extras["next_vmax"])

        vols = (inj_vol, hold_vol, wd_vol)
        states = [
            (v - extras["next_vmin"]) * s_minus_1 / next_span for v in vols
        ]
        deltas = [v - prev_vol for v in vols]
        hold_price = jnp.where(
            deltas[1] >= 0.0, spot_col + extras["inj_cost"], spot_col - extras["wd_cost"]
        )
        payoffs = [
            -deltas[0] * (spot_col + extras["inj_cost"]),
            -deltas[1] * hold_price,
            -deltas[2] * (spot_col - extras["wd_cost"]),
        ]

        grid = self.evaluate_regression_grid(explanatory, regression_function, coeffs)
        continuations = [
            (1.0 - extras["is_last"]) * self.lookup_state_values(grid, s) for s in states
        ]

        action_values = jnp.stack([p + c for p, c in zip(payoffs, continuations)], axis=2)
        best = jnp.argmax(action_values, axis=2, keepdims=True)
        next_state = jnp.take_along_axis(jnp.stack(states, axis=2), best, axis=2)[:, :, 0]
        cashflows = jnp.take_along_axis(jnp.stack(payoffs, axis=2), best, axis=2)[:, :, 0]
        return next_state, cashflows / numeraire[:, None]

    # -- per-date DP step (storage.py:219-308) ---------------------------------------

    def compute_normalized_cashflows(
        self, time_idx, model, params, resolved_requests,
        regression_function=None, state_matrix=None,
    ):
        date = self.product_timeline[time_idx]
        next_date = self.next_action_dates[time_idx]
        next_window = self.storage_config.get_volume_constraint(next_date)

        spot = self.get_resolved_atomic_request(
            resolved_requests[0], AtomicRequestType.SPOT, time_idx, self.get_asset_id()
        )
        spot_col = jnp.broadcast_to(spot[:, None], state_matrix.shape)

        inj_cost = self.storage_config.get_variable_injection_cost(date)
        wd_cost = self.storage_config.get_variable_withdrawal_cost(date)

        states, deltas, payoffs = [], [], []
        for action in (StorageAction.INJECTION, StorageAction.DO_NOTHING, StorageAction.WITHDRAWAL):
            prev_vol, next_vol = self._transition(date, next_date, action, state_matrix)
            delta = next_vol - prev_vol
            next_state = self._state_from_volume(next_vol, next_window.vmin, next_window.vmax)
            if action == StorageAction.INJECTION:
                payoff = -delta * (spot_col + inj_cost)
            elif action == StorageAction.WITHDRAWAL:
                payoff = -delta * (spot_col - wd_cost)
            else:
                unit_price = jnp.where(delta >= 0.0, spot_col + inj_cost, spot_col - wd_cost)
                payoff = -delta * unit_price
            states.append(next_state)
            deltas.append(delta)
            payoffs.append(payoff)

        if next_date >= self.end_date - DATE_TOL or self.regression_coeffs is None:
            continuations = [jnp.zeros_like(p) for p in payoffs]
        else:
            explanatory = spot
            grid = self.evaluate_regression_grid(
                explanatory, regression_function, self.regression_coeffs[time_idx]
            )
            continuations = [self.lookup_state_values(grid, s) for s in states]

        action_values = jnp.stack([p + c for p, c in zip(payoffs, continuations)], axis=2)
        next_states = jnp.stack(states, axis=2)
        payoff_stack = jnp.stack(payoffs, axis=2)

        best = jnp.argmax(action_values, axis=2, keepdims=True)
        next_state_matrix = jnp.take_along_axis(next_states, best, axis=2)[:, :, 0]
        cashflows = jnp.take_along_axis(payoff_stack, best, axis=2)[:, :, 0]

        numeraire = self.get_resolved_atomic_request(
            resolved_requests[0], AtomicRequestType.NUMERAIRE, time_idx
        )
        numeraire_col = numeraire[:, None] if jnp.ndim(numeraire) == 1 else numeraire
        return next_state_matrix, cashflows / numeraire_col
