"""Bond: zero-coupon, fixed-coupon, or floating-rate note.

Counterpart of reference ``src/products/bond.py`` (bond.py:12-214):
``fixed_rate=None`` selects floating coupons; the payment schedule walks
``startdate + k*tenor`` up to maturity; as a composite underlying the value is
the sum of discounted coupons (+ notional), with the floating leg collapsing
to ``notional * (DF_{k-1} - DF_k)`` telescoping (bond.py:115-163).

The FORWARD_RATE atomic requests declared here are resolved by rate models as
*conditional bond prices* P(t_obs, t_pay) (vasicek.py:141-144), which is what
``get_value`` consumes as discount factors.

Deliberate deviation (quirk Q5): per-date fixed-coupon cashflows include the
``notional`` factor, which the reference omits in
``compute_normalized_cashflows_fixed`` (bond.py:180) while including it in
``get_value_fixed`` (bond.py:134).  Reference tests only exercise notional=1
or floating legs, so they remain comparable.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional

import jax.numpy as jnp

from montecarlo_risk_engine_tpu.products.base import Product
from montecarlo_risk_engine_tpu.requests import (
    AtomicRequest,
    AtomicRequestType,
    UnderlyingRequest,
)


class Bond(Product):
    def __init__(
        self,
        startdate: float,
        maturity: float,
        notional: float,
        tenor: float,
        pays_notional: bool = True,
        fixed_rate: Optional[float] = None,
        asset_id: str | None = None,
    ):
        super().__init__(asset_ids=[asset_id])
        self.startdate = float(startdate)
        self.maturity = float(maturity)
        self.notional = float(notional)
        self.tenor = float(tenor)
        self.fixed_rate = None if fixed_rate is None else float(fixed_rate)
        self.pays_notional = bool(pays_notional)
        self.composite_req_handle = None

        asset = self.get_asset_id()
        self.atomic_requests_for_underlying = {}
        payment_dates = []

        # Build the schedule (bond.py:36-73): coupons at start+tenor, ...,
        # then a final payment at maturity.
        date = self.startdate + self.tenor
        idx = 0
        if self.fixed_rate is not None:
            while date < self.maturity - 1e-12:
                self.numeraire_requests[idx] = AtomicRequest(AtomicRequestType.NUMERAIRE, date)
                self.atomic_requests_for_underlying[(idx, asset)] = AtomicRequest(
                    AtomicRequestType.FORWARD_RATE, self.startdate, date
                )
                payment_dates.append(date)
                date += self.tenor
                idx += 1
            self.numeraire_requests[idx] = AtomicRequest(AtomicRequestType.NUMERAIRE, self.maturity)
            self.atomic_requests_for_underlying[(idx, asset)] = AtomicRequest(
                AtomicRequestType.FORWARD_RATE, self.startdate, self.maturity
            )
            payment_dates.append(self.maturity)
        else:
            while date < self.maturity - 1e-12:
                self.libor_requests[(idx, asset)] = AtomicRequest(
                    AtomicRequestType.LIBOR_RATE, date - self.tenor, date
                )
                self.numeraire_requests[idx] = AtomicRequest(AtomicRequestType.NUMERAIRE, date)
                self.atomic_requests_for_underlying[(idx, asset)] = AtomicRequest(
                    AtomicRequestType.FORWARD_RATE, self.startdate, date - self.tenor
                )
                payment_dates.append(date)
                date += self.tenor
                idx += 1
            self.libor_requests[(idx, asset)] = AtomicRequest(
                AtomicRequestType.LIBOR_RATE, date - self.tenor, self.maturity
            )
            self.numeraire_requests[idx] = AtomicRequest(AtomicRequestType.NUMERAIRE, self.maturity)
            self.atomic_requests_for_underlying[(idx, asset)] = AtomicRequest(
                AtomicRequestType.FORWARD_RATE, self.startdate, date - self.tenor
            )
            self.atomic_requests_for_underlying[(idx + 1, asset)] = AtomicRequest(
                AtomicRequestType.FORWARD_RATE, self.startdate, self.maturity
            )
            payment_dates.append(self.maturity)

        self.payment_dates = tuple(payment_dates)
        self.product_timeline = self.payment_dates
        self.modeling_timeline = self.payment_dates
        self.regression_timeline = ()

    def __eq__(self, other):
        return (
            isinstance(other, Bond)
            and self.startdate == other.startdate
            and self.maturity == other.maturity
            and self.tenor == other.tenor
            and self.fixed_rate == other.fixed_rate
            and self.pays_notional == other.pays_notional
            and self.notional == other.notional
            and self.get_asset_id() == other.get_asset_id()
        )

    def __hash__(self):
        return hash(
            ("Bond", self.startdate, self.maturity, self.tenor, self.fixed_rate,
             self.pays_notional, self.notional, self.get_asset_id())
        )

    # -- as composite underlying (bond.py:96-163) -----------------------------

    def get_atomic_requests_for_underlying(self):
        requests = defaultdict(list)
        for label, req in self.atomic_requests_for_underlying.items():
            requests[label].append(req)
        return requests

    def generate_underlying_requests_for_date(self, observation_date):
        return UnderlyingRequest(
            Bond(
                startdate=float(observation_date),
                maturity=self.maturity,
                notional=self.notional,
                tenor=self.tenor,
                pays_notional=self.pays_notional,
                fixed_rate=self.fixed_rate,
                asset_id=self.get_asset_id(),
            )
        )

    def get_value(self, resolved_atomic_requests):
        asset = self.get_asset_id()
        total = 0.0
        if self.fixed_rate is not None:
            prev_time = self.startdate
            for idx in self.numeraire_requests:
                df = resolved_atomic_requests[
                    self.atomic_requests_for_underlying[(idx, asset)].handle
                ]
                dt = self.modeling_timeline[idx] - prev_time
                total = total + self.notional * self.fixed_rate * dt * df
                prev_time = self.modeling_timeline[idx]
        else:
            # Floating leg telescopes: sum notional (DF_{k-1} - DF_k)
            # (bond.py:146-163).
            for idx in self.numeraire_requests:
                df = resolved_atomic_requests[
                    self.atomic_requests_for_underlying[(idx, asset)].handle
                ]
                df_next = resolved_atomic_requests[
                    self.atomic_requests_for_underlying[(idx + 1, asset)].handle
                ]
                total = total + self.notional * (df - df_next)
        if self.pays_notional:
            df = resolved_atomic_requests[
                self.atomic_requests_for_underlying[(len(self.modeling_timeline) - 1, asset)].handle
            ]
            total = total + self.notional * df
        return total

    # -- per-date cashflows (bond.py:165-214) -----------------------------------

    def compute_normalized_cashflows(
        self, time_idx, model, params, resolved_requests,
        regression_function=None, state_matrix=None,
    ):
        numeraire = resolved_requests[0][self.numeraire_requests[time_idx].handle]
        prev_time = self.startdate if time_idx == 0 else self.payment_dates[time_idx - 1]
        dt = self.payment_dates[time_idx] - prev_time

        if self.fixed_rate is not None:
            cashflow = self.notional * self.fixed_rate * dt
            cashflow = jnp.asarray(cashflow)
        else:
            libor = self.get_resolved_atomic_request(
                resolved_requests[0], AtomicRequestType.LIBOR_RATE, time_idx, self.get_asset_id()
            )
            cashflow = self.notional * libor * dt

        if self.pays_notional and time_idx == len(self.modeling_timeline) - 1:
            cashflow = cashflow + self.notional

        # May be 0-d (deterministic numeraire/coupon) or [N]; callers broadcast.
        normalized = jnp.atleast_1d(cashflow / numeraire)
        return state_matrix, normalized[:, None]
