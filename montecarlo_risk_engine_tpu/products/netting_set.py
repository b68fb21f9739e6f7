"""Netting set: netted valuation with thresholds and MPoR collateral.

Counterpart of reference ``src/products/netting_set.py`` (netting_set.py:12-184).

Semantics preserved:
  * symmetric threshold band mapping |e| <= threshold to zero
    (netting_set.py:48-72);
  * collateral balance = threshold-adjusted netted exposure observed at
    ``t - MPoR`` (netting_set.py:110-154); with precomputed delayed indices
    the lookup is a static gather, otherwise interpolation on the exposure
    grid ('linear' or 'previous', netting_set.py:74-108);
  * unsecured exposure = netted exposure - collateral (netting_set.py:156-184).

All profile operations take [T, N] arrays (time-major, paths sharded) and are
pure jnp.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu.config import asarray
from montecarlo_risk_engine_tpu.products.base import Product


@dataclass
class NettingSet:
    name: str
    products: Sequence[Product]
    threshold: float = 0.0
    margin_period_of_risk: Optional[float] = None
    counterparty_id: Optional[str] = None
    collateral_interpolation: str = "linear"

    def __post_init__(self):
        self.products = list(self.products)
        if len(self.products) == 0:
            raise ValueError("A netting set must contain at least one product.")
        if self.threshold < 0.0:
            raise ValueError("Netting set threshold must be non-negative.")
        if self.margin_period_of_risk is not None and self.margin_period_of_risk < 0.0:
            raise ValueError("Netting set margin period of risk must be non-negative.")
        if self.collateral_interpolation not in {"linear", "previous"}:
            raise ValueError("Collateral interpolation must be one of {'linear', 'previous'}.")

    def get_name(self) -> str:
        return self.name

    def is_collateralized(self) -> bool:
        return self.margin_period_of_risk is not None

    def get_collateral_query_times(self, exposure_timeline) -> list:
        if not self.is_collateralized():
            return []
        return [t - self.margin_period_of_risk for t in exposure_timeline
                if t - self.margin_period_of_risk >= 0.0]

    def apply_threshold(self, exposures):
        if self.threshold == 0.0:
            return exposures
        thr = self.threshold
        return jnp.where(
            exposures > thr,
            exposures - thr,
            jnp.where(exposures < -thr, exposures + thr, jnp.zeros_like(exposures)),
        )

    def _interpolate_profiles(self, netted_exposures, exposure_timeline, query_times):
        """Interpolate [T, N] profiles at query times (netting_set.py:74-108)."""
        timeline = np.asarray(exposure_timeline, dtype=float)
        query = np.asarray(query_times, dtype=float)
        num_dates = len(timeline)
        before_start = asarray(query < timeline[0])[:, None]

        if self.collateral_interpolation == "previous":
            prev_idx = np.clip(np.searchsorted(timeline, query, side="right") - 1, 0, num_dates - 1)
            interpolated = netted_exposures[prev_idx]
            return jnp.where(before_start, 0.0, interpolated)

        right = np.clip(np.searchsorted(timeline, query), None, num_dates - 1)
        left = np.clip(right - 1, 0, None)
        denom = timeline[right] - timeline[left]
        weights = np.where(denom > 0.0, (query - timeline[left]) / np.where(denom == 0, 1.0, denom), 0.0)
        interpolated = (
            netted_exposures[left]
            + asarray(weights)[:, None] * (netted_exposures[right] - netted_exposures[left])
        )
        return jnp.where(before_start, 0.0, interpolated)

    def compute_collateral_profile(
        self,
        netted_exposures,
        exposure_timeline,
        metric_exposure_indices=None,
        delayed_exposure_indices=None,
    ):
        if not self.is_collateralized():
            if metric_exposure_indices is not None:
                return jnp.zeros(
                    (len(metric_exposure_indices), netted_exposures.shape[1]),
                    dtype=netted_exposures.dtype,
                )
            return jnp.zeros_like(netted_exposures)

        if metric_exposure_indices is not None and delayed_exposure_indices is not None:
            # Static gather path: delayed index -1 means "before the first
            # exposure date" -> zero collateral (controller.py:164-187).
            delayed = np.asarray(delayed_exposure_indices)
            valid = asarray(delayed >= 0)[:, None]
            gathered = netted_exposures[np.clip(delayed, 0, None)]
            return jnp.where(valid, self.apply_threshold(gathered), 0.0)

        query_times = [t - self.margin_period_of_risk for t in exposure_timeline]
        delayed = self._interpolate_profiles(netted_exposures, exposure_timeline, query_times)
        return self.apply_threshold(delayed)

    def compute_unsecured_exposure_profiles(
        self,
        netted_exposures,
        exposure_timeline,
        metric_exposure_indices=None,
        delayed_exposure_indices=None,
    ):
        if metric_exposure_indices is not None:
            metric_exposures = netted_exposures[np.asarray(metric_exposure_indices)]
        else:
            metric_exposures = netted_exposures

        if not self.is_collateralized():
            return self.apply_threshold(metric_exposures)

        collateral = self.compute_collateral_profile(
            netted_exposures=netted_exposures,
            exposure_timeline=exposure_timeline,
            metric_exposure_indices=metric_exposure_indices,
            delayed_exposure_indices=delayed_exposure_indices,
        )
        return metric_exposures - collateral
