"""Storage + Schwartz-2F golden-scenario suite vs an independent DP oracle.

Counterpart of the reference's scenario matrix
(tests/storage_s2f_cases.py:16-60 -> tests/pytests/test_storage_s2f_pv.py:34-52),
which asserts multi-scenario Storage PVs to 1e-6.  The reference's goldens are
pinned to its own torch RNG, so they do not transfer; here each deterministic
scenario is asserted against an INDEPENDENT plain-numpy oracle that
reimplements the semantics from scratch (backward grid-DP with interpolated
continuations + forward policy rollout) — no jax, no shared compute code with
the engine's lax.scan DP.  A stochastic scenario is pinned as a self-golden.

Covered: dated volume windows (seasonal min/max), injection/withdrawal ramp
curves (volume-dependent rates), variable costs, the constraint-propagation
optimizer (windows are queried AFTER tightening), forced trajectories via
window clamping, and non-zero discounting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    NettingSet,
    PVMetric,
    RiskMetrics,
    SchwartzTwoFactorModel,
    SimulationController,
    SimulationScheme,
)
from montecarlo_risk_engine_tpu.products.storage import Storage
from montecarlo_risk_engine_tpu.products.storage_config import DATE_TOL, StorageConfig
from montecarlo_risk_engine_tpu.utils.regression import PolynomialRegression


@dataclass(frozen=True)
class StorageScenario:
    """Date-based scenario in days (reference storage_s2f_cases.py:16-32)."""

    name: str
    end_date: float
    initial_amount: float
    # (start, end, vmin, vmax)
    volume_constraints: Tuple[Tuple[float, float, float, float], ...]
    # (start, end, volume point, daily rate)
    injection_rates: Tuple[Tuple[float, float, float, float], ...]
    withdrawal_rates: Tuple[Tuple[float, float, float, float], ...]
    injection_cost: float
    withdrawal_cost: float
    num_states: int
    curve: Tuple[Tuple[float, float], ...]  # (day, price)
    rate_daily: float = 0.0


def build_storage(sc: StorageScenario) -> Storage:
    cfg = StorageConfig()
    for start, end, vmin, vmax in sc.volume_constraints:
        cfg.add_volume_constraint(start, end, vmin, vmax, 0.0)
    for start, end, point, rate in sc.injection_rates:
        cfg.add_injection_flexibility(start, end, point, rate)
    for start, end, point, rate in sc.withdrawal_rates:
        cfg.add_withdrawal_flexibility(start, end, point, rate)
    cfg.add_variable_injection_cost(0.0, sc.injection_cost)
    cfg.add_variable_withdrawal_cost(0.0, sc.withdrawal_cost)
    return Storage(
        asset_id="gas", start_date=0.0, end_date=sc.end_date,
        initial_amount=sc.initial_amount, storage_config=cfg,
        num_states=sc.num_states,
    )


def build_model(sc: StorageScenario, stochastic: bool = False) -> SchwartzTwoFactorModel:
    # Deterministic variant: vols exactly zero so the spot IS the forward
    # curve and the DP oracle is exact (the reference uses ~1e-5 vols for the
    # same purpose, storage_s2f_cases.py:40-43).
    return SchwartzTwoFactorModel(
        calibration_date=0.0,
        curve_times=[t for t, _ in sc.curve],
        curve_values=[v for _, v in sc.curve],
        rate=sc.rate_daily,
        short_term_mean_reversion=1.5 / 365.0,
        short_term_vol=0.18 / np.sqrt(365.0) if stochastic else 0.0,
        long_term_drift=0.0,
        long_term_vol=0.08 / np.sqrt(365.0) if stochastic else 0.0,
        rho=0.2,
        asset_id="gas",
    )


# -- independent numpy oracle -------------------------------------------------


def _event_kernel(storage: Storage, idx: int, spot_fn):
    cfg = storage.storage_config
    t, tn = storage.product_timeline[idx], storage.next_action_dates[idx]
    pw, nw = cfg.get_volume_constraint(t), cfg.get_volume_constraint(tn)
    period = max(tn - t, 0.0)
    S = storage.num_states
    span_p = pw.vmax - pw.vmin
    span_n = max(nw.vmax - nw.vmin, 1e-30)
    spot = spot_fn(t)
    cinj = cfg.get_variable_injection_cost(t)
    cwd = cfg.get_variable_withdrawal_cost(t)
    is_last = tn >= storage.end_date - DATE_TOL

    def actions(states):
        states = np.asarray(states, dtype=float)
        prev_vol = pw.vmin + states * span_p / (S - 1)
        flat = np.atleast_1d(prev_vol)
        inj_rate = np.array(
            [cfg.get_injection_flexibility_rate(t, v) for v in flat]
        ).reshape(prev_vol.shape)
        wd_rate = np.array(
            [cfg.get_withdrawal_flexibility_rate(t, v) for v in flat]
        ).reshape(prev_vol.shape)
        inj_vol = np.minimum(prev_vol + inj_rate * period, nw.vmax)
        wd_vol = np.maximum(prev_vol - wd_rate * period, nw.vmin)
        hold_vol = np.clip(prev_vol, nw.vmin, nw.vmax)
        vols = np.stack([inj_vol, hold_vol, wd_vol])  # engine's action order
        deltas = vols - prev_vol
        hold_price = np.where(deltas[1] >= 0.0, spot + cinj, spot - cwd)
        payoffs = np.stack([
            -deltas[0] * (spot + cinj),
            -deltas[1] * hold_price,
            -deltas[2] * (spot - cwd),
        ])
        coords = np.clip((vols - nw.vmin) * (S - 1) / span_n, 0.0, S - 1.0)
        return payoffs, coords

    return actions, is_last, t, tn


def oracle_pv(storage: Storage, spot_fn, rate: float) -> float:
    """Backward grid-DP + forward policy rollout.

    Mirrors the engine's semantics — continuation values live on the integer
    inventory grid and are linearly interpolated at candidate next states
    (reference storage.py:205-217, 219-308) — but shares no code with the
    jax scan executor.  For deterministic prices the LSM regression fit is
    exact, so the MC PV must equal this rollout to float precision.
    """
    S = storage.num_states
    grid = np.arange(S, dtype=float)
    n_ev = len(storage.product_timeline)
    events = [_event_kernel(storage, i, spot_fn) for i in range(n_ev)]

    v_grids = [None] * n_ev
    v_next = np.zeros(S)
    for i in reversed(range(n_ev)):
        actions, is_last, t, tn = events[i]
        payoffs, coords = actions(grid)
        if is_last:
            cont = np.zeros_like(payoffs)
        else:
            cont = np.stack([np.interp(c, grid, v_next) for c in coords])
        disc = np.exp(-rate * (tn - t))
        vals = payoffs + disc * cont
        best = np.argmax(vals, axis=0)
        v_next = vals[best, np.arange(S)]
        v_grids[i] = v_next.copy()

    x, pv = 0.0, 0.0
    for i in range(n_ev):
        actions, is_last, t, tn = events[i]
        payoffs, coords = actions(np.array([x]))
        if is_last:
            cont = np.zeros((3, 1))
        else:
            cont = np.stack([np.interp(c, grid, v_grids[i + 1]) for c in coords])
        disc = np.exp(-rate * (tn - t))
        best = int(np.argmax(payoffs[:, 0] + disc * cont[:, 0]))
        pv += payoffs[best, 0] * np.exp(-rate * t)
        x = coords[best, 0]
    return pv


def run_controller(storage, model, num_paths=256, presim=256):
    pv_metric = PVMetric()
    controller = SimulationController(
        netting_sets=[NettingSet(name="storage", products=[storage])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[pv_metric]),
        num_paths_mainsim=num_paths,
        num_paths_presim=presim,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=False,
        regression_function=PolynomialRegression(degree=3),
    )
    return float(
        controller.run_simulation().get_results("storage", "pv", evaluation_idx=0)
    )


# -- scenario matrix ----------------------------------------------------------

RAMP_UP = StorageScenario(
    name="ramp_up_curve",
    end_date=62.0,
    initial_amount=0.0,
    volume_constraints=((0.0, 62.0, 0.0, 90.0),),
    injection_rates=((0.0, 62.0, 0.0, 4.0), (0.0, 62.0, 50.0, 2.0)),
    withdrawal_rates=((0.0, 62.0, 0.0, 1.5), (0.0, 62.0, 50.0, 5.0)),
    injection_cost=0.2,
    withdrawal_cost=0.05,
    num_states=10,
    curve=((0.0, 100.0), (15.0, 100.0), (34.0, 110.0), (62.0, 112.0)),
)

SEASONAL = StorageScenario(
    name="seasonal_windows",
    end_date=120.0,
    initial_amount=0.0,
    volume_constraints=(
        (0.0, 40.0, 0.0, 100.0),
        (40.0, 80.0, 20.0, 120.0),
        (80.0, 121.0, 0.0, 60.0),
    ),
    injection_rates=(
        (0.0, 60.0, 0.0, 5.0),
        (0.0, 60.0, 60.0, 3.5),
        (0.0, 60.0, 110.0, 2.0),
        (60.0, 121.0, 0.0, 6.5),
        (60.0, 121.0, 60.0, 4.0),
        (60.0, 121.0, 110.0, 2.5),
    ),
    withdrawal_rates=(
        (0.0, 60.0, 0.0, 2.0),
        (0.0, 60.0, 60.0, 3.6),
        (0.0, 60.0, 110.0, 5.0),
        (60.0, 121.0, 0.0, 2.6),
        (60.0, 121.0, 60.0, 4.4),
        (60.0, 121.0, 110.0, 6.4),
    ),
    injection_cost=0.35,
    withdrawal_cost=0.12,
    num_states=12,
    curve=(
        (0.0, 90.0), (30.0, 94.0), (60.0, 88.0), (90.0, 104.0), (120.0, 98.0),
    ),
)

FORCED_DRAWDOWN = StorageScenario(
    name="forced_drawdown",
    end_date=60.0,
    initial_amount=48.0,
    volume_constraints=(
        (0.0, 30.0, 0.0, 80.0),
        (30.0, 45.0, 0.0, 40.0),
        (45.0, 61.0, 0.0, 10.0),
    ),
    injection_rates=((0.0, 61.0, 0.0, 2.0),),
    withdrawal_rates=((0.0, 61.0, 0.0, 3.0), (0.0, 61.0, 70.0, 6.0)),
    injection_cost=0.1,
    withdrawal_cost=0.1,
    num_states=8,
    curve=((0.0, 120.0), (25.0, 112.0), (45.0, 104.0), (60.0, 100.0)),
)

DISCOUNTED = StorageScenario(
    name="discounted",
    end_date=62.0,
    initial_amount=0.0,
    volume_constraints=((0.0, 62.0, 0.0, 90.0),),
    injection_rates=((0.0, 62.0, 0.0, 4.0), (0.0, 62.0, 50.0, 2.0)),
    withdrawal_rates=((0.0, 62.0, 0.0, 1.5), (0.0, 62.0, 50.0, 5.0)),
    injection_cost=0.2,
    withdrawal_cost=0.05,
    num_states=10,
    curve=((0.0, 100.0), (15.0, 100.0), (34.0, 110.0), (62.0, 112.0)),
    rate_daily=0.10 / 365.0,
)

SCENARIOS = (RAMP_UP, SEASONAL, FORCED_DRAWDOWN, DISCOUNTED)


@pytest.mark.parametrize("scenario", SCENARIOS, ids=[s.name for s in SCENARIOS])
def test_storage_s2f_pv_vs_dp_oracle(scenario):
    storage = build_storage(scenario)
    model = build_model(scenario)
    spot_fn = lambda t: float(  # noqa: E731
        np.interp(t, [c[0] for c in scenario.curve], [c[1] for c in scenario.curve])
    )
    expected = oracle_pv(storage, spot_fn, scenario.rate_daily)
    actual = run_controller(storage, model)
    assert expected != 0.0
    assert actual == pytest.approx(expected, rel=1e-9, abs=1e-9)


def test_storage_s2f_stochastic_golden():
    """Self-golden regression: realistic vols, deterministic threefry RNG.

    The value is pinned to this repo's RNG stream (like the reference pins
    test_storage_s2f_pv.py:24-27 to its torch seeds); any engine change that
    moves the number by >1e-6 is a semantic change, not noise.
    """
    storage = build_storage(RAMP_UP)
    model = build_model(RAMP_UP, stochastic=True)
    actual = run_controller(storage, model, num_paths=1024, presim=1024)
    assert actual == pytest.approx(656.9065687585778, abs=1e-6)
