"""Storage lax.scan executor must reproduce the unrolled DP bitwise."""

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
from montecarlo_risk_engine_tpu.products.storage_config import StorageConfig


def _build_storage():
    cfg = StorageConfig()
    cfg.add_volume_constraint(0.0, 2.0, 0.0, 10.0)
    cfg.add_injection_flexibility(0.0, 2.0, 0.0, 3.0)
    cfg.add_injection_flexibility(0.0, 2.0, 6.0, 1.5)
    cfg.add_withdrawal_flexibility(0.0, 2.0, 0.0, 1.0)
    cfg.add_withdrawal_flexibility(0.0, 2.0, 6.0, 2.5)
    cfg.add_variable_injection_cost(0.0, 0.2)
    cfg.add_variable_withdrawal_cost(0.0, 0.15)
    return Storage(asset_id="gas", start_date=0.0, end_date=2.0, initial_amount=3.0,
                   storage_config=cfg, num_states=6, rollout_interval=0.25)


def _pv(use_scan: bool) -> float:
    model = SchwartzTwoFactorModel(
        0.0, [0.0, 2.0], [10.0, 11.0], rate=0.02,
        short_term_mean_reversion=1.0, short_term_vol=0.4,
        long_term_drift=0.01, long_term_vol=0.2, rho=0.3, asset_id="gas",
    )
    product = _build_storage()
    controller = SimulationController(
        netting_sets=[NettingSet(name="s", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=4000,
        num_paths_presim=4000,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        batch_products=use_scan,
    )
    if not use_scan:
        # force the generic unrolled executor
        controller._supports_exercise_scan = lambda p: False
    return float(controller.run_simulation().get_results("s", "pv", evaluation_idx=0))


def test_storage_scan_matches_unrolled():
    assert _pv(True) == pytest.approx(_pv(False), rel=1e-12)
