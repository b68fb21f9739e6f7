"""Storage kernel-level tests + end-to-end withdraw-all PV.

Mirrors reference tests/pytests/test_storage.py:64-159.
"""

import jax.numpy as jnp
import numpy as np

from montecarlo_risk_engine_tpu import (
    NettingSet,
    PVMetric,
    RiskMetrics,
    SchwartzTwoFactorModel,
    SimulationController,
    SimulationScheme,
)
from montecarlo_risk_engine_tpu.config import asarray
from montecarlo_risk_engine_tpu.products.storage import Storage, StorageAction
from montecarlo_risk_engine_tpu.products.storage_config import StorageConfig

THRESHOLD = 1e-10


def build_constant_window_storage():
    cfg = StorageConfig()
    cfg.add_volume_constraint(0.0, 4.0, 0.0, 12.0, 0.0)
    cfg.add_injection_flexibility(0.0, 4.0, 0.0, 3.0)
    cfg.add_injection_flexibility(0.0, 4.0, 6.0, 1.5)
    cfg.add_withdrawal_flexibility(0.0, 4.0, 0.0, 1.0)
    cfg.add_withdrawal_flexibility(0.0, 4.0, 6.0, 2.5)
    cfg.add_variable_injection_cost(0.0, 1.0)
    cfg.add_variable_withdrawal_cost(0.0, 1.0)
    return Storage(
        asset_id="thegasprice", start_date=0.0, end_date=4.0, initial_amount=4.0,
        storage_config=cfg, num_states=4,
    )


def build_shifting_window_storage():
    cfg = StorageConfig()
    cfg.add_volume_constraint(0.0, 2.0, 0.0, 12.0, 0.0)
    cfg.add_volume_constraint(2.0, 3.0, 0.0, 12.0, 0.0)
    cfg.add_volume_constraint(3.0, 4.0, 3.0, 9.0, 0.0)
    cfg.add_injection_flexibility(0.0, 4.0, 0.0, 3.0)
    cfg.add_withdrawal_flexibility(0.0, 4.0, 0.0, 3.0)
    cfg.add_variable_injection_cost(0.0, 0.0)
    cfg.add_variable_withdrawal_cost(0.0, 0.0)
    return Storage(
        asset_id="thegasprice", start_date=0.0, end_date=4.0, initial_amount=6.0,
        storage_config=cfg, num_states=4,
    )


def test_injection_transition_is_monotone_and_capacity_limited():
    storage = build_constant_window_storage()
    states = asarray([0.0, 1.0, 2.0, 3.0])
    current = storage.state_to_volume(1.0, states)
    next_states = storage.compute_next_state(1.0, 2.0, StorageAction.INJECTION)(states)
    next_volumes = storage.state_to_volume(2.0, next_states)

    expected = np.array([4.5, 5.5, 6.5, 7.5])
    assert np.all(np.diff(np.asarray(next_states)) >= 0)
    assert np.allclose(np.asarray(next_volumes), expected, atol=THRESHOLD)
    assert np.all(np.asarray(next_volumes) >= np.asarray(current))


def test_hold_action_projects_inventory_into_next_window():
    storage = build_shifting_window_storage()
    states = asarray([0.0, 1.0, 2.0, 3.0])
    held_states = storage.compute_next_state(2.0, 3.0, StorageAction.DO_NOTHING)(states)
    held_volumes = storage.state_to_volume(3.0, held_states)
    assert np.allclose(np.asarray(held_volumes), [3.0, 4.0, 8.0, 9.0], atol=THRESHOLD)
    assert float(held_states[1]) == 0.5


def test_volume_delta_matches_physical_volume_change():
    storage = build_constant_window_storage()
    states = asarray([0.0, 1.0, 2.0, 3.0])
    current = storage.state_to_volume(1.0, states)
    for action in (StorageAction.INJECTION, StorageAction.WITHDRAWAL, StorageAction.DO_NOTHING):
        next_states = storage.compute_next_state(1.0, 2.0, action)(states)
        next_volumes = storage.state_to_volume(2.0, next_states)
        delta = storage.compute_volume_difference(1.0, 2.0, action)(states)
        assert np.allclose(np.asarray(delta), np.asarray(next_volumes - current), atol=THRESHOLD)


def test_storage_pv_withdraws_initial_inventory():
    cfg = StorageConfig()
    cfg.add_volume_constraint(0.0, 2.0, 0.0, 2.0, 0.0)
    cfg.add_injection_flexibility(0.0, 2.0, 0.0, 1.0)
    cfg.add_withdrawal_flexibility(0.0, 2.0, 0.0, 1.0)
    cfg.add_variable_injection_cost(0.0, 0.0)
    cfg.add_variable_withdrawal_cost(0.0, 0.0)
    product = Storage(
        asset_id="thegasprice", start_date=0.0, end_date=2.0, initial_amount=1.0,
        storage_config=cfg, num_states=3,
    )
    model = SchwartzTwoFactorModel(
        0.0, curve_times=[0.0, 2.0], curve_values=[10.0, 10.0], rate=0.0,
        short_term_mean_reversion=1.0, short_term_vol=1e-8,
        long_term_drift=0.0, long_term_vol=1e-8, rho=0.0, asset_id="thegasprice",
    )
    controller = SimulationController(
        netting_sets=[NettingSet(name=product.get_name(), products=[product])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=2000,
        num_paths_presim=2000,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    pv = controller.run_simulation().get_results(product.get_name(), "pv", evaluation_idx=0)
    # deterministic price 10, inventory 1 -> withdraw everything
    assert abs(float(pv) - 10.0) < 1e-3
