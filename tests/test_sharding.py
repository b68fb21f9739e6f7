"""Path-axis sharding: sharded run must reproduce the single-device result.

Runs the full pipeline over an 8-virtual-device CPU mesh (SURVEY.md §4
multi-node strategy) and checks value equality against the unsharded run —
the counter-based RNG guarantees the same draws regardless of sharding.
"""

import jax
import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    EPEMetric,
    Equity,
    EuropeanOption,
    NettingSet,
    OptionType,
    PFEMetric,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)
from montecarlo_risk_engine_tpu.parallel.mesh import make_path_mesh, path_sharding


def _run(sharding):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2, asset_id="eq")
    product = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL, asset_id="eq")
    controller = SimulationController(
        netting_sets=[NettingSet(name="ns", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[PVMetric(), EPEMetric(), PFEMetric(0.95)],
            exposure_timeline=np.array([0.0, 0.5, 1.0]),
        ),
        num_paths_mainsim=4096,
        num_paths_presim=4096,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        differentiate=True,
        path_sharding=sharding,
    )
    return controller.run_simulation()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_run_matches_single_device():
    mesh = make_path_mesh(8)
    sharded = _run(path_sharding(mesh))
    plain = _run(None)
    for metric in ("pv", "epe", "pfe[0.95]"):
        np.testing.assert_allclose(
            sharded.get_results("ns", metric),
            plain.get_results("ns", metric),
            rtol=1e-9,
        )
    g_sharded = sharded.get_derivatives("ns", "pv", evaluation_idx=0)
    g_plain = plain.get_derivatives("ns", "pv", evaluation_idx=0)
    for name in g_plain:
        np.testing.assert_allclose(g_sharded[name], g_plain[name], rtol=1e-8)
