"""Path-minor state layout equivalence.

The controller resolves observables on [T, D, N] (path-minor) states
(engine.simulate_paths(transpose_states=True) + Model.set_state_layout) while
steps and direct model use keep the [N, D] convention.  Both orientations
must resolve identically — this is the TPU lane-padding fix's correctness
contract (docs/TUNING.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    CIRPPModel,
    HestonModel,
    ModelConfig,
    VasicekModel,
)
from montecarlo_risk_engine_tpu.config import SimulationScheme
from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
from montecarlo_risk_engine_tpu.requests import AtomicRequestType
from montecarlo_risk_engine_tpu.rng import PHASE_MAINSIM


def test_transposed_emission_matches():
    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.6,
                        kappa=1.2, theta=0.04, v0=0.04)
    p = model.initial_params()
    a = simulate_paths(model, p, SimulationScheme.QE, (0.5, 1.0), 512, 4,
                       PHASE_MAINSIM)
    b = simulate_paths(model, p, SimulationScheme.QE, (0.5, 1.0), 512, 4,
                       PHASE_MAINSIM, transpose_states=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(jnp.swapaxes(b, 1, 2)))


@pytest.mark.parametrize("kind,asset", [
    (AtomicRequestType.SPOT, "eq"),
    (AtomicRequestType.NUMERAIRE, "numeraire"),
    (AtomicRequestType.SURVIVAL_PROBABILITY, "cp"),
])
def test_resolve_rows_layout_equivalence(kind, asset):
    rates = VasicekModel(0.0, rate=0.03, mean=0.04, mean_reversion_speed=0.3,
                         volatility=0.01, asset_id="irs")
    eq = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    credit = CIRPPModel(0.0, asset_id="cp", hazard_rates={1.0: 0.02, 5.0: 0.03},
                        kappa=0.1, theta=0.01, volatility=0.02, y0=0.0001)

    def build():
        return ModelConfig(
            [rates, eq, credit],
            inter_asset_correlation_matrix=[np.array([[0.2]]), np.array([[0.1]]),
                                            np.array([[0.15]])],
        )

    model = build()
    p = model.initial_params()
    states = simulate_paths(model, p, SimulationScheme.EULER, (0.5, 1.0, 2.0),
                            256, 2, PHASE_MAINSIM)           # [T, N, D]
    rows = np.array([0, 2, 2])
    t1s = jnp.asarray([0.5, 2.0, 2.0])
    t2s = jnp.asarray([0.0, 0.0, 3.0]) if kind == AtomicRequestType.SURVIVAL_PROBABILITY \
        else jnp.zeros(3)

    model.set_state_layout(False)
    out_nd = model.resolve_request_rows(p, kind, asset, t1s, t2s,
                                        states[rows])
    model.set_state_layout(True)
    out_dn = model.resolve_request_rows(p, kind, asset, t1s, t2s,
                                        jnp.swapaxes(states, 1, 2)[rows])
    model.set_state_layout(False)
    np.testing.assert_allclose(np.asarray(out_nd), np.asarray(out_dn),
                               rtol=1e-12, atol=0.0)
