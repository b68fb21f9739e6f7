"""Sobol quasi-Monte Carlo sampler (ops/sobol.py, engine sampler="sobol").

A beyond-reference capability (the reference engine draws torch pseudo-random
normals only, engine.py:35-123): these tests pin

  * bitwise parity of the device Gray-code evaluation against scipy's
    sequential Joe-Kuo generator,
  * the engine integration (convergence beats pseudo-random on a smooth
    payoff at equal path count; exact pathwise AAD through the inverse CDF),
  * the determinism contracts (sharded == unsharded bitwise; phase-keyed
    digital shifts; antithetic exclusion).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    Equity,
    EuropeanOption,
    HestonModel,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)
from montecarlo_risk_engine_tpu.ops.sobol import (
    direction_numbers,
    sobol_uint32,
    sobol_uniforms,
)
from tests.test_pv_european_option import bs_call_analytics


def test_sobol_bits_match_scipy():
    import scipy.stats.qmc as qmc

    d, n = 11, 256
    v = direction_numbers(d)
    ours = np.asarray(sobol_uint32(n, v)).astype(np.float64) * 2.0**-32
    ref = qmc.Sobol(d=d, scramble=False).random(n)
    np.testing.assert_array_equal(ours, ref)


def test_sobol_dimension_guard():
    with pytest.raises(ValueError, match="Joe-Kuo"):
        direction_numbers(30_000)


def test_digital_shift_preserves_low_discrepancy_marginals():
    # A digital shift permutes each dyadic interval: every dimension of the
    # first 2^k points still hits each length-2^-k bin exactly once.
    from montecarlo_risk_engine_tpu import rng

    d, n = 5, 128
    v = direction_numbers(d)
    shift = rng.qmc_shift(rng.phase_key(rng.root_key(7), rng.PHASE_MAINSIM), d)
    u = np.asarray(sobol_uniforms(n, jnp.asarray(v), shift, jnp.float64))
    assert u.min() > 0.0 and u.max() < 1.0
    for j in range(d):
        bins = np.floor(u[:, j] * n).astype(int)
        assert len(np.unique(bins)) == n, f"dim {j} not a (0, m, 32)-net"


def _pv_controller(num_paths, sampler, sharding=None, scheme=None,
                   differentiate=False):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                              asset_id="eq")
    option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                            asset_id="eq")
    return SimulationController(
        netting_sets=[NettingSet(name="b", products=[option])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=0,
        num_steps=4,
        # exact transitions: closed-form comparisons isolate SAMPLING error
        # (EULER's O(dt) discretization bias would swamp the QMC gain)
        simulation_scheme=scheme or SimulationScheme.ANALYTICAL,
        differentiate=differentiate,
        path_sharding=sharding,
        sampler=sampler,
    )


def test_sobol_beats_pseudo_on_european_pv():
    exact, _, _, _ = bs_call_analytics(100.0, 100.0, 0.03, 0.2, 2.0)
    n = 8192
    pv_sobol = float(_pv_controller(n, "sobol").run_simulation()
                     .get_results("b", "pv", evaluation_idx=0))
    pv_pseudo = float(_pv_controller(n, "pseudo").run_simulation()
                      .get_results("b", "pv", evaluation_idx=0))
    err_sobol = abs(pv_sobol - exact)
    err_pseudo = abs(pv_pseudo - exact)
    # At 8k paths the pseudo MC error is ~0.13 here; scrambled Sobol lands
    # well under it.  Deterministic given the fixed root_seed.
    assert err_sobol < 0.02, (pv_sobol, exact)
    assert err_sobol < err_pseudo, (err_sobol, err_pseudo)


def test_sobol_aad_delta_matches_closed_form():
    n = 16384
    res = _pv_controller(n, "sobol", differentiate=True).run_simulation()
    delta = float(res.get_derivatives("b", "pv", evaluation_idx=0)["spot"])
    _, exact, _, _ = bs_call_analytics(100.0, 100.0, 0.03, 0.2, 2.0)
    assert abs(delta - exact) < 5e-3, (delta, exact)


def test_sobol_sharded_bitwise_equals_unsharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()), ("paths",))
    sharding = NamedSharding(mesh, PartitionSpec("paths"))
    n = 2048
    a = _pv_controller(n, "sobol").run_simulation()
    b = _pv_controller(n, "sobol", sharding=sharding).run_simulation()
    assert float(a.get_results("b", "pv", evaluation_idx=0)) == float(
        b.get_results("b", "pv", evaluation_idx=0)
    )


def test_sobol_heston_qe_uses_uniform_dimension():
    # QE consumes an extra uniform per substep: the Sobol block must carry
    # sim_dim + 1 dimensions.  Pin the price against the pseudo-random QE
    # value within combined tolerance.
    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.7,
                        kappa=2.0, theta=0.04, v0=0.04, asset_id="eq")
    option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL,
                            asset_id="eq")

    def run(sampler, n):
        c = SimulationController(
            netting_sets=[NettingSet(name="b", products=[option])],
            model=model,
            risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=n, num_paths_presim=0, num_steps=8,
            simulation_scheme=SimulationScheme.QE,
            sampler=sampler,
        )
        r = c.run_simulation()
        return (float(r.get_results("b", "pv", evaluation_idx=0)),
                float(r.get_mc_error("b", "pv", evaluation_idx=0)))

    pv_q, _ = run("sobol", 16384)
    pv_p, se_p = run("pseudo", 65536)
    assert abs(pv_q - pv_p) < 4 * se_p, (pv_q, pv_p, se_p)


def test_sobol_excludes_antithetic():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                              asset_id="eq")
    option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL,
                            asset_id="eq")
    with pytest.raises(ValueError, match="antithetic"):
        SimulationController(
            netting_sets=[NettingSet(name="b", products=[option])],
            model=model,
            risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=64, num_paths_presim=0, num_steps=1,
            simulation_scheme=SimulationScheme.EULER,
            antithetic=True, sampler="sobol",
        )
