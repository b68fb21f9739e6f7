"""Controller-level Pallas fast path: statistical equivalence + availability.

VERDICT r1 #3: the fused kernels must reach users through
SimulationController, with an equivalence test vs the jnp engine.  The kernel
draws a different (hardware-PRNG) stream than the threefry scan engine, so
the contract is statistical: both estimates of the same book agree within
combined MC standard errors, and both match the closed form.

TPU-hardware tests run only with RUN_TPU_PALLAS_TESTS=1 (separate pytest
invocation — see tests/conftest.py); the CPU-mesh assertions always run.
"""

import os

import jax
import numpy as np
import pytest

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

ON_TPU = bool(os.environ.get("RUN_TPU_PALLAS_TESTS")) and jax.default_backend() == "tpu"


def _bs_controller(num_paths, use_pallas, differentiate=False):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL, asset_id="eq")
    return SimulationController(
        netting_sets=[NettingSet(name="book", products=[option])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=0,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        differentiate=differentiate,
        use_pallas=use_pallas,
    )


def test_pallas_auto_off_on_cpu():
    if jax.default_backend() == "tpu":
        pytest.skip("auto turns the kernel ON under a TPU backend")
    c = _bs_controller(4096, "auto")
    c.run_simulation()
    assert not c._pallas_active


def test_use_pallas_true_raises_when_ineligible():
    if jax.default_backend() == "tpu":
        pytest.skip("CPU-only eligibility check")
    with pytest.raises(ValueError):
        c = _bs_controller(4096, True)
        c.run_simulation()


@pytest.mark.skipif(not ON_TPU, reason="needs TPU hardware (RUN_TPU_PALLAS_TESTS=1)")
def test_pallas_controller_bs_matches_engine_and_closed_form():
    from scipy.stats import norm

    n = 1 << 20
    c_pallas = _bs_controller(n, True)
    c_scan = _bs_controller(n, False)
    assert c_pallas._decide_pallas()

    r_p = c_pallas.run_simulation()
    r_s = c_scan.run_simulation()
    assert c_pallas._pallas_active and not c_scan._pallas_active

    pv_p = float(r_p.get_results("book", "pv", evaluation_idx=0))
    pv_s = float(r_s.get_results("book", "pv", evaluation_idx=0))
    se_p = float(r_p.get_mc_error("book", "pv", evaluation_idx=0))
    se_s = float(r_s.get_mc_error("book", "pv", evaluation_idx=0))

    d1 = (np.log(1.0) + (0.03 + 0.02)) / 0.2
    d2 = d1 - 0.2
    ref = 100.0 * norm.cdf(d1) - 100.0 * np.exp(-0.03) * norm.cdf(d2)

    assert abs(pv_p - ref) < 4 * se_p + 0.02
    assert abs(pv_p - pv_s) < 4 * np.hypot(se_p, se_s) + 0.02


@pytest.mark.skipif(not ON_TPU, reason="needs TPU hardware (RUN_TPU_PALLAS_TESTS=1)")
def test_pallas_controller_heston_qe_matches_semi_analytic():
    n = 1 << 20
    model_kw = dict(spot=100.0, rate=0.03, sigma=0.5, rho=-0.7, kappa=2.0,
                    theta=0.06, v0=0.04)

    def make(use_pallas):
        model = HestonModel(0.0, asset_id="eq", **model_kw)
        option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL,
                                asset_id="eq")
        return SimulationController(
            netting_sets=[NettingSet(name="book", products=[option])],
            model=model,
            risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=n, num_paths_presim=0, num_steps=8,
            simulation_scheme=SimulationScheme.QE,
            use_pallas=use_pallas,
        )

    c = make(True)
    r = c.run_simulation()
    assert c._pallas_active
    pv = float(r.get_results("book", "pv", evaluation_idx=0))
    se = float(r.get_mc_error("book", "pv", evaluation_idx=0))

    # semi-analytic characteristic-function price (host oracle)
    model = HestonModel(0.0, asset_id="eq", **model_kw)
    option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL,
                            asset_id="eq")
    ref = float(option.compute_pv_analytically_heston(model))
    # QE at 8 substeps carries a small discretisation bias; 4 sigma + bias room
    assert abs(pv - ref) < 4 * se + 0.05


@pytest.mark.skipif(not ON_TPU, reason="needs TPU hardware (RUN_TPU_PALLAS_TESTS=1)")
def test_pallas_controller_vasicek_bond_matches_engine():
    """Fused exact-OU kernel through the controller: statistical equivalence
    with the jnp scan engine on a zero-bond book.  Both carry the SAME
    left-Riemann numeraire bias (quirk Q3, ~7e-4 at 16 substeps over 3y), so
    kernel vs engine must agree within combined MC error while both sit in a
    discretisation-bias band around the closed form P(0,T)."""
    from montecarlo_risk_engine_tpu import Bond, VasicekModel

    n = 1 << 20

    def make(use_pallas):
        model = VasicekModel(0.0, rate=0.03, mean=0.045,
                             mean_reversion_speed=0.3, volatility=0.012,
                             asset_id="irs")
        bond = Bond(startdate=0.0, maturity=3.0, notional=1.0, tenor=3.0,
                    pays_notional=True, fixed_rate=0.0, asset_id="irs")
        return model, SimulationController(
            netting_sets=[NettingSet(name="bond", products=[bond])],
            model=model,
            risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=n, num_paths_presim=0, num_steps=16,
            simulation_scheme=SimulationScheme.ANALYTICAL,
            use_pallas=use_pallas,
        )

    model, c_pallas = make(True)
    _, c_scan = make(False)
    r_p = c_pallas.run_simulation()
    r_s = c_scan.run_simulation()
    assert c_pallas._pallas_active and not c_scan._pallas_active

    pv_p = float(r_p.get_results("bond", "pv", evaluation_idx=0))
    pv_s = float(r_s.get_results("bond", "pv", evaluation_idx=0))
    se_p = float(r_p.get_mc_error("bond", "pv", evaluation_idx=0))
    se_s = float(r_s.get_mc_error("bond", "pv", evaluation_idx=0))
    assert abs(pv_p - pv_s) < 4 * np.hypot(se_p, se_s) + 1e-4, (pv_p, pv_s)

    ref = float(model.bond_price(model.initial_params(), 0.0, 3.0,
                                 model.initial_params()[0]))
    for pv in (pv_p, pv_s):  # shared Q3 bias band
        assert abs(pv - ref) < 2e-3, (pv, ref)
