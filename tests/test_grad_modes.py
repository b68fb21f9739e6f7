"""Forward-mode vs reverse-mode sensitivity equivalence.

The controller picks its AD direction by shape (grad_mode="auto": jacfwd when
params <= metric values, else chunked jacrev — see controller._build_jitted).
Both directions must produce identical jacobians through the whole pipeline,
including LSM regression and the netting/collateral plane (the reference
differentiates per-value reverse-mode only, controller.py:609-627).
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BermudanOption,
    BlackScholesModel,
    CVAMetric,
    CIRPPModel,
    EPEMetric,
    Equity,
    EuropeanOption,
    ModelConfig,
    NettingSet,
    OptionType,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)

CP = "cp"


def _build(grad_mode):
    eq = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.25, asset_id="eq")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates={1.0: 0.02, 5.0: 0.03},
                        kappa=0.1, theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig([eq, credit],
                        inter_asset_correlation_matrix=[np.array([[0.3]])])
    products = [
        EuropeanOption(Equity("eq"), 1.5, 100.0, OptionType.CALL, asset_id="eq"),
        BermudanOption(Equity("eq"), [0.5, 1.0, 2.0], 105.0, OptionType.PUT,
                       asset_id="eq"),
    ]
    ns = NettingSet(name="book", products=products, counterparty_id=CP)
    return SimulationController(
        netting_sets=[ns],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[CVAMetric(counterparty_id=CP, recovery_rate=0.4), EPEMetric()],
            exposure_timeline=np.linspace(0.0, 2.0, 7),
        ),
        num_paths_mainsim=2048,
        num_paths_presim=2048,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=True,
        grad_mode=grad_mode,
    )


@pytest.mark.slow
def test_fwd_and_rev_jacobians_match():
    cf, cr = _build("fwd"), _build("rev")
    rf, rr = cf.run_simulation(), cr.run_simulation()
    assert cf._grad_mode_resolved == "fwd" and cr._grad_mode_resolved == "rev"

    for metric, idx in [(f"cva[{CP}]", 0), ("epe", 3)]:
        gf = rf.get_derivatives("book", metric, evaluation_idx=idx)
        gr = rr.get_derivatives("book", metric, evaluation_idx=idx)
        assert set(gf) == set(gr)
        for k in gf:
            np.testing.assert_allclose(float(gf[k]), float(gr[k]),
                                       rtol=1e-9, atol=1e-12, err_msg=k)


@pytest.mark.slow
def test_lin_matches_fwd_jacobian():
    """grad_mode='lin' (linearize once + map the linear function, with the
    reconstruction rematted) is the SAME linear map as per-sweep jvp —
    jacobians must agree to float-roundoff through LSM, netting and
    metrics."""
    cf, cl = _build("fwd"), _build("lin")
    rf, rl = cf.run_simulation(), cl.run_simulation()
    assert cl._grad_mode_resolved == "lin"

    for metric, idx in [(f"cva[{CP}]", 0), ("epe", 3)]:
        gf = rf.get_derivatives("book", metric, evaluation_idx=idx)
        gl = rl.get_derivatives("book", metric, evaluation_idx=idx)
        assert set(gf) == set(gl)
        for k in gf:
            np.testing.assert_allclose(float(gf[k]), float(gl[k]),
                                       rtol=1e-9, atol=1e-12, err_msg=k)
    # values are untouched by the gradient driver
    np.testing.assert_allclose(
        float(rf.get_results("book", f"cva[{CP}]", evaluation_idx=0)),
        float(rl.get_results("book", f"cva[{CP}]", evaluation_idx=0)),
        rtol=1e-12,
    )


@pytest.mark.slow
def test_lin_hessian_matches_fwd():
    """The per-parameter Hessian row dispatch (jvp THROUGH the linearized
    gradient function) must reproduce the chunked-jvp Hessian."""
    cf, cl = _build("fwd"), _build("lin")
    cf.compute_higher_derivatives()
    cl.compute_higher_derivatives()
    rf, rl = cf.run_simulation(), cl.run_simulation()
    hf = rf.get_second_derivatives("book", f"cva[{CP}]", param1="eq.spot",
                                   param2="eq.volatility", evaluation_idx=0)
    hl = rl.get_second_derivatives("book", f"cva[{CP}]", param1="eq.spot",
                                   param2="eq.volatility", evaluation_idx=0)
    np.testing.assert_allclose(float(hf), float(hl), rtol=1e-8, atol=1e-12)


def test_auto_picks_forward_direction_for_few_params():
    c = _build("auto")
    c.run_simulation()
    # Few params, many metric values -> a forward-mode driver; this small
    # book's linearization residuals fit any budget, so auto upgrades the
    # chunked jvp to the linearize-once driver (same linear map — equality
    # pinned by test_lin_matches_fwd_jacobian).
    assert c._grad_mode_resolved == "lin"


def test_auto_falls_back_to_jvp_when_lin_residuals_do_not_fit(monkeypatch):
    c = _build("auto")
    monkeypatch.setattr(type(c), "LIN_RESIDUAL_AMP", 1e18)
    c.run_simulation()
    assert c._grad_mode_resolved == "fwd"
