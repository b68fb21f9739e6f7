"""Exactness of the differentiable-kernel tangent rule (ops/pallas_paths_ad).

The custom-JVP wrapper recovers the per-substep noise from consecutive
emitted states and re-derives the step recurrence in XLA.  These tests pin
that rule EXACTLY (f64, ~1e-9) against ``jax.jacfwd`` straight through the
threefry engine producing the *same* primal states — the rule must agree
with direct AD for every model whose transition it claims to invert
(BS, BS-multi, Vasicek, CIR++, and the hybrid north-star container).

On TPU the same wrapper runs over the Pallas kernels; the hardware-side
equivalence (kernel dense-timeline law, AAD vs common-random-number FD) is
pinned in tests/test_pallas_kernel_tpu.py / test_pallas_controller_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    BlackScholesMulti,
    CIRPPModel,
    HullWhiteModel,
    ModelConfig,
    SchwartzTwoFactorModel,
    SimulationScheme,
    VasicekModel,
)
from montecarlo_risk_engine_tpu import rng
from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
from montecarlo_risk_engine_tpu.ops.pallas_paths_ad import (
    dense_timeline,
    recovered_noise_paths,
)

HAZARDS = {1.0: 0.02, 2.0: 0.022, 5.0: 0.028}


def _models():
    return {
        "bs": (
            BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq"),
            SimulationScheme.ANALYTICAL,
        ),
        "bs_multi": (
            BlackScholesMulti(
                0.0, spots=[95.0, 105.0], volatilities=[0.2, 0.3], rate=0.02,
                correlation_matrix=[[1.0, 0.5], [0.5, 1.0]],
                asset_ids=["a", "b"],
            ),
            SimulationScheme.ANALYTICAL,
        ),
        "vasicek": (
            VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                         volatility=0.012, asset_id="irs"),
            SimulationScheme.ANALYTICAL,
        ),
        "cirpp": (
            CIRPPModel(0.0, asset_id="cp", hazard_rates=HAZARDS, kappa=0.4,
                       theta=0.02, volatility=0.05, y0=0.01),
            SimulationScheme.EULER,
        ),
        "hybrid": (
            ModelConfig(
                [
                    VasicekModel(0.0, rate=0.03, mean=0.045,
                                 mean_reversion_speed=0.3, volatility=0.012,
                                 asset_id="irs"),
                    BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.22,
                                      asset_id="eq"),
                    CIRPPModel(0.0, asset_id="cp", hazard_rates=HAZARDS,
                               kappa=0.4, theta=0.02, volatility=0.05, y0=0.01),
                ],
                inter_asset_correlation_matrix=[
                    np.array([[0.25]]), np.array([[0.4]]), np.array([[0.15]]),
                ],
            ),
            SimulationScheme.EULER,
        ),
        "hw": (
            # round-3: curve-fitted Hull-White kernel block
            HullWhiteModel(0.0, [0.0, 2.0, 5.0], [1.0, 0.94, 0.85],
                           volatility=0.01, mean_reversion=0.4,
                           asset_id="irs"),
            SimulationScheme.ANALYTICAL,
        ),
        "s2f": (
            # round-3: Schwartz 2F kernel block (traced-rho in-block combine)
            SchwartzTwoFactorModel(
                0.0, [0.0, 1.0, 3.0], [50.0, 52.0, 55.0], rate=0.03,
                short_term_mean_reversion=1.2, short_term_vol=0.3,
                long_term_drift=0.01, long_term_vol=0.15, rho=0.35,
                asset_id="gas",
            ),
            SimulationScheme.ANALYTICAL,
        ),
        "hybrid_hw": (
            # round-3: Hull-White block inside the hybrid container
            ModelConfig(
                [
                    HullWhiteModel(0.0, [0.0, 2.0, 5.0], [1.0, 0.94, 0.85],
                                   volatility=0.01, mean_reversion=0.4,
                                   asset_id="irs"),
                    BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.22,
                                      asset_id="eq"),
                ],
                inter_asset_correlation_matrix=[np.array([[0.3]])],
            ),
            SimulationScheme.EULER,
        ),
        "hybrid_multi": (
            # round-3: BlackScholesMulti as a hybrid kernel block (intra
            # correlation folds into the static joint factor)
            ModelConfig(
                [
                    BlackScholesMulti(
                        0.0, spots=[95.0, 105.0], volatilities=[0.2, 0.3],
                        rate=0.02,
                        correlation_matrix=[[1.0, 0.5], [0.5, 1.0]],
                        asset_ids=["a", "b"],
                    ),
                    VasicekModel(0.0, rate=0.03, mean=0.045,
                                 mean_reversion_speed=0.3, volatility=0.012,
                                 asset_id="irs"),
                ],
                inter_asset_correlation_matrix=[np.array([[0.3], [0.1]])],
            ),
            SimulationScheme.EULER,
        ),
    }


TIMELINE = (0.4, 0.8, 1.3, 2.0)
NUM_STEPS = 3
NUM_PATHS = 256


def _wrap_and_direct(model, scheme):
    """(custom-JVP wrapped fn, direct-AD fn) over the SAME dense engine."""
    dense, orig_idx = dense_timeline(model.calibration_date, TIMELINE, NUM_STEPS)

    def forward_fn(params):
        return simulate_paths(
            model, params, scheme, dense, NUM_PATHS, 1, rng.PHASE_MAINSIM,
            root_seed=7,
        )

    wrapped = recovered_noise_paths(
        model, scheme, TIMELINE, NUM_PATHS, NUM_STEPS, forward_fn
    )
    direct = lambda params: forward_fn(params)[np.asarray(orig_idx)]
    return wrapped, direct


@pytest.mark.parametrize("name", ["bs", "bs_multi", "vasicek", "cirpp", "hybrid",
                                  "hybrid_multi", "hw", "s2f", "hybrid_hw"])
def test_recovered_noise_tangent_matches_direct_ad(name):
    model, scheme = _models()[name]
    wrapped, direct = _wrap_and_direct(model, scheme)
    params = model.initial_params()

    states_w = jax.jit(wrapped)(params)
    states_d = jax.jit(direct)(params)
    np.testing.assert_allclose(
        np.asarray(states_w), np.asarray(states_d), rtol=1e-12, atol=1e-12
    )

    # scalar summary so jacfwd stays [P]-shaped; weights make every state
    # column and time point contribute
    def summary(fn):
        def f(p):
            s = fn(p)
            w = 1.0 + 0.1 * jnp.arange(s.size, dtype=s.dtype).reshape(s.shape)
            return jnp.mean(s * w)
        return f

    g_w = jax.jit(jax.jacfwd(summary(wrapped)))(params)
    g_d = jax.jit(jax.jacfwd(summary(direct)))(params)
    for a, b, pname in zip(g_w, g_d, model.get_model_param_names()):
        np.testing.assert_allclose(
            float(a), float(b), rtol=1e-8, atol=1e-10, err_msg=f"{name}.{pname}"
        )


def test_recovered_noise_reverse_mode_matches():
    model, scheme = _models()["hybrid"]
    wrapped, direct = _wrap_and_direct(model, scheme)
    params = model.initial_params()

    def summary(fn):
        return lambda p: jnp.mean(fn(p) ** 2)

    g_w = jax.jit(jax.grad(summary(wrapped)))(params)
    g_d = jax.jit(jax.grad(summary(direct)))(params)
    for a, b in zip(g_w, g_d):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-8, atol=1e-10)


def test_recovered_noise_second_order_matches():
    # Hessian rows nest jvp-of-jvp through the custom rule (the controller's
    # per-parameter row dispatch) — must equal direct second-order AD.
    model, scheme = _models()["bs"]
    wrapped, direct = _wrap_and_direct(model, scheme)
    params = model.initial_params()

    def summary(fn):
        return lambda p: jnp.mean(fn(p) ** 2)

    h_w = jax.jit(jax.jacfwd(jax.jacfwd(summary(wrapped))))(params)
    h_d = jax.jit(jax.jacfwd(jax.jacfwd(summary(direct))))(params)
    for row_w, row_d in zip(h_w, h_d):
        for a, b in zip(row_w, row_d):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-7, atol=1e-9)


def test_emitted_noise_tangent_matches_direct_ad():
    """Heston QE — non-invertible transition, so the kernel ships its draws
    (emit mode).  The emitted-noise rule must agree EXACTLY with jacfwd
    straight through the same smoothed scan at the same frozen draws."""
    from montecarlo_risk_engine_tpu import HestonModel
    from montecarlo_risk_engine_tpu.ops.pallas_paths_ad import (
        emitted_noise_paths,
    )

    model = HestonModel(0.0, spot=100.0, rate=0.03, sigma=0.5, rho=-0.7,
                        kappa=2.0, theta=0.06, v0=0.04, asset_id="eq")
    model.requires_grad()  # fuzzy branches — the validated QE AAD contract
    scheme = SimulationScheme.QE
    dense, idx = dense_timeline(model.calibration_date, TIMELINE, NUM_STEPS)

    kz, ku = jax.random.split(jax.random.PRNGKey(11))
    z = jax.random.normal(kz, (len(dense), NUM_PATHS, 2))
    u = jax.random.uniform(ku, (len(dense), NUM_PATHS))

    def run_scan(params):
        t_prev = model.calibration_date
        state = model.init_state(params, NUM_PATHS)
        outs = []
        for i, t in enumerate(dense):
            if t > t_prev:
                state = model.step(params, scheme, t_prev, t, state, z[i],
                                   uniform=u[i])
            outs.append(state)
            t_prev = t
        return jnp.stack(outs)

    wrapped = emitted_noise_paths(
        model, scheme, TIMELINE, NUM_PATHS, NUM_STEPS,
        lambda p: (run_scan(p), z, u),
    )
    direct = lambda p: run_scan(p)[np.asarray(idx)]
    params = model.initial_params()

    np.testing.assert_allclose(
        np.asarray(jax.jit(wrapped)(params)),
        np.asarray(jax.jit(direct)(params)), rtol=1e-12, atol=1e-12,
    )

    def summary(fn):
        def f(p):
            s = fn(p)
            w = 1.0 + 0.1 * jnp.arange(s.size, dtype=s.dtype).reshape(s.shape)
            return jnp.mean(s * w)
        return f

    g_w = jax.jit(jax.jacfwd(summary(wrapped)))(params)
    g_d = jax.jit(jax.jacfwd(summary(direct)))(params)
    for a, b, pname in zip(g_w, g_d, model.get_model_param_names()):
        np.testing.assert_allclose(
            float(a), float(b), rtol=1e-8, atol=1e-10, err_msg=f"qe.{pname}"
        )

    # reverse mode and second order nest through the same rule
    sq = lambda fn: (lambda p: jnp.mean(fn(p) ** 2))
    g_w = jax.jit(jax.grad(sq(wrapped)))(params)
    g_d = jax.jit(jax.grad(sq(direct)))(params)
    for a, b in zip(g_w, g_d):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-8, atol=1e-10)


def test_dense_timeline_mapping():
    dense, idx = dense_timeline(0.0, (0.0, 0.5, 1.0), 2)
    # t=0 point sits at the calibration date: emitted once, no substeps
    assert dense == (0.0, 0.25, 0.5, 0.75, 1.0)
    assert list(idx) == [0, 2, 4]
    # exact endpoints, no accumulation drift
    dense2, idx2 = dense_timeline(0.0, (1.0 / 3.0,), 3)
    assert dense2[-1] == 1.0 / 3.0 and list(idx2) == [2]


def test_dense_engine_equals_coarse_engine():
    # The densification claim itself: engine on the dense timeline with
    # num_steps=1 reproduces the coarse num_steps run at mapped points (same
    # threefry counters when no zero-dt points exist; dt arithmetic differs
    # by one rounding, hence ~1e-15 rather than bitwise).
    model, scheme = _models()["vasicek"]
    dense, idx = dense_timeline(model.calibration_date, TIMELINE, NUM_STEPS)
    params = model.initial_params()
    fine = simulate_paths(model, params, scheme, dense, NUM_PATHS, 1,
                          rng.PHASE_MAINSIM, root_seed=7)
    coarse = simulate_paths(model, params, scheme, TIMELINE, NUM_PATHS,
                            NUM_STEPS, rng.PHASE_MAINSIM, root_seed=7)
    np.testing.assert_allclose(np.asarray(fine[np.asarray(idx)]),
                               np.asarray(coarse), rtol=1e-12, atol=1e-14)


def test_hw_forward_table_host_mirror_matches_device():
    """The HW kernel block's host-side f(0,t) mirror must return EXACTLY the
    value the model's device lookup produces at every static substep time —
    any gap feeds the AD noise inversion a different alpha than the kernel
    used and reappears as spurious vega ~ c/sigma (found on hardware via
    CRN-FD: the old central-difference-of-logP device path lost ~2 digits to
    f32 cancellation against the f64 host mirror)."""
    from montecarlo_risk_engine_tpu import HullWhiteModel
    from montecarlo_risk_engine_tpu.ops.pallas_hybrid import KernelBlock

    times = [0.0, 1.37, 3.1, 5.0]
    dfs = [1.0, 0.958, 0.901, 0.842]
    model = HullWhiteModel(0.0, times, dfs, volatility=0.01,
                           mean_reversion=0.4, asset_id="irs")
    block = KernelBlock(
        "hw", "exact", 0, 2, 1,
        curve_times=tuple(times),
        curve_vals=tuple(float(f) for f in model._fwd_segs_host),
    )

    # pillars, interiors, straddles (f64 just below a pillar that rounds onto
    # it in f32 — both sides must pick the same segment), and extrapolation
    probe = [0.0, 0.5, 1.37, float(np.nextafter(np.float32(1.37), 0.0)),
             2.0, 3.1, 4.2, 5.0, 7.5]
    # device lookup at f32 precision (the TPU kernel's runtime dtype)
    dev_times = jnp.asarray(times, dtype=jnp.float32)
    dev_segs = jnp.asarray(model._fwd_segs_host, dtype=jnp.float32)
    for t in probe:
        idx = int(jnp.clip(
            jnp.searchsorted(dev_times, jnp.float32(t), side="right") - 1,
            0, dev_segs.shape[0] - 1,
        ))
        dev = float(dev_segs[idx])
        host = block.hw_fwd0(t)
        assert np.float32(host) == np.float32(dev), (t, host, dev)

    # the table itself is the exact f64 segment slope of log P
    lp = np.log(np.asarray(dfs, dtype=np.float64))
    expect = -np.diff(lp) / np.diff(np.asarray(times, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(model._fwd_segs_host), expect,
                               rtol=0, atol=0)
