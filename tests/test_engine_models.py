"""Distribution-level tests for models + scan engine.

Pattern follows SURVEY.md §4 ("MC vs closed form with tolerance",
test_pv_european_option.py:87-116): simulate terminal states and compare
moments against closed forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_risk_engine_tpu.config import SimulationScheme
from montecarlo_risk_engine_tpu import rng
from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
from montecarlo_risk_engine_tpu.models.black_scholes import BlackScholesModel
from montecarlo_risk_engine_tpu.models.black_scholes_multi import BlackScholesMulti
from montecarlo_risk_engine_tpu.models.vasicek import VasicekModel
from montecarlo_risk_engine_tpu.models.heston import HestonModel


def test_bs_analytic_terminal_distribution():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2)
    params = model.initial_params()
    n = 200_000
    states = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [2.0], n, 1, rng.PHASE_MAINSIM)
    s_t = np.asarray(states[0, :, 0])
    # E[S_T] = S0 e^{rT};  Var[log S_T] = sigma^2 T
    assert abs(s_t.mean() / (100.0 * np.exp(0.1)) - 1.0) < 5e-3
    log_var = np.log(s_t).var()
    assert abs(log_var / (0.04 * 2.0) - 1.0) < 2e-2


def test_bs_euler_converges_to_analytic_mean():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.3)
    params = model.initial_params()
    states = simulate_paths(model, params, SimulationScheme.EULER, [1.0], 100_000, 64, rng.PHASE_MAINSIM)
    s_t = np.asarray(states[0, :, 0])
    assert abs(s_t.mean() / (100.0 * np.exp(0.03)) - 1.0) < 5e-3


def test_bs_milstein_runs():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.3)
    params = model.initial_params()
    states = simulate_paths(model, params, SimulationScheme.MILSTEIN, [1.0], 50_000, 16, rng.PHASE_MAINSIM)
    s_t = np.asarray(states[0, :, 0])
    assert abs(s_t.mean() / (100.0 * np.exp(0.03)) - 1.0) < 8e-3


def test_bs_multi_correlation_recovered():
    corr = np.array([[1.0, 0.6], [0.6, 1.0]])
    model = BlackScholesMulti(0.0, rate=0.02, asset_ids=["a", "b"],
                              spots=[100.0, 50.0], volatilities=[0.2, 0.3],
                              correlation_matrix=corr)
    params = model.initial_params()
    states = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [1.0], 200_000, 1, rng.PHASE_MAINSIM)
    logs = np.log(np.asarray(states[0]))
    emp = np.corrcoef(logs.T)
    assert abs(emp[0, 1] - 0.6) < 1e-2


def test_vasicek_exact_moments():
    model = VasicekModel(0.0, rate=0.03, mean=0.05, mean_reversion_speed=0.8, volatility=0.015)
    params = model.initial_params()
    states = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [0.5, 1.0, 5.0], 200_000, 1, rng.PHASE_MAINSIM)
    r = np.asarray(states[:, :, 0])
    a, th, sig, r0 = 0.8, 0.05, 0.015, 0.03
    for idx, t in enumerate([0.5, 1.0, 5.0]):
        mean_expected = th + (r0 - th) * np.exp(-a * t)
        var_expected = sig**2 / (2 * a) * (1 - np.exp(-2 * a * t))
        assert abs(r[idx].mean() - mean_expected) < 4 * np.sqrt(var_expected / 200_000) + 1e-12
        assert abs(r[idx].var() / var_expected - 1.0) < 3e-2


def test_vasicek_numeraire_accumulates():
    model = VasicekModel(0.0, rate=0.03, mean=0.03, mean_reversion_speed=1.0, volatility=0.0001)
    params = model.initial_params()
    states = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [1.0, 2.0], 1000, 50, rng.PHASE_MAINSIM)
    log_b = np.asarray(states[:, :, 1])
    # near-deterministic rate: log_B(t) ~ r*t (left-Riemann)
    assert abs(log_b[0].mean() - 0.03) < 1e-3
    assert abs(log_b[1].mean() - 0.06) < 1e-3


@pytest.mark.parametrize("scheme", [SimulationScheme.EULER, SimulationScheme.QE])
def test_heston_variance_mean_reversion(scheme):
    model = HestonModel(0.0, spot=100.0, rate=0.0, sigma=0.3, rho=-0.7,
                        kappa=2.0, theta=0.09, v0=0.04)
    params = model.initial_params()
    steps = 50 if scheme == SimulationScheme.EULER else 96
    states = simulate_paths(model, params, scheme, [3.0], 100_000, steps, rng.PHASE_MAINSIM)
    v_t = np.asarray(states[0, :, 1])
    # E[v_T] = theta + (v0-theta)e^{-kappa T}
    expected = 0.09 + (0.04 - 0.09) * np.exp(-2.0 * 3.0)
    assert abs(v_t.mean() / expected - 1.0) < 3e-2
    # martingale check on the spot under r=0 (QE carries an O(dt) drift bias
    # with gamma2=0, hence the fine grid here)
    s_t = np.exp(np.asarray(states[0, :, 0]))
    assert abs(s_t.mean() / 100.0 - 1.0) < 1.2e-2


def test_zero_dt_first_point_is_initial_state():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2)
    params = model.initial_params()
    states = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [0.0, 1.0], 1000, 2, rng.PHASE_MAINSIM)
    assert np.allclose(np.asarray(states[0, :, 0]), 100.0)
    assert not np.allclose(np.asarray(states[1, :, 0]), 100.0)


def test_presim_mainsim_streams_differ():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2)
    params = model.initial_params()
    a = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [1.0], 100, 1, rng.PHASE_PRESIM)
    b = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [1.0], 100, 1, rng.PHASE_MAINSIM)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # determinism: same phase -> identical paths
    c = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [1.0], 100, 1, rng.PHASE_PRESIM)
    assert np.allclose(np.asarray(a), np.asarray(c))


def test_gradient_flows_through_engine():
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2)

    def mean_terminal(params):
        states = simulate_paths(model, params, SimulationScheme.ANALYTICAL, [2.0], 20_000, 1, rng.PHASE_MAINSIM)
        return jnp.mean(states[0, :, 0])

    grads = jax.grad(mean_terminal)(model.initial_params())
    # dE[S_T]/dS0 = e^{rT}
    assert abs(float(grads[0]) - np.exp(0.1)) < 2e-2


def test_heston_qe_martingale_correction():
    # Andersen eq.44 correction: spot is a martingale at ANY step size
    # (the plain reference K0 has an O(dt) drift bias — see the 96-step
    # grid needed above).
    model = HestonModel(0.0, spot=100.0, rate=0.0, sigma=0.3, rho=-0.7,
                        kappa=2.0, theta=0.09, v0=0.04,
                        martingale_correction=True)
    params = model.initial_params()
    states = simulate_paths(model, params, SimulationScheme.QE, [3.0], 100_000, 8,
                            rng.PHASE_MAINSIM)
    s_t = np.exp(np.asarray(states[0, :, 0]))
    assert abs(s_t.mean() / 100.0 - 1.0) < 5e-3
