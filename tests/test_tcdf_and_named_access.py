"""t-CDF custom-derivative function + SimulationResults named-access API.

Mirrors reference tests/pytests/test_t_cdf_autograd.py:53-139 and
test_simulation_results_named_access.py:17-95.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special
import scipy.stats

from montecarlo_risk_engine_tpu.utils.special import t_cdf, t_pdf
from montecarlo_risk_engine_tpu.api.results import SimulationResults


def test_t_cdf_matches_scipy():
    xs = np.linspace(-4.0, 4.0, 41)
    for df in (2.0, 5.0, 11.5):
        ours = np.asarray(t_cdf(jnp.asarray(xs), df))
        ref = scipy.special.stdtr(df, xs)
        assert np.allclose(ours, ref, atol=1e-10)


def test_t_cdf_gradient_is_pdf():
    xs = np.linspace(-3.0, 3.0, 13)
    df = 4.0
    grad_fn = jax.vmap(jax.grad(lambda x: t_cdf(x, df)))
    grads = np.asarray(grad_fn(jnp.asarray(xs)))
    ref_pdf = scipy.stats.t.pdf(xs, df)
    assert np.allclose(grads, ref_pdf, atol=1e-10)
    # finite-difference cross-check
    eps = 1e-6
    fd = (scipy.special.stdtr(df, xs + eps) - scipy.special.stdtr(df, xs - eps)) / (2 * eps)
    assert np.allclose(grads, fd, atol=1e-6)


def _results_fixture():
    results = [
        [  # netting set 0
            [(1.0, 0.1)],          # pv
            [(2.0, 0.2), (3.0, 0.3)],  # epe (2 dates)
        ],
        [
            [(4.0, 0.4)],
            [(5.0, 0.5), (6.0, 0.6)],
        ],
    ]
    derivatives = [
        [[(10.0, 11.0)], [(20.0, 21.0), (30.0, 31.0)]],
        [[(40.0, 41.0)], [(50.0, 51.0), (60.0, 61.0)]],
    ]
    return SimulationResults(
        results,
        derivatives,
        [],
        netting_set_names=["Alpha", "Beta"],
        metric_names=["pv", "epe"],
        model_param_names=["spot", "volatility"],
    )


def test_named_access_and_uniquified_duplicates():
    # duplicate netting-set names are uniquified upstream by the controller
    # (controller.py:189-202); here we emulate that behaviour on the container
    res = SimulationResults(
        [[[(1.0, 0.0)]], [[(2.0, 0.0)]]],
        [],
        [],
        netting_set_names=["ns", "ns#2"],
        metric_names=["pv"],
    )
    assert float(res.get_results("ns", "pv", evaluation_idx=0)) == 1.0
    assert float(res.get_results("NS#2", "pv", evaluation_idx=0)) == 2.0  # case-insensitive
    with pytest.raises(KeyError):
        res.get_results("nope", "pv")


def test_legacy_kwarg_aliases():
    res = _results_fixture()
    np.testing.assert_allclose(res.get_results(prod_idx=0, metric_idx=1), [2.0, 3.0])
    np.testing.assert_allclose(res.get_mc_error(product=0, metric=1), [0.2, 0.3])
    with pytest.raises(TypeError):
        res.get_results(0, 0, bogus_kwarg=1)


def test_derivative_named_access():
    res = _results_fixture()
    d = res.get_derivatives("alpha", "epe", evaluation_idx=1)
    assert d == {"spot": 30.0, "volatility": 31.0}
    np.testing.assert_allclose(res.get_derivatives("alpha", "epe", param="spot"), [20.0, 30.0])
    assert res.get_derivatives("beta", "pv", param="volatility")[0] == 41.0
