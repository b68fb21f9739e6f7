"""Saved-plot smoke tests for the example/validation scripts.

Counterpart of the reference's runnable demo scripts (tests/exposure_tests/,
tests/pv_tests/ — SURVEY.md §4 tier 2): each example runs end-to-end at tiny
path counts and saves its PNG artifact (VERDICT r1 missing item #7).
"""

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
sys.path.insert(0, EXAMPLES_DIR)


def _run_example(module_name, **kwargs):
    mod = importlib.import_module(module_name)
    return mod.main(**kwargs)


@pytest.mark.parametrize("module_name", [
    "ee_pfe_bermudan_swaption",
    "ee_pfe_swap_collateralized",
    "ee_pfe_storage",
    "ee_pfe_european_vs_analytic",
    "ee_pfe_american_equity_option",
    "ee_pfe_bermudan_equity_option",
    "ee_pfe_bermudan_bond_option",
    "ee_pfe_barrier_option",
    "ee_pfe_binary_option",
    "ee_pfe_bond",
    "ee_pfe_flexicall",
    "ee_pfe_swaption",
    "eepe_simulation",
    "storage_volume_constraints",
    "storage_volume_over_time",
])
def test_profile_example_saves_plot(module_name):
    path = _run_example(module_name, num_paths=512, save_plot=True)
    assert path is not None and os.path.exists(path)
    assert os.path.getsize(path) > 5_000  # a real rendered PNG


@pytest.mark.parametrize("module_name", [
    "pv_european_option",
    "pv_binary_option",
    "pv_barrier_option",
    "pv_bermudan_option",
    "pv_european_bond_option",
    "cirpp_scenarios_vs_deterministic_hazard",
])
def test_pv_example_saves_plot(module_name):
    path = _run_example(module_name, num_paths=2048, save_plot=True)
    assert path is not None and os.path.exists(path)
    assert os.path.getsize(path) > 5_000


def test_basket_control_variate_example():
    out = _run_example("pv_basket_option", num_paths=4096)
    assert out["se_cv"] < out["se_plain"]


@pytest.mark.slow
def test_storage_pv_example():
    path = _run_example("pv_storage", num_paths=2048, save_plot=True)
    assert path is not None and os.path.exists(path)


@pytest.mark.slow
def test_cva_corporate_bond_example():
    path = _run_example("cva_corporate_bond", num_paths=4096, save_plot=True)
    assert path is not None and os.path.exists(path)


def test_lsm_convergence_study_example():
    """VERDICT r3 #10: the american_style_options.ipynb counterpart — the
    degree x path-count LSM sweep runs end-to-end against the CRR oracle
    and saves its plot."""
    path = _run_example("lsm_convergence_study", num_paths=2048,
                        degrees=(1, 2), save_plot=True)
    assert path is not None and os.path.exists(path)
    assert os.path.getsize(path) > 5_000


def test_second_derivatives_example():
    gamma, vomma = _run_example("pv_second_derivatives", num_paths=256)
    assert gamma > 0.0 and vomma > 0.0


def test_heston_convergence_example_fast():
    path = _run_example(
        "pv_heston_convergence", num_paths=4096, save_plot=True, steps=(1, 4)
    )
    assert path is not None and os.path.exists(path)


def test_sobol_convergence_example_fast():
    path, errors = _run_example(
        "pv_sobol_convergence", save_plot=True, path_counts=(1024, 8192)
    )
    assert path is not None and os.path.exists(path)
    # the QMC error should beat pseudo at the larger count
    assert errors["scrambled Sobol"][-1] < errors["pseudo (threefry)"][-1]


def test_sabr_calibration_example():
    """SABR leg of the implied-vol calibration study (round-4 verdict #8):
    the per-maturity Hagan fits must recover the generating (alpha, rho, nu)
    and reprice the synthetic smile to < 1e-8 vol points."""
    results = _run_example("sabr_calibration", verbose=False)
    for maturity, r in results.items():
        true = r["true"]
        fit = r["fit"]
        assert r["max_vol_err"] < 1e-8, (maturity, r)
        for t, f in zip(true, fit):
            assert abs(t - f) < 5e-3 * max(1.0, abs(t)), (maturity, true, fit)
