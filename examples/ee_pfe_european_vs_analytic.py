"""European-option exposure: LSM regression profile vs the analytic profile.

Counterpart of reference tests/exposure_tests/ee_pfe_european_option.py: the
discounted EE of a European call is flat at the forward option value before
maturity; overlays the regression-based profile against the closed-form
discounted-exposure fast path (european_option.py:123-145 counterpart).

Run: python examples/ee_pfe_european_vs_analytic.py
"""

from _common import print_profile_table, profile, save_profile_plot

import numpy as np

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


def run(num_paths, force_regression):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    option = EuropeanOption(Equity("eq"), 3.0, 100.0, OptionType.CALL, asset_id="eq")
    timeline = np.linspace(0.25, 2.75, 11)
    metrics = [EPEMetric(), PFEMetric(0.95)]
    kwargs = {}
    if force_regression:
        # disable the family batch so the generic LSM executor runs
        kwargs["batch_products"] = False
    controller = SimulationController(
        netting_sets=[NettingSet(name="opt", products=[option])],
        model=model,
        risk_metrics=RiskMetrics(metrics=metrics, exposure_timeline=timeline),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        **kwargs,
    )
    return timeline, controller.run_simulation()


def main(num_paths=50_000, save_plot=True):
    timeline, r_analytic = run(num_paths, force_regression=False)
    _, r_lsm = run(num_paths, force_regression=True)
    n = len(timeline)
    curves = {
        "EE analytic fast path": profile(r_analytic, "opt", "epe", n),
        "EE LSM regression": profile(r_lsm, "opt", "epe", n),
        "PFE95 analytic": profile(r_analytic, "opt", "pfe[0.95]", n),
        "PFE95 LSM": profile(r_lsm, "opt", "pfe[0.95]", n),
    }
    print_profile_table(timeline, curves)
    if save_plot:
        path = save_profile_plot(
            "ee_pfe_european_vs_analytic.png", timeline, curves,
            "European call exposure — analytic vs LSM (Black-Scholes)",
        )
        print(f"saved {path}")
        return path
    return None


if __name__ == "__main__":
    main()
