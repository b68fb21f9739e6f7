"""EEPE of a payer swap: the time-averaged expected exposure scalar.

Counterpart of reference tests/exposure_tests/eepe_simulation.py: EEPE is the
plain time-average of the EE profile (reference eepe_metric.py:11-16 — quirk
Q6: no regulatory running-max step, preserved deliberately); overlays the EE
profile with the EEPE level line.

Run: python examples/eepe_simulation.py
"""

from _common import (print_profile_table, profile, run_exposure_book,
                     save_profile_plot, vasicek_model)

import numpy as np

from montecarlo_risk_engine_tpu import (
    EEPEMetric,
    EPEMetric,
    InterestRateSwap,
    IRSType,
)


def main(num_paths=50_000, save_plot=True):
    model = vasicek_model()
    swap = InterestRateSwap(0.0, 5.0, notional=100.0, fixed_rate=0.032,
                            tenor_fixed=0.5, tenor_float=0.5,
                            irs_type=IRSType.PAYER, asset_id="irs")
    timeline = np.linspace(0.25, 4.75, 19)
    results = run_exposure_book(
        model, [swap], timeline, metrics=[EPEMetric(), EEPEMetric()],
        num_paths=num_paths, num_steps=2, ns_name="swap",
    )
    n = len(timeline)
    ee = profile(results, "swap", "epe", n)
    eepe = float(results.get_results("swap", "eepe", evaluation_idx=0))
    curves = {"EE": ee, "EEPE (time average)": np.full(n, eepe)}
    print_profile_table(timeline, curves)
    assert abs(eepe - ee.mean()) < 1e-8 * max(1.0, abs(eepe)), (eepe, ee.mean())
    if save_plot:
        path = save_profile_plot(
            "eepe_simulation.png", timeline, curves,
            "Payer swap — EE profile and its EEPE time-average",
        )
        print(f"saved {path}")
        return path
    return eepe


if __name__ == "__main__":
    main()
