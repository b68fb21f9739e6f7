"""Family-batched executors must reproduce the per-product path exactly.

Same paths, same RNG, same regression math — only the evaluation layout
changes, so PVs agree to float64 roundoff.
"""

import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    AmericanOption,
    AsianAveragingType,
    AsianOption,
    BarrierOption,
    BarrierOptionType,
    BasketOption,
    BasketOptionType,
    BermudanOption,
    BinaryOption,
    BlackScholesMulti,
    Equity,
    EuropeanOption,
    NettingSet,
    OptionType,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)
from montecarlo_risk_engine_tpu.products.flexicall import FlexiCall


def _model():
    corr = np.array([[1.0, 0.35], [0.35, 1.0]])
    return BlackScholesMulti(
        0.0, rate=0.03, asset_ids=["a0", "a1"], spots=[95.0, 102.5],
        volatilities=[0.18, 0.21], correlation_matrix=corr,
    )


def _mixed_book():
    products = []
    for i in range(6):
        a = f"a{i % 2}"
        products.append(EuropeanOption(Equity(a), 0.5 + 0.25 * i, 90.0 + 5 * i,
                                       OptionType.CALL if i % 2 else OptionType.PUT, asset_id=a))
    for i in range(3):
        a = f"a{i % 2}"
        products.append(BinaryOption(0.5 + 0.5 * i, 95.0 + 5 * i, 8.0 + i,
                                     OptionType.CALL if i % 2 else OptionType.PUT, asset_id=a))
    for i in range(3):
        products.append(BasketOption(0.75 + 0.5 * i, ["a0", "a1"], [0.6, 0.4], 95.0 + 2 * i,
                                     OptionType.CALL,
                                     BasketOptionType.GEOMETRIC if i == 1 else BasketOptionType.ARITHMETIC))
    for i in range(3):
        a = f"a{i % 2}"
        products.append(AsianOption(0.0, 1.0 + 0.5 * i, 90.0 + 4 * i, 8, OptionType.CALL,
                                    AsianAveragingType.GEOMETRIC if i == 2 else AsianAveragingType.ARITHMETIC,
                                    asset_id=a))
    for i in range(3):
        a = f"a{i % 2}"
        products.append(BarrierOption(0.0, 1.0 + 0.25 * i, 90.0 + 5 * i, 12,
                                      OptionType.CALL if i % 2 else OptionType.PUT,
                                      125.0 + 5 * i, BarrierOptionType.UPANDOUT, asset_id=a))
    for i in range(3):
        a = f"a{i % 2}"
        products.append(BermudanOption(Equity(a), [0.5, 1.0, 1.5], 95.0 + 5 * i,
                                       OptionType.PUT if i % 2 else OptionType.CALL, asset_id=a))
    for i in range(2):
        a = f"a{i % 2}"
        unds = [EuropeanOption(Equity(a), t, 92.0 + 4 * i, OptionType.CALL, asset_id=a)
                for t in (0.5, 1.0, 1.5)]
        products.append(FlexiCall(unds, num_exercise_rights=1 + i, asset_id=a))
    for i in range(2):
        a = f"a{i % 2}"
        products.append(AmericanOption(Equity(a), 1.0, 7, 95.0 + 5 * i, OptionType.PUT, asset_id=a))
    return products


def _run(batch_products):
    products = _mixed_book()
    n = len(products)
    ns1 = NettingSet(name="book_a", products=products[: n // 2])
    ns2 = NettingSet(name="book_b", products=products[n // 2 :])
    controller = SimulationController(
        netting_sets=[ns1, ns2],
        model=_model(),
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=2048,
        num_paths_presim=2048,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        batch_products=batch_products,
    )
    results = controller.run_simulation()
    return (
        float(results.get_results("book_a", "pv", evaluation_idx=0)),
        float(results.get_results("book_b", "pv", evaluation_idx=0)),
        controller,
    )


def test_batched_matches_per_product():
    pv_a_batched, pv_b_batched, controller = _run(True)
    # every product family in the book is covered by a batch
    assert len(controller._batched_ids) == len(controller.products)
    pv_a_plain, pv_b_plain, _ = _run(False)
    assert pv_a_batched == pytest.approx(pv_a_plain, rel=1e-10)
    assert pv_b_batched == pytest.approx(pv_b_plain, rel=1e-10)


def _run_exposure(batch_products, metrics_fn):
    from montecarlo_risk_engine_tpu import CEMetric, EPEMetric, PFEMetric

    products = _mixed_book()
    n = len(products)
    ns1 = NettingSet(name="book_a", products=products[: n // 2])
    ns2 = NettingSet(name="book_b", products=products[n // 2 :])
    controller = SimulationController(
        netting_sets=[ns1, ns2],
        model=_model(),
        risk_metrics=RiskMetrics(
            metrics=metrics_fn(),
            exposure_timeline=np.linspace(0.0, 2.0, 7),
        ),
        num_paths_mainsim=1024,
        num_paths_presim=1024,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        batch_products=batch_products,
    )
    results = controller.run_simulation()
    return results, controller


@pytest.mark.slow
def test_batched_exposure_regression_matches_per_product():
    from montecarlo_risk_engine_tpu import CEMetric, EPEMetric, PFEMetric

    # CE in the metric set disables the analytic-exposure shortcut
    # (controller.py:211-216), forcing the regression pipeline everywhere.
    metrics = lambda: [EPEMetric(), PFEMetric(0.95), CEMetric()]
    batched, controller = _run_exposure(True, metrics)
    assert len(controller._batched_ids) == len(controller.products)
    plain, _ = _run_exposure(False, metrics)
    for metric in ("epe", "pfe[0.95]", "ce"):
        for ns in ("book_a", "book_b"):
            np.testing.assert_allclose(
                batched.get_results(ns, metric),
                plain.get_results(ns, metric),
                rtol=1e-8, atol=1e-10,
            )


@pytest.mark.slow
def test_batched_exposure_analytic_matches_per_product():
    from montecarlo_risk_engine_tpu import EPEMetric, PFEMetric

    # EPE/PFE only: Europeans take the batched *analytic* exposure path while
    # the rest of the book regresses.
    metrics = lambda: [EPEMetric(), PFEMetric(0.95)]
    batched, controller = _run_exposure(True, metrics)
    plain, _ = _run_exposure(False, metrics)
    for metric in ("epe", "pfe[0.95]"):
        for ns in ("book_a", "book_b"):
            np.testing.assert_allclose(
                batched.get_results(ns, metric),
                plain.get_results(ns, metric),
                rtol=1e-8, atol=1e-10,
            )


def test_segmented_cashflows_chunked_equals_dense(monkeypatch):
    """Product-chunked cashflow accumulation (TerminalBatch.segmented_cashflows)
    is bit-identical to the dense [P, N] path — the chunking only bounds the
    payoff-matrix temp (a 10k-option x 1M-path book is 40GB dense)."""
    from montecarlo_risk_engine_tpu.api.batching import TerminalBatch

    asset_ids = ["a0", "a1"]
    corr = np.array([[1.0, 0.3], [0.3, 1.0]])

    def run():
        model = BlackScholesMulti(0.0, rate=0.03, asset_ids=asset_ids,
                                  spots=[100.0, 95.0],
                                  volatilities=[0.2, 0.25],
                                  correlation_matrix=corr)
        prods = [
            EuropeanOption(Equity(asset_ids[i % 2]), 1.0 + 0.25 * (i % 4),
                           90.0 + 5 * (i % 5),
                           OptionType.CALL if i % 2 else OptionType.PUT,
                           asset_id=asset_ids[i % 2])
            for i in range(37)
        ]
        c = SimulationController(
            netting_sets=[NettingSet(name="book", products=prods)],
            model=model, risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=4096, num_paths_presim=0, num_steps=1,
            simulation_scheme=SimulationScheme.ANALYTICAL,
        )
        return float(c.run_simulation().get_results("book", "pv", evaluation_idx=0))

    pv_dense = run()
    monkeypatch.setattr(TerminalBatch, "CASHFLOW_CHUNK_BYTES", 4096 * 8 * 5)
    pv_chunked = run()
    assert pv_dense == pv_chunked


def test_european_hinge_sum_equals_dense_payoffs():
    """The sorted-strike hinge-sum cashflow path (O(groups x N)) matches the
    dense [P, N] payoff matrix to float precision across netting sets,
    calls/puts and maturities."""
    from montecarlo_risk_engine_tpu.api.batching import EuropeanEquityBatch

    asset_ids = ["a0", "a1"]
    corr = np.array([[1.0, 0.3], [0.3, 1.0]])

    def run():
        model = BlackScholesMulti(0.0, rate=0.03, asset_ids=asset_ids,
                                  spots=[100.0, 95.0],
                                  volatilities=[0.2, 0.25],
                                  correlation_matrix=corr)
        prods1 = [
            EuropeanOption(Equity(asset_ids[i % 2]), 1.0 + 0.25 * (i % 4),
                           85.0 + 2.5 * (i % 12),
                           OptionType.CALL if i % 3 else OptionType.PUT,
                           asset_id=asset_ids[i % 2])
            for i in range(140)
        ]
        prods2 = [
            EuropeanOption(Equity(asset_ids[i % 2]), 1.5, 100.0 + i,
                           OptionType.PUT, asset_id=asset_ids[i % 2])
            for i in range(60)
        ]
        c = SimulationController(
            netting_sets=[NettingSet(name="b1", products=prods1),
                          NettingSet(name="b2", products=prods2)],
            model=model, risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=8192, num_paths_presim=0, num_steps=1,
            simulation_scheme=SimulationScheme.ANALYTICAL,
        )
        r = c.run_simulation()
        return [float(r.get_results(n, "pv", evaluation_idx=0))
                for n in ("b1", "b2")]

    dense = run()
    old_bytes = EuropeanEquityBatch.CASHFLOW_CHUNK_BYTES
    # shrink the dense-temp budget so the hinge-sum branch engages
    EuropeanEquityBatch.CASHFLOW_CHUNK_BYTES = 0
    try:
        hinge = run()
    finally:
        EuropeanEquityBatch.CASHFLOW_CHUNK_BYTES = old_bytes
    for a, b in zip(hinge, dense):
        assert abs(a - b) < 1e-9 * max(1.0, abs(a)), (a, b)


def test_binary_piecewise_linear_equals_dense_payoffs():
    """The digital piecewise-linear cashflow path (two searchsorteds +
    payment prefix sums) matches the dense fuzzy payoff matrix."""
    from montecarlo_risk_engine_tpu import BinaryOption, BlackScholesModel
    from montecarlo_risk_engine_tpu.api.batching import BinaryBatch

    def run():
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.25,
                                  asset_id="eq")
        prods = [
            BinaryOption(1.0 + 0.5 * (i % 3), 80.0 + 0.37 * i,
                         payment_amount=5.0 + (i % 7),
                         option_type=OptionType.CALL if i % 3 else OptionType.PUT,
                         asset_id="eq")
            for i in range(120)
        ]
        c = SimulationController(
            netting_sets=[NettingSet(name="dig", products=prods)],
            model=model, risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=8192, num_paths_presim=0, num_steps=1,
            simulation_scheme=SimulationScheme.ANALYTICAL,
        )
        return float(c.run_simulation().get_results("dig", "pv",
                                                    evaluation_idx=0))

    dense = run()
    old = BinaryBatch.CASHFLOW_CHUNK_BYTES
    BinaryBatch.CASHFLOW_CHUNK_BYTES = 0
    try:
        pw = run()
    finally:
        BinaryBatch.CASHFLOW_CHUNK_BYTES = old
    assert abs(dense - pw) < 1e-9 * max(1.0, abs(dense)), (dense, pw)


def test_analytic_exposure_chunked_equals_single_chunk(monkeypatch):
    """The analytic European exposure path chunks its per-date [Pa, N] price
    block through a nested lax.scan — profiles identical to the one-chunk
    evaluation."""
    from montecarlo_risk_engine_tpu import BlackScholesModel, EPEMetric, PFEMetric
    from montecarlo_risk_engine_tpu.api.batching import EuropeanEquityBatch

    def run():
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                                  asset_id="eq")
        prods = [
            EuropeanOption(Equity("eq"), 1.5 + 0.25 * (i % 4),
                           90.0 + 3 * (i % 7),
                           OptionType.CALL if i % 2 else OptionType.PUT,
                           asset_id="eq")
            for i in range(23)
        ]
        c = SimulationController(
            netting_sets=[NettingSet(name="book", products=prods)],
            model=model,
            risk_metrics=RiskMetrics(metrics=[EPEMetric(), PFEMetric(0.95)],
                                     exposure_timeline=[0.5, 1.0, 1.4]),
            num_paths_mainsim=8192, num_paths_presim=0, num_steps=1,
            simulation_scheme=SimulationScheme.ANALYTICAL,
        )
        r = c.run_simulation()
        return [float(r.get_results("book", m, evaluation_idx=i))
                for m in ("epe", "pfe[0.95]") for i in range(3)]

    base = run()
    monkeypatch.setattr(EuropeanEquityBatch, "CASHFLOW_CHUNK_BYTES", 8192 * 8 * 4)
    chunked = run()
    for a, b in zip(base, chunked):
        assert abs(a - b) < 1e-9 * max(1.0, abs(a)), (a, b)


def test_coupon_batch_pv_matches_per_product():
    """CouponBatch cashflows (fixed bond, FRN, payer/receiver swaps) must
    reproduce the per-product compute_normalized_cashflows path to roundoff
    — identical event amounts, LIBOR rows and numeraire deflation."""
    from montecarlo_risk_engine_tpu import Bond, InterestRateSwap, IRSType, VasicekModel

    def build(batch):
        model = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                             volatility=0.012, asset_id="r")
        prods = [
            Bond(0.0, 2.0, notional=100.0, tenor=0.5, pays_notional=True,
                 fixed_rate=0.04, asset_id="r"),
            Bond(0.0, 1.75, notional=50.0, tenor=0.5, pays_notional=True,
                 fixed_rate=None, asset_id="r"),   # FRN with stub
            InterestRateSwap(0.0, 2.0, notional=10.0, fixed_rate=0.03,
                             tenor_fixed=0.5, tenor_float=0.25,
                             irs_type=IRSType.PAYER, asset_id="r"),
            InterestRateSwap(0.0, 1.5, notional=10.0, fixed_rate=0.035,
                             tenor_fixed=0.75, tenor_float=0.5,
                             irs_type=IRSType.RECEIVER, asset_id="r"),
        ]
        return SimulationController(
            netting_sets=[NettingSet(name="ns", products=prods)],
            model=model,
            risk_metrics=RiskMetrics(metrics=[PVMetric()]),
            num_paths_mainsim=4096, num_paths_presim=0, num_steps=1,
            simulation_scheme=SimulationScheme.EULER,
            batch_products=batch,
        )

    c_b = build(True)
    from montecarlo_risk_engine_tpu.api.batching import CouponBatch
    assert any(isinstance(b, CouponBatch) for b in c_b._batches)
    r_b = c_b.run_simulation()
    r_p = build(False).run_simulation()
    pv_b = float(r_b.get_results("ns", "pv", evaluation_idx=0))
    pv_p = float(r_p.get_results("ns", "pv", evaluation_idx=0))
    np.testing.assert_allclose(pv_b, pv_p, rtol=1e-12)
    np.testing.assert_allclose(
        float(r_b.get_mc_error("ns", "pv", evaluation_idx=0)),
        float(r_p.get_mc_error("ns", "pv", evaluation_idx=0)), rtol=1e-10)


def test_coupon_batch_exposure_and_cva_match_per_product():
    """Coupon exposure regression (future-cashflow sweep) vs the per-product
    backward-induction fit: same targets, same basis — only the Gram
    conditioning differs (RMS power sums vs per-column equilibration), so
    exposures agree to fit tolerance and CVA/EPE to well inside MC error."""
    from montecarlo_risk_engine_tpu import (
        Bond, CIRPPModel, CVAMetric, EPEMetric, InterestRateSwap, IRSType,
        ModelConfig, VasicekModel,
    )

    hazards = {1.0: 0.01, 3.0: 0.015, 5.0: 0.02}
    cp = "cp"

    def build(batch):
        rates = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                             volatility=0.012, asset_id="r")
        credit = CIRPPModel(0.0, asset_id=cp, hazard_rates=hazards, kappa=0.1,
                            theta=0.01, volatility=0.02, y0=0.0001)
        model = ModelConfig([rates, credit],
                            inter_asset_correlation_matrix=[np.array([[0.25]])])
        prods = [
            InterestRateSwap(0.0, 2.0, notional=1.0, fixed_rate=0.03,
                             tenor_fixed=0.5, tenor_float=0.5,
                             irs_type=IRSType.PAYER, asset_id="r"),
            Bond(0.0, 2.0, notional=1.0, tenor=0.5, pays_notional=True,
                 fixed_rate=0.04, asset_id="r"),
        ]
        return SimulationController(
            netting_sets=[NettingSet(name="ns", products=prods, counterparty_id=cp)],
            model=model,
            risk_metrics=RiskMetrics(
                metrics=[CVAMetric(counterparty_id=cp, recovery_rate=0.4),
                         EPEMetric()],
                exposure_timeline=np.linspace(0.0, 2.0, 5)),
            num_paths_mainsim=16384, num_paths_presim=16384, num_steps=1,
            simulation_scheme=SimulationScheme.EULER,
            batch_products=batch,
        )

    r_b = build(True).run_simulation()
    r_p = build(False).run_simulation()
    for i in range(5):
        a = float(r_b.get_results("ns", "epe", evaluation_idx=i))
        b = float(r_p.get_results("ns", "epe", evaluation_idx=i))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)
    cva_b = float(r_b.get_results("ns", "cva[cp]", evaluation_idx=0))
    cva_p = float(r_p.get_results("ns", "cva[cp]", evaluation_idx=0))
    np.testing.assert_allclose(cva_b, cva_p, rtol=1e-4, atol=1e-9)
