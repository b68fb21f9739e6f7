"""Streaming observable engine vs the materialised state plane.

The streaming engine resolves requests INSIDE the path scan from the static
emission schedule and emits only [rows, N] observables — the O(paths x
observable-slots) memory contract of SURVEY.md §5.7, replacing the
reference's materialise-then-slice plane (reference src/engine/engine.py:63,
src/request_interface/request_interface.py:115-130).  These tests pin the
two modes to float-level agreement through every pipeline layer: batched
terminal families, batched exercise LSM, the per-product executors, netting
with MPoR collateral, CVA with hybrid credit, AAD, and the sharded mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    AsianOption,
    BarrierOption,
    BarrierOptionType,
    BermudanOption,
    BinaryOption,
    BlackScholesModel,
    BlackScholesMulti,
    CIRPPModel,
    CVAMetric,
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
from montecarlo_risk_engine_tpu import rng
from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
from montecarlo_risk_engine_tpu.requests import RequestPlan


def _controller(streaming, products, model, metrics, exposure_timeline=None,
                counterparty=None, mpor=0.0, **kw):
    ns = NettingSet(
        name="book", products=products, counterparty_id=counterparty,
        margin_period_of_risk=mpor,
    )
    return SimulationController(
        netting_sets=[ns], model=model,
        risk_metrics=RiskMetrics(metrics=metrics, exposure_timeline=exposure_timeline),
        num_paths_mainsim=kw.pop("num_paths", 512),
        num_paths_presim=kw.pop("num_paths_presim", 512),
        num_steps=kw.pop("num_steps", 1),
        simulation_scheme=kw.pop("scheme", SimulationScheme.ANALYTICAL),
        streaming=streaming, **kw,
    )


def _compare(make, metrics_and_counts, grads=False, tol=1e-11):
    r_plane = make(False).run_simulation()
    r_stream = make(True).run_simulation()
    for metric, n in metrics_and_counts:
        for i in range(n):
            a = float(r_plane.get_results("book", metric, evaluation_idx=i))
            b = float(r_stream.get_results("book", metric, evaluation_idx=i))
            assert abs(a - b) <= tol * max(1.0, abs(a)), (metric, i, a, b)
            ea = float(r_plane.get_mc_error("book", metric, evaluation_idx=i))
            eb = float(r_stream.get_mc_error("book", metric, evaluation_idx=i))
            assert abs(ea - eb) <= tol * max(1.0, abs(ea))
            if grads:
                ga = r_plane.get_derivatives("book", metric, evaluation_idx=i)
                gb = r_stream.get_derivatives("book", metric, evaluation_idx=i)
                for k in ga:
                    assert abs(ga[k] - gb[k]) <= 1e-8 * max(1.0, abs(ga[k])), (
                        metric, i, k, ga[k], gb[k],
                    )


def test_engine_emissions_match_plane_resolution():
    """Engine-level oracle: streamed emissions == resolve on the plane."""
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    params = model.initial_params()
    option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL, asset_id="eq")
    timeline = (0.5, 1.0, 2.0)

    plan = RequestPlan(model)
    plan.collect_and_index_requests([option], timeline, {}, ())
    schedule = plan.build_emission_schedule(len(timeline))

    model.set_state_layout(False)
    _, emissions = simulate_paths(
        model, params, SimulationScheme.ANALYTICAL, timeline, 256, 1,
        rng.PHASE_MAINSIM, emit_schedule=schedule, collect_states=False,
    )
    resolved_stream = plan.resolve_from_emissions(schedule, emissions)

    model.set_state_layout(True)
    states = simulate_paths(
        model, params, SimulationScheme.ANALYTICAL, timeline, 256, 1,
        rng.PHASE_MAINSIM, transpose_states=True,
    )
    resolved_plane = plan.resolve_requests(params, states)

    assert len(resolved_stream[0]) == len(resolved_plane[0])
    for h, (a, b) in enumerate(zip(resolved_plane[0], resolved_stream[0])):
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(a), (256,)),
            np.broadcast_to(np.asarray(b), (256,)),
            rtol=1e-13, err_msg=f"handle {h}",
        )
    for a, b in zip(resolved_plane[1], resolved_stream[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-13)


def test_streaming_mixed_terminal_book_pv():
    """Batched European/Binary/Asian/Barrier/Basket families, PV + AAD."""
    from montecarlo_risk_engine_tpu import BasketOption

    model = BlackScholesMulti(
        0.0, rate=0.03, asset_ids=["a1", "a2"], spots=[100.0, 90.0],
        volatilities=[0.2, 0.3],
        correlation_matrix=np.array([[1.0, 0.4], [0.4, 1.0]]),
    )
    products = [
        EuropeanOption(Equity("a1"), 1.0, 100.0, OptionType.CALL, asset_id="a1"),
        EuropeanOption(Equity("a2"), 1.0, 85.0, OptionType.PUT, asset_id="a2"),
        BinaryOption(1.0, 100.0, 10.0, OptionType.CALL, asset_id="a1"),
        AsianOption(0.25, 1.0, 95.0, 4, OptionType.CALL, asset_id="a1"),
        BarrierOption(
            0.0, 1.0, 100.0, 4, OptionType.CALL, 130.0,
            BarrierOptionType.UPANDOUT, asset_id="a1",
        ),
        BasketOption(1.0, ["a1", "a2"], [0.5, 0.5], 95.0, OptionType.CALL),
    ]

    def make(streaming):
        return _controller(
            streaming, products, model, [PVMetric()], differentiate=True,
        )

    _compare(make, [("pv", 1)], grads=True)


@pytest.mark.slow
def test_streaming_exercise_and_exposure_book():
    """Bermudan LSM + swap exposure profiles + MPoR collateral + CVA."""
    hazards = {1.0: 0.02, 3.0: 0.025, 5.0: 0.03}

    def make(streaming):
        rates = VasicekModel(0.0, rate=0.03, mean=0.04, mean_reversion_speed=0.5,
                             volatility=0.01, asset_id="irs")
        equity = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
        credit = CIRPPModel(0.0, asset_id="cp", hazard_rates=hazards, kappa=0.1,
                            theta=0.01, volatility=0.02, y0=0.0001)
        model = ModelConfig(
            [rates, equity, credit],
            inter_asset_correlation_matrix=[
                np.array([[0.3]]), np.array([[0.5]]), np.array([[0.2]]),
            ],
        )
        swap = InterestRateSwap(0.0, 2.0, notional=1.0, fixed_rate=0.03,
                                tenor_fixed=0.5, tenor_float=0.5,
                                irs_type=IRSType.PAYER, asset_id="irs")
        bermudan = BermudanOption(Equity("eq"), [0.5, 1.0, 1.5], 100.0,
                                  OptionType.PUT, asset_id="eq")
        return _controller(
            streaming, [swap, bermudan], model,
            [CVAMetric(counterparty_id="cp", recovery_rate=0.4), EPEMetric(),
             PFEMetric(0.95)],
            exposure_timeline=np.linspace(0.0, 2.0, 5),
            counterparty="cp", mpor=0.25, scheme=SimulationScheme.EULER,
            num_steps=2, differentiate=True,
        )

    _compare(make, [("cva[cp]", 1), ("epe", 5), ("pfe[0.95]", 5)], grads=True)


def test_streaming_sharded_equals_unsharded_plane():
    """Streaming on the 8-device mesh == plane mode unsharded, bit-for-bit
    RNG (device-count-independent draws)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    model_args = dict(spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")

    def make(streaming, sharded=False):
        model = BlackScholesModel(0.0, **model_args)
        option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                                asset_id="eq")
        kw = {}
        if sharded:
            mesh = Mesh(np.array(jax.devices()), ("paths",))
            kw["path_sharding"] = NamedSharding(mesh, PartitionSpec("paths"))
        return _controller(
            streaming, [option], model, [PVMetric(), EPEMetric()],
            exposure_timeline=[0.5, 1.0, 1.5], num_paths=1024,
            num_paths_presim=1024, **kw,
        )

    r_plane = make(False).run_simulation()
    r_sharded = make(True, sharded=True).run_simulation()
    for metric, n in (("pv", 1), ("epe", 3)):
        for i in range(n):
            a = float(r_plane.get_results("book", metric, evaluation_idx=i))
            b = float(r_sharded.get_results("book", metric, evaluation_idx=i))
            assert abs(a - b) <= 1e-11 * max(1.0, abs(a)), (metric, i, a, b)


def test_streaming_auto_picks_by_memory_estimate(monkeypatch):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL, asset_id="eq")
    # small book: plane mode (faster warm — measured on v5e)
    c = _controller("auto", [option], model, [PVMetric()], num_paths=64,
                    num_paths_presim=64)
    c.run_simulation()
    assert c._emission_schedule is None
    # same book over the HBM-scale threshold: streaming
    model2 = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    option2 = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL, asset_id="eq")
    c2 = _controller("auto", [option2], model2, [PVMetric()], num_paths=128,
                     num_paths_presim=128)
    monkeypatch.setattr(SimulationController, "STREAMING_AUTO_THRESHOLD_BYTES", 0)
    c2.run_simulation()
    assert c2._emission_schedule is not None


def test_engine_path_jacobian_chunk_gate(monkeypatch):
    """Round-4 hardware finding: the XLA-engine differentiated fallback ran
    the user's grad_chunk_size ungated — 2M paths x 29 dates at the default
    chunk 8 compiled to a 64.2GB peak on a 15.75GB v5e (AOT OOM) while
    chunk 1 fits and runs.  The gate must cap the effective chunk using the
    calibrated peak model when the device memory is known."""
    import jax as _jax

    from montecarlo_risk_engine_tpu import rng  # noqa: F401  (import order)

    def build(num_paths):
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                                  asset_id="eq")
        option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                                asset_id="eq")
        return _controller("auto", [option], model, [PVMetric(), EPEMetric()],
                           exposure_timeline=[0.5, 1.0, 1.5, 2.0],
                           num_paths=num_paths, num_paths_presim=0,
                           differentiate=True, grad_chunk_size=8)

    monkeypatch.setattr(SimulationController, "_device_hbm_bytes",
                        lambda self: 16 << 30)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    # pin the engine fallback (the path under test); kernel eligibility has
    # its own gates covered by the TPU suites
    monkeypatch.setattr(SimulationController, "_decide_pallas",
                        lambda self: False)

    from montecarlo_risk_engine_tpu.requests import RequestPlan

    def decide(c):
        c._plan = RequestPlan(c.model)
        c._plan.collect_and_index_requests(
            c.products, c.simulation_timeline, c._get_requests(),
            c.metric_exposure_timeline)
        c._decide_streaming()
        return c._grad_chunk_effective

    # plane model: peak = 2 * plane * (2 + 1.4*(1+2c)); plane bytes here are
    # T(5 timeline points) x 1 state dim x N x 8 (f64 test env)
    big = build(60_000_000)   # plane 2.4GB -> only chunk 1 fits 16GB
    assert decide(big) == 1
    small = build(1_000_000)  # plane 40MB -> the user's chunk 8 stands
    assert decide(small) == 8


def test_streaming_auto_amplifies_for_hessian(monkeypatch):
    """Differentiated/Hessian runs multiply the plane estimate (jacfwd
    tangent temps, Hessian outer vmap over params) — the same book that
    stays on the plane forward-only must stream once the AD-amplified
    estimate crosses the budget (the 100k-path Hessian OOM, BENCH_NOTES
    round 2)."""
    def build(differentiate, hessian):
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                                  asset_id="eq")
        option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                                asset_id="eq")
        c = _controller("auto", [option], model, [PVMetric()], num_paths=64,
                        num_paths_presim=64, differentiate=differentiate)
        if hessian:
            c.compute_higher_derivatives()
        return c

    # budget chosen between the plain estimate and the 13 x params-amplified
    # Hessian estimate for this tiny book
    plane_bytes = 64 * 8  # 1 timeline point x 1 state dim x 64 paths x f64
    budget = int(plane_bytes * 13 * 3 / 2)  # < 13 x 3 params, > 13 x 1
    monkeypatch.setattr(SimulationController, "STREAMING_AUTO_AD_BUDGET_BYTES",
                        budget)
    c_fwd = build(False, False)
    c_fwd.run_simulation()
    assert c_fwd._emission_schedule is None  # amp = 1: stays on the plane
    c_hess = build(True, True)
    c_hess.run_simulation()
    assert c_hess._emission_schedule is not None  # amp = 13 x 3 params


def test_streaming_auto_accounts_for_qmc_bridge_plane(monkeypatch):
    """ADVICE round 3 (medium): qmc_bridge keeps a [T_sub, N, sim_dim]
    rotated plane + the zeta buffer resident through the scan in either
    mode, so the auto decision must subtract those bytes from its budgets —
    a book whose bare plane sits just under the threshold must stream once
    the bridge plane eats the headroom."""
    def build(bridge):
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                                  asset_id="eq")
        option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                                asset_id="eq")
        return _controller("auto", [option], model, [PVMetric()],
                           num_paths=256, num_paths_presim=0, num_steps=4,
                           sampler="sobol", qmc_bridge=bridge)

    c = build(False)
    c2 = build(True)
    plane_bytes = 1 * 1 * 256 * 8  # 1 point x 1 state dim x 256 paths x f64
    assert c._qmc_bridge_resident_bytes(256) == 0
    bridge_bytes = c2._qmc_bridge_resident_bytes(256)
    assert bridge_bytes == 2 * 4 * 1 * 256 * 8  # 2 bufs x T_sub x sim_dim
    # threshold between plane and plane + bridge: without the bridge the
    # book stays on the plane, with it the bridge headroom forces streaming
    monkeypatch.setattr(SimulationController, "STREAMING_AUTO_THRESHOLD_BYTES",
                        plane_bytes + bridge_bytes // 2)
    monkeypatch.setattr(
        SimulationController, "_device_hbm_bytes", lambda self: None)
    c.run_simulation()
    assert c._emission_schedule is None
    c2.run_simulation()
    assert c2._emission_schedule is not None


def test_explicit_streaming_plus_use_pallas_raises():
    """ADVICE round 2 (low): an explicit streaming=True used to be silently
    discarded when the Pallas kernels activated.  Both explicitly True is now
    a construction-time contradiction; streaming=True alone always wins over
    kernel auto-activation (checked implicitly: this suite runs streaming
    books on every backend)."""
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL, asset_id="eq")
    with pytest.raises(ValueError, match="mutually *exclusive|mutually"):
        _controller(True, [option], model, [PVMetric()], use_pallas=True)


def test_ambiguous_kind_query_raises_diagnosable_error():
    """ADVICE round 2 (low): two same-kind requests with different (t1, t2)
    at one (time, asset) drop out of kind_lookup; a kind-level query must
    raise an 'ambiguous' error, not a misleading 'not registered' KeyError."""
    from montecarlo_risk_engine_tpu.requests import AtomicRequest, AtomicRequestType

    plan = RequestPlan.__new__(RequestPlan)
    # two DISCOUNT_FACTOR requests at the same time index with different t2
    r1 = AtomicRequest(AtomicRequestType.DISCOUNT_FACTOR, time1=1.0, time2=2.0)
    r2 = AtomicRequest(AtomicRequestType.DISCOUNT_FACTOR, time1=1.0, time2=3.0)
    r1.handle, r2.handle = 0, 1
    plan.atomic_by_label = {(0, "eq"): [r1, r2]}
    plan.num_atomic_requests = 2
    plan.num_composite_requests = 0
    plan.composite_by_time = {}
    schedule = plan.build_emission_schedule(1)
    assert (0, "eq", AtomicRequestType.DISCOUNT_FACTOR) in schedule.ambiguous_kinds

    from montecarlo_risk_engine_tpu.api.batching import EmittedTables

    tables = EmittedTables(plan, schedule, [jnp.zeros((2, 4))], None, 4)
    with pytest.raises(KeyError, match="ambiguous"):
        tables.rows(AtomicRequestType.DISCOUNT_FACTOR, "eq",
                    np.array([0]), np.array([0.0]))


def test_auto_memory_budgets_track_device_hbm(monkeypatch):
    """VERDICT r2 #7: auto-mode budgets derive from the actual device memory
    (memory_stats / device_kind), not v5e constants — a 95GB v5p must keep
    the faster plane mode where a 16GB v5e streams."""
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2, asset_id="eq")
    option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL, asset_id="eq")
    c = _controller("auto", [option], model, [PVMetric()], num_paths=64,
                    num_paths_presim=64)

    monkeypatch.setattr(SimulationController, "_device_hbm_bytes",
                        lambda self: 16 << 30)
    assert c._auto_memory_budgets() == (2 << 30, 14 << 30)  # v5e calibration
    monkeypatch.setattr(SimulationController, "_device_hbm_bytes",
                        lambda self: 95 << 30)
    lo, hi = c._auto_memory_budgets()
    assert lo == (95 << 30) // 8 and hi == (95 << 30) - (95 << 30) // 8
    # unknown device (CPU meshes): the measured v5e constants remain
    monkeypatch.setattr(SimulationController, "_device_hbm_bytes",
                        lambda self: None)
    assert c._auto_memory_budgets() == (
        SimulationController.STREAMING_AUTO_THRESHOLD_BYTES,
        SimulationController.STREAMING_AUTO_AD_BUDGET_BYTES,
    )
    # a 3GB plane: streams on the 16GB device, stays on the plane at 95GB
    monkeypatch.setattr(SimulationController, "_device_hbm_bytes",
                        lambda self: 16 << 30)
    assert (3 << 30) > c._auto_memory_budgets()[0]
    monkeypatch.setattr(SimulationController, "_device_hbm_bytes",
                        lambda self: 95 << 30)
    assert (3 << 30) < c._auto_memory_budgets()[0]


def _force_kernel_with_engine_forward(ctrl, model):
    """Substitute the Pallas kernel with the threefry engine on the SAME
    (seed, phase) stream and force the kernel decision on.

    The dense-timeline kernel forward (num_steps=1 per dense interval)
    consumes threefry draws in exactly the coarse run's order (counter =
    point_idx * num_steps + k == dense index when no zero-length intervals),
    so the kernel-AD reconstruction must reproduce the engine-streaming
    trajectory to float precision — making the whole combined pipeline
    CPU-testable without hardware (same substitution as tests/test_pallas_ad).
    """
    def fake_pallas(params, scheme, timeline, num_paths, num_steps, seed,
                    phase=0, **kw):
        return simulate_paths(model, params, scheme, timeline, num_paths,
                              num_steps, phase, root_seed=seed)

    model.pallas_paths = fake_pallas
    ctrl._decide_pallas = lambda: True


def test_kernel_streaming_ad_matches_engine_streaming():
    """Combined kernel-streaming AD: with the kernel forward substituted by
    the engine, values/errors/derivatives must match the engine-streaming
    run — the in-scan rows reconstruction is the same map as the engine at
    the recovered noise (round-3: per-tangent memory O(request rows x N))."""
    def build():
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                                  asset_id="eq")
        products = [
            EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                           asset_id="eq"),
            AsianOption(0.25, 2.0, 95.0, 4, OptionType.CALL, asset_id="eq"),
            BermudanOption(Equity("eq"), [0.5, 1.0, 1.5], 100.0,
                           OptionType.PUT, asset_id="eq"),
        ]
        ctrl = _controller(
            True, products, model, [PVMetric(), EPEMetric()],
            exposure_timeline=[0.5, 1.0, 1.5], differentiate=True,
            num_paths=512, num_paths_presim=512,
        )
        return ctrl, model

    ctrl_ref, _ = build()
    r_ref = ctrl_ref.run_simulation()
    assert ctrl_ref._emission_schedule is not None  # engine streaming ran

    ctrl_k, model_k = build()
    _force_kernel_with_engine_forward(ctrl_k, model_k)
    r_k = ctrl_k.run_simulation()
    assert ctrl_k._pallas_active and ctrl_k._emission_schedule is not None

    for metric, n in (("pv", 1), ("epe", 3)):
        for i in range(n):
            a = float(r_ref.get_results("book", metric, evaluation_idx=i))
            b = float(r_k.get_results("book", metric, evaluation_idx=i))
            assert abs(a - b) <= 1e-9 * max(1.0, abs(a)), (metric, i, a, b)
            ea = float(r_ref.get_mc_error("book", metric, evaluation_idx=i))
            eb = float(r_k.get_mc_error("book", metric, evaluation_idx=i))
            assert abs(ea - eb) <= 1e-9 * max(1.0, abs(ea))
            ga = r_ref.get_derivatives("book", metric, evaluation_idx=i)
            gb = r_k.get_derivatives("book", metric, evaluation_idx=i)
            for k in ga:
                assert abs(ga[k] - gb[k]) <= 1e-7 * max(1.0, abs(ga[k])), (
                    metric, i, k, ga[k], gb[k],
                )


def test_kernel_streaming_ad_second_order_matches():
    """Hessian rows through the combined mode (jvp-of-jvp through the rows
    reconstruction) == engine-streaming Hessian rows."""
    def build():
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                                  asset_id="eq")
        option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL,
                                asset_id="eq")
        ctrl = _controller(
            True, [option], model, [PVMetric()], differentiate=True,
            num_paths=256, num_paths_presim=0,
        )
        ctrl.compute_higher_derivatives()
        return ctrl, model

    ctrl_ref, _ = build()
    r_ref = ctrl_ref.run_simulation()
    ctrl_k, model_k = build()
    _force_kernel_with_engine_forward(ctrl_k, model_k)
    r_k = ctrl_k.run_simulation()
    assert ctrl_k._pallas_active and ctrl_k._emission_schedule is not None

    ha = r_ref.get_second_derivatives("book", "pv", evaluation_idx=0)
    hb = r_k.get_second_derivatives("book", "pv", evaluation_idx=0)
    for k in ha:
        for kk in ha[k]:
            assert abs(ha[k][kk] - hb[k][kk]) <= 1e-6 * max(1.0, abs(ha[k][kk])), (
                k, kk, ha[k][kk], hb[k][kk],
            )


@pytest.mark.parametrize("emit_chunk", [1, 3, 1_000_000])
def test_kernel_streaming_ad_emit_chunk_invariant(monkeypatch, emit_chunk):
    """The time-chunked rows reconstruction (round-3: _rows_recon scans
    EMIT_PLANE_CHUNK coarse intervals into a mini-plane, then bulk-resolves
    the chunk's rows) must be chunking-INVARIANT: values, errors, and
    derivatives identical for chunk=1 (per-interval), an uneven chunk, and
    one covering the whole timeline."""
    from montecarlo_risk_engine_tpu.ops import pallas_paths_ad

    def build():
        model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                                  asset_id="eq")
        products = [
            EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                           asset_id="eq"),
            AsianOption(0.25, 2.0, 95.0, 4, OptionType.CALL, asset_id="eq"),
        ]
        ctrl = _controller(
            True, products, model, [PVMetric(), EPEMetric()],
            exposure_timeline=[0.5, 1.0, 1.5], differentiate=True,
            num_paths=256, num_paths_presim=256,
        )
        return ctrl, model

    ctrl_ref, model_ref = build()
    _force_kernel_with_engine_forward(ctrl_ref, model_ref)
    r_ref = ctrl_ref.run_simulation()  # default EMIT_PLANE_CHUNK

    monkeypatch.setattr(pallas_paths_ad, "EMIT_PLANE_CHUNK", emit_chunk)
    ctrl_c, model_c = build()
    _force_kernel_with_engine_forward(ctrl_c, model_c)
    r_c = ctrl_c.run_simulation()
    assert ctrl_c._pallas_active and ctrl_c._emission_schedule is not None

    for metric, n in (("pv", 1), ("epe", 3)):
        for i in range(n):
            a = float(r_ref.get_results("book", metric, evaluation_idx=i))
            b = float(r_c.get_results("book", metric, evaluation_idx=i))
            assert abs(a - b) <= 1e-12 * max(1.0, abs(a)), (metric, i, a, b)
            ga = r_ref.get_derivatives("book", metric, evaluation_idx=i)
            gb = r_c.get_derivatives("book", metric, evaluation_idx=i)
            for k in ga:
                assert abs(ga[k] - gb[k]) <= 1e-10 * max(1.0, abs(ga[k])), (
                    metric, i, k, ga[k], gb[k],
                )


def test_streaming_plus_pallas_allowed_when_differentiated():
    """Forward-only use_pallas=True + streaming=True still raises; the same
    combination constructs fine under differentiation (combined mode)."""
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                              asset_id="eq")
    option = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL,
                            asset_id="eq")
    with pytest.raises(ValueError, match="mutually"):
        _controller(True, [option], model, [PVMetric()], use_pallas=True)
    _controller(True, [option], model, [PVMetric()], use_pallas=True,
                differentiate=True)  # no raise
