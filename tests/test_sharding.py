"""Path-axis sharding: sharded run must reproduce the single-device result.

Runs the full pipeline over an 8-virtual-device CPU mesh (SURVEY.md §4
multi-node strategy) and checks value equality against the unsharded run —
the counter-based RNG guarantees the same draws regardless of sharding.
"""

import jax
import numpy as np
import pytest

from montecarlo_risk_engine_tpu import (
    BlackScholesModel,
    EPEMetric,
    Equity,
    EuropeanOption,
    NettingSet,
    OptionType,
    PFEMetric,
    PVMetric,
    RiskMetrics,
    SimulationController,
    SimulationScheme,
)
from montecarlo_risk_engine_tpu.parallel.mesh import make_path_mesh, path_sharding


def _run(sharding):
    model = BlackScholesModel(0.0, spot=100.0, rate=0.05, sigma=0.2, asset_id="eq")
    product = EuropeanOption(Equity("eq"), 1.0, 100.0, OptionType.CALL, asset_id="eq")
    controller = SimulationController(
        netting_sets=[NettingSet(name="ns", products=[product])],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=[PVMetric(), EPEMetric(), PFEMetric(0.95)],
            exposure_timeline=np.array([0.0, 0.5, 1.0]),
        ),
        num_paths_mainsim=4096,
        num_paths_presim=4096,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        differentiate=True,
        path_sharding=sharding,
    )
    return controller.run_simulation()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_run_matches_single_device():
    mesh = make_path_mesh(8)
    sharded = _run(path_sharding(mesh))
    plain = _run(None)
    for metric in ("pv", "epe", "pfe[0.95]"):
        np.testing.assert_allclose(
            sharded.get_results("ns", metric),
            plain.get_results("ns", metric),
            rtol=1e-9,
        )
    g_sharded = sharded.get_derivatives("ns", "pv", evaluation_idx=0)
    g_plain = plain.get_derivatives("ns", "pv", evaluation_idx=0)
    for name in g_plain:
        np.testing.assert_allclose(g_sharded[name], g_plain[name], rtol=1e-8)


def _run_all_metrics_book(sharding, streaming):
    """Hybrid Vasicek x CIR++ swap book exercising ALL seven metrics."""
    from montecarlo_risk_engine_tpu import (
        CEMetric,
        CIRPPModel,
        CVAMetric,
        EEPEMetric,
        ENEMetric,
        InterestRateSwap,
        IRSType,
        ModelConfig,
        VasicekModel,
    )

    hazards = {1.0: 0.01, 3.0: 0.015, 5.0: 0.02}
    cp = "cp"
    rates = VasicekModel(0.0, rate=0.03, mean=0.05, mean_reversion_speed=0.1,
                         volatility=0.01, asset_id="irs")
    credit = CIRPPModel(0.0, asset_id=cp, hazard_rates=hazards, kappa=0.1,
                        theta=0.01, volatility=0.02, y0=0.0001)
    model = ModelConfig([rates, credit],
                        inter_asset_correlation_matrix=[np.array([[0.3]])])
    irs = InterestRateSwap(0.0, 1.0, notional=1.0, fixed_rate=0.03,
                           tenor_fixed=0.5, tenor_float=0.5,
                           irs_type=IRSType.PAYER, asset_id="irs")
    metrics = [
        PVMetric(), CEMetric(), EPEMetric(), ENEMetric(), EEPEMetric(),
        PFEMetric(0.95), CVAMetric(counterparty_id=cp, recovery_rate=0.4),
    ]
    controller = SimulationController(
        netting_sets=[NettingSet(name="ns", products=[irs], counterparty_id=cp)],
        model=model,
        risk_metrics=RiskMetrics(
            metrics=metrics, exposure_timeline=np.array([0.0, 0.5, 1.0])
        ),
        num_paths_mainsim=4096,
        num_paths_presim=4096,
        num_steps=1,
        simulation_scheme=SimulationScheme.EULER,
        path_sharding=sharding,
        streaming=streaming,
    )
    names = ("pv", "ce", "epe", "ene", "eepe", "pfe[0.95]", f"cva[{cp}]")
    return controller.run_simulation(), names


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("streaming", [False, True])
def test_all_seven_metrics_bitwise_shard_invariant(streaming):
    """Every metric (incl. EEPE/CE/CVA) must be BITWISE identical between the
    unsharded run and the 8-device sharded run, in both engine modes —
    counter-based draws + fixed-tree reductions make topology invisible
    (round-4 verdict #3: EEPE previously reduced via jnp.mean)."""
    mesh = make_path_mesh(8)
    sharded, names = _run_all_metrics_book(path_sharding(mesh), streaming)
    plain, _ = _run_all_metrics_book(None, streaming)
    for metric in names:
        np.testing.assert_array_equal(
            np.asarray(sharded.get_results("ns", metric)),
            np.asarray(plain.get_results("ns", metric)),
            err_msg=f"metric {metric} not bitwise shard-invariant",
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.get_mc_error("ns", metric)),
            np.asarray(plain.get_mc_error("ns", metric)),
            err_msg=f"metric {metric} SE not bitwise shard-invariant",
        )


def test_shard_paths_over_mesh_layout_cpu():
    """Mesh plumbing on the 8-device CPU mesh with a deterministic fake
    path_fn: the assembled [T, N, D] plane must place device d's block at
    global paths [d*local, (d+1)*local) with block_offset = d * local/block
    (the contract the kernels' global-block seeding relies on)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from montecarlo_risk_engine_tpu.ops.pallas_shard import shard_paths_over_mesh

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("paths",))
    sharding = NamedSharding(mesh, PartitionSpec("paths"))

    block_paths = 4
    local = 8
    num_paths = local * n_dev

    def path_fn(params, local_paths, offset):
        # one row per path: value = global block index * scale + params[0]
        blocks = offset + jnp.arange(local_paths // block_paths)
        vals = jnp.repeat(blocks, block_paths).astype(jnp.float32)
        return (vals[None, :, None] + params[0])  # [1, local, 1]

    out = jax.jit(
        lambda p: shard_paths_over_mesh(path_fn, p, sharding, num_paths, block_paths)
    )((jnp.float32(0.25),))
    expected = np.repeat(np.arange(num_paths // block_paths), block_paths) + 0.25
    np.testing.assert_array_equal(np.asarray(out)[0, :, 0], expected.astype(np.float32))


def test_shard_paths_validation_errors():
    import jax
    import numpy as np
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from montecarlo_risk_engine_tpu.ops.pallas_shard import shard_paths_over_mesh

    mesh = Mesh(np.array(jax.devices()), ("paths",))
    sharding = NamedSharding(mesh, PartitionSpec("paths"))
    fn = lambda p, n, o: None
    with pytest.raises(ValueError, match="not divisible"):
        shard_paths_over_mesh(fn, (), sharding, len(jax.devices()) * 8 + 1, 4)
