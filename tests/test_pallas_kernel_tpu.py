"""Statistical validation of the fused Pallas Heston-QE kernel.

Runs ONLY on real TPU hardware (the Pallas kernel uses the TPU hardware PRNG
and Mosaic-only ops; the rest of the suite pins itself to CPU in conftest.py).
Invoke explicitly with:

    RUN_TPU_PALLAS_TESTS=1 python -m pytest tests/test_pallas_kernel_tpu.py -q

Checks the kernel stream against model-level invariants rather than the
threefry engine bit-for-bit (different, equally valid PRNG stream):
  * martingale property of the discounted spot,
  * mean-reversion of the variance toward theta,
  * a European call price vs the semi-analytic jnp-engine Monte Carlo value.
"""

import os

import numpy as np
import pytest


def _tpu_available():
    if not os.environ.get("RUN_TPU_PALLAS_TESTS"):
        return False
    try:
        import jax

        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _tpu_available(),
    reason="needs RUN_TPU_PALLAS_TESTS=1 and a real TPU (hardware PRNG)",
)

PARAMS = (100.0, 0.6, 0.03, -0.7, 1.5, 0.04, 0.04)  # spot σ r ρ κ θ v0
T = 1.0
NUM_PATHS = 262_144


@pytest.fixture(scope="module")
def kernel_states():
    from montecarlo_risk_engine_tpu.ops.pallas_paths import heston_qe_paths

    timeline = tuple(np.linspace(0.1, T, 10))
    out = heston_qe_paths(PARAMS, timeline, NUM_PATHS, num_steps=4, seed=7)
    return np.asarray(out)  # [T, N, 2] = (log-spot, variance)


@pytest.mark.tpu_smoke
def test_discounted_spot_is_martingale(kernel_states):
    spot, _, rate = PARAMS[0], PARAMS[1], PARAMS[2]
    s_t = np.exp(kernel_states[-1, :, 0])
    mean = s_t.mean() * np.exp(-rate * T)
    se = s_t.std() * np.exp(-rate * T) / np.sqrt(NUM_PATHS)
    assert abs(mean - spot) < 5 * se + 0.05 * spot * 1e-2


@pytest.mark.tpu_smoke
def test_variance_mean_reverts(kernel_states):
    _, _, _, _, kappa, theta, v0 = PARAMS
    v_t = kernel_states[-1, :, 1]
    expected = theta + (v0 - theta) * np.exp(-kappa * T)
    assert abs(v_t.mean() - expected) < 0.1 * theta


@pytest.mark.tpu_smoke
def test_european_call_matches_jnp_engine(kernel_states):
    """Kernel MC call price vs the threefry jnp-engine MC price (same model)."""
    import jax.numpy as jnp

    from montecarlo_risk_engine_tpu.config import SimulationScheme
    from montecarlo_risk_engine_tpu.engine.engine import simulate_paths
    from montecarlo_risk_engine_tpu.models.heston import HestonModel
    from montecarlo_risk_engine_tpu.rng import PHASE_MAINSIM

    spot, sigma, rate, rho, kappa, theta, v0 = PARAMS
    strike = 100.0
    disc = np.exp(-rate * T)

    s_t = np.exp(kernel_states[-1, :, 0])
    px_kernel = disc * np.maximum(s_t - strike, 0.0).mean()

    model = HestonModel(0.0, spot=spot, rate=rate, sigma=sigma, rho=rho,
                        kappa=kappa, theta=theta, v0=v0)
    states = simulate_paths(
        model, model.initial_params(), SimulationScheme.QE,
        (T,), 131_072, 40, PHASE_MAINSIM,
    )
    s_ref = np.exp(np.asarray(states[-1, :, 0]))
    px_ref = disc * np.maximum(s_ref - strike, 0.0).mean()

    se = disc * np.maximum(s_t - strike, 0.0).std() / np.sqrt(NUM_PATHS)
    se_ref = disc * np.maximum(s_ref - strike, 0.0).std() / np.sqrt(131_072)
    assert abs(px_kernel - px_ref) < 5 * float(np.hypot(se, se_ref))


def test_bs_multi_correlation_and_martingale():
    """Exact correlated GBM through the LIVE dispatch — the model's
    ``pallas_paths`` (a single "bs_multi" block of the time-chunked hybrid
    kernel since round 3)."""
    from montecarlo_risk_engine_tpu import BlackScholesMulti, SimulationScheme

    rate = 0.03
    spots = [95.0, 102.5, 110.0, 117.5]
    vols = [0.18, 0.21, 0.24, 0.27]
    corr = np.full((4, 4), 0.35)
    np.fill_diagonal(corr, 1.0)
    horizon = 2.0
    n = 262_144

    model = BlackScholesMulti(0.0, rate=rate,
                              asset_ids=[f"a{d}" for d in range(4)],
                              spots=spots, volatilities=vols,
                              correlation_matrix=corr)
    s = np.asarray(model.pallas_paths(
        model.initial_params(), SimulationScheme.ANALYTICAL,
        (0.5, horizon), n, 1, seed=11,
    ))  # [2, N, 4] spot levels
    s_t = s[-1]
    for d in range(4):
        mean = s_t[:, d].mean() * np.exp(-rate * horizon)
        se = s_t[:, d].std() * np.exp(-rate * horizon) / np.sqrt(n)
        assert abs(mean - spots[d]) < 5 * se + 1e-2 * spots[d]

    # realized log-return correlation vs the input matrix
    logret = np.log(s_t) - np.log(np.asarray(spots))[None, :]
    emp = np.corrcoef(logret.T)
    assert np.max(np.abs(emp - corr)) < 0.02


def test_hybrid_kernel_bs_multi_block_joint_law():
    """Round-3: BlackScholesMulti as a hybrid kernel block.  The intra-asset
    correlation folds into the static joint Cholesky next to the inter-model
    config blocks; realized log-return correlations must match both."""
    from montecarlo_risk_engine_tpu import (
        BlackScholesMulti,
        ModelConfig,
        SimulationScheme,
        VasicekModel,
    )

    multi = BlackScholesMulti(
        0.0, spots=[95.0, 105.0], volatilities=[0.2, 0.3], rate=0.02,
        correlation_matrix=[[1.0, 0.5], [0.5, 1.0]], asset_ids=["a", "b"],
    )
    rates = VasicekModel(0.0, rate=0.03, mean=0.045,
                         mean_reversion_speed=0.05, volatility=0.012,
                         asset_id="irs")
    model = ModelConfig([multi, rates],
                        inter_asset_correlation_matrix=[np.array([[0.3], [0.1]])])
    assert model.supports_pallas_paths(SimulationScheme.EULER)

    n = 262_144
    states = np.asarray(model.pallas_paths(
        model.initial_params(), SimulationScheme.EULER, (0.25,), n, 4, seed=9,
    ))  # [1, N, 4] = [S_a, S_b, r, log_B]
    s_a, s_b, r = states[0, :, 0], states[0, :, 1], states[0, :, 2]
    ret_a = np.log(s_a / 95.0)
    ret_b = np.log(s_b / 105.0)
    dr = r - 0.03
    assert abs(np.corrcoef(ret_a, ret_b)[0, 1] - 0.5) < 0.03
    # OU weighting decays the realized correlation slightly (a dt small here)
    assert abs(np.corrcoef(ret_a, dr)[0, 1] - 0.3) < 0.04
    assert abs(np.corrcoef(ret_b, dr)[0, 1] - 0.1) < 0.04
    # Euler drift: E[S_T] = S_0 (1 + r dt)^k ~ S_0 e^{rT}
    for s0, s_t in ((95.0, s_a), (105.0, s_b)):
        se = s_t.std() / np.sqrt(n)
        assert abs(s_t.mean() - s0 * np.exp(0.02 * 0.25)) < 5 * se + 0.01 * s0


def test_phase_streams_never_collide_across_blocks():
    """Regression (ADVICE round 2, high): with the old packed seed
    ((root<<1)|phase) + per-block offset, main-sim block b replayed pre-sim
    block b+1 — LSM regressions would have been fit in-sample.  The kernel now
    packs (seed, phase, global block) into two independent prng_seed words:
    no block of one phase may reproduce any block of the other."""
    from montecarlo_risk_engine_tpu import BlackScholesModel, SimulationScheme
    from montecarlo_risk_engine_tpu import rng

    n_blocks = 4
    rows = 8
    n = n_blocks * rows * 128
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2)
    kw = dict(seed=21, rows_per_block=rows)

    def paths(phase):
        return np.asarray(model.pallas_paths(
            model.initial_params(), SimulationScheme.ANALYTICAL,
            (1.0,), n, 1, phase=phase, **kw,
        )).reshape(n_blocks, rows * 128)

    pre = paths(rng.PHASE_PRESIM)
    main = paths(rng.PHASE_MAINSIM)
    for b_main in range(n_blocks):
        for b_pre in range(n_blocks):
            assert not np.allclose(main[b_main], pre[b_pre]), (b_main, b_pre)
    # determinism: same (seed, phase) reproduces bitwise
    np.testing.assert_array_equal(pre, paths(rng.PHASE_PRESIM))


def test_block_offset_matches_unsharded_global_blocks():
    """block_offset k must reproduce the unsharded kernel's blocks k..k+m —
    the shard_map entry point relies on this to make sharded draws identical
    to the single-device stream per global block."""
    from montecarlo_risk_engine_tpu import BlackScholesModel, SimulationScheme

    rows = 8
    block_paths = rows * 128
    n_blocks = 4
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2)
    kw = dict(seed=5, phase=1, rows_per_block=rows)
    full = np.asarray(model.pallas_paths(
        model.initial_params(), SimulationScheme.ANALYTICAL,
        (1.0,), n_blocks * block_paths, 1, **kw,
    )).reshape(n_blocks, block_paths)
    tail = np.asarray(model.pallas_paths(
        model.initial_params(), SimulationScheme.ANALYTICAL,
        (1.0,), 2 * block_paths, 1, block_offset=2, **kw,
    )).reshape(2, block_paths)
    np.testing.assert_array_equal(full[2:], tail)


def test_non_divisible_path_counts_pad_and_slice():
    """Any path count is kernel-eligible: the kernel simulates the next
    block multiple and slices the tail, so a non-divisible count is the
    bitwise PREFIX of the padded run (pallas_paths.padded_paths).  1,000,000
    is divisible by no rows*128 — pre-padding, such books silently fell
    back to the scan engine."""
    from montecarlo_risk_engine_tpu import (
        BlackScholesMulti, SimulationScheme, VasicekModel)

    tl = tuple(np.linspace(0.25, 2.0, 8))
    kw = dict(seed=11, rows_per_block=8)
    block = 8 * 128
    multi = BlackScholesMulti(0.0, rate=0.03, asset_ids=["a", "b"],
                              spots=[100.0, 90.0], volatilities=[0.2, 0.3],
                              correlation_matrix=[[1.0, 0.4], [0.4, 1.0]])
    for n in (1000, 3 * block + 17):
        padded = -(-n // block) * block
        got = np.asarray(multi.pallas_paths(
            multi.initial_params(), SimulationScheme.ANALYTICAL,
            tl, n, 1, **kw))
        ref = np.asarray(multi.pallas_paths(
            multi.initial_params(), SimulationScheme.ANALYTICAL,
            tl, padded, 1, **kw))
        assert got.shape[1] == n
        np.testing.assert_array_equal(got, ref[:, :n])
    vas = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                       volatility=0.012)
    got = np.asarray(vas.pallas_paths(
        vas.initial_params(), SimulationScheme.ANALYTICAL, tl, 1000, 1, **kw))
    ref = np.asarray(vas.pallas_paths(
        vas.initial_params(), SimulationScheme.ANALYTICAL, tl, block, 1, **kw))
    np.testing.assert_array_equal(got, ref[:, :1000])


def test_time_chunked_emission_is_bitwise_chunk_invariant():
    """Round-3: the hybrid kernel streams emissions in TIME CHUNKS (grid
    minor dim walks the timeline, state + the spare Box-Muller half-pair
    carried in VMEM scratch, PRNG seeded once per path block) so ANY
    timeline length is kernel-eligible.  The draw stream must be EXACTLY
    invariant to the chunking: parity of the half-pair at each boundary is
    static, its value rides the scratch, and the hardware PRNG register
    state persists across grid steps."""
    from montecarlo_risk_engine_tpu.ops.pallas_hybrid import (
        KernelBlock,
        hybrid_paths,
    )

    # sim_dim = 3 (odd) so the Box-Muller spare half-pair crosses chunk
    # boundaries on every other substep
    blocks = [
        KernelBlock("bs", "euler", 0, 1, 1),
        KernelBlock("vasicek", "exact", 3, 2, 1),
        KernelBlock("cirpp", "euler", 7, 2, 1,
                    hazard_tenors=(1.0, 5.0), hazard_rates=(0.02, 0.03)),
    ]
    import jax.numpy as jnp

    params = jnp.asarray(
        [100.0, 0.2, 0.03, 0.03, 0.012, 0.045, 0.3, 0.1, 0.01, 0.02, 1e-4],
        jnp.float32,
    )
    chol = np.linalg.cholesky(
        np.array([[1.0, 0.2, 0.1], [0.2, 1.0, 0.0], [0.1, 0.0, 1.0]])
    )
    tl = [0.25 * k for k in range(1, 25)]  # 24 points

    ref = np.asarray(hybrid_paths(
        blocks, chol, tl, 1000, 1, seed=7, phase=42, params_vec=params,
        time_chunk_points=24,  # single chunk == the pre-chunking kernel
    ))
    for tc in (1, 3, 5, 7):
        out = np.asarray(hybrid_paths(
            blocks, chol, tl, 1000, 1, seed=7, phase=42, params_vec=params,
            time_chunk_points=tc,
        ))
        np.testing.assert_array_equal(out, ref)


def test_long_timeline_is_kernel_eligible_and_statistically_sound():
    """A 500-point timeline used to bail to the XLA engine (the whole
    [T, D, rows, 128] trajectory had to fit scoped VMEM); time-chunked
    emission keeps the kernel on.  BS martingale + Vasicek stationary-mean
    invariants at the horizon."""
    from montecarlo_risk_engine_tpu import (
        BlackScholesModel,
        ModelConfig,
        SimulationScheme,
        VasicekModel,
    )

    eq = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                           asset_id="eq")
    irs = VasicekModel(0.0, rate=0.03, mean=0.045, mean_reversion_speed=0.3,
                       volatility=0.012, asset_id="irs")
    model = ModelConfig([eq, irs],
                        inter_asset_correlation_matrix=[np.array([[0.25]])])
    tl = tuple(np.linspace(0.02, 10.0, 500))
    n = 65_536
    states = np.asarray(model.pallas_paths(
        model.initial_params(), SimulationScheme.EULER, tl, n, 1, seed=13,
    ))  # [500, N, 4] = [S, r, log_B, ...block order]
    s_t = states[-1, :, 0]
    se = s_t.std() / np.sqrt(n)
    # Euler drift compounding: E[S_T] = 100 * prod(1 + r dt) -> ~ e^{rT}
    dts = np.diff(np.concatenate([[0.0], np.asarray(tl)]))
    target = 100.0 * np.prod(1.0 + 0.03 * dts)
    assert abs(s_t.mean() - target) < 5 * se
    r_t = states[-1, :, 1]
    # OU at T=10 with a=0.3: mean = theta + (r0-theta) e^{-aT}
    mean_r = 0.045 + (0.03 - 0.045) * np.exp(-0.3 * 10.0)
    assert abs(r_t.mean() - mean_r) < 5 * 0.012 / np.sqrt(2 * 0.3) / np.sqrt(n) + 1e-4
