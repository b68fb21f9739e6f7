"""Large mixed-book PV benchmark.

Mirrors the reference harness tests/pv_tests/pv_performance_large_netting_set.py
(50,000 products: 39,400 European / 1,000 binary / 1,000 basket / 2,000 Asian /
4,000 barrier / 1,800 American / 700 FlexiCall / 100 storage on a 4-asset
BSMulti; 1,000 main + 1,000 pre paths) and prints products_per_second /
total_seconds.

Usage: python benchmarks/pv_large_book.py [scale]
  scale: fraction of the full book (default 1.0)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks import _cache

_cache.enable()

from montecarlo_risk_engine_tpu import (
    AmericanOption,
    AsianAveragingType,
    AsianOption,
    BarrierOption,
    BarrierOptionType,
    BasketOption,
    BasketOptionType,
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
from montecarlo_risk_engine_tpu.products.storage import Storage
from montecarlo_risk_engine_tpu.products.storage_config import StorageConfig


def make_storage(asset_id, maturity, capacity, initial, inj_cost, wd_cost,
                 num_states, rollout):
    cfg = StorageConfig()
    ramp_end, plateau_end = 0.35 * maturity, 0.70 * maturity
    cfg.add_volume_constraint(0.0, ramp_end, 0.0, 0.55 * capacity)
    cfg.add_volume_constraint(ramp_end, plateau_end, 0.10 * capacity, 0.85 * capacity)
    cfg.add_volume_constraint(plateau_end, maturity, 0.0, capacity)
    cfg.add_injection_flexibility(0.0, ramp_end, 0.0, 0.30 * capacity)
    cfg.add_injection_flexibility(0.0, ramp_end, 0.60 * capacity, 0.18 * capacity)
    cfg.add_injection_flexibility(ramp_end, maturity, 0.0, 0.22 * capacity)
    cfg.add_injection_flexibility(ramp_end, maturity, 0.60 * capacity, 0.12 * capacity)
    cfg.add_withdrawal_flexibility(0.0, plateau_end, 0.0, 0.16 * capacity)
    cfg.add_withdrawal_flexibility(0.0, plateau_end, 0.60 * capacity, 0.24 * capacity)
    cfg.add_withdrawal_flexibility(plateau_end, maturity, 0.0, 0.24 * capacity)
    cfg.add_withdrawal_flexibility(plateau_end, maturity, 0.60 * capacity, 0.32 * capacity)
    cfg.add_variable_injection_cost(0.0, inj_cost)
    cfg.add_variable_injection_cost(plateau_end, inj_cost * 1.10)
    cfg.add_variable_withdrawal_cost(0.0, wd_cost)
    cfg.add_variable_withdrawal_cost(plateau_end, wd_cost * 1.10)
    return Storage(asset_id=asset_id, start_date=0.0, end_date=maturity,
                   initial_amount=initial, storage_config=cfg,
                   num_states=num_states, rollout_interval=rollout)


def build_book(asset_ids, counts):
    products = []
    mats = [0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 2.5, 3.0]
    strikes = [80.0, 90.0, 100.0, 110.0, 120.0]
    for i in range(counts["european"]):
        a = asset_ids[i % len(asset_ids)]
        products.append(EuropeanOption(
            Equity(a), mats[i % len(mats)], strikes[i % len(strikes)],
            OptionType.CALL if i % 2 == 0 else OptionType.PUT, asset_id=a))

    for i in range(counts["binary"]):
        a = asset_ids[i % len(asset_ids)]
        products.append(BinaryOption(
            [0.5, 1.0, 1.5, 2.0][i % 4], [90.0, 100.0, 110.0][i % 3],
            8.0 + 2.0 * (i % 4),
            OptionType.CALL if i % 2 == 0 else OptionType.PUT, asset_id=a))

    basket_weights = [[0.5, 0.3, 0.2, 0.0], [0.25] * 4, [0.4, 0.35, 0.15, 0.10]]
    for i in range(counts["basket"]):
        n_active = 2 + (i % 3)
        ids = asset_ids[:n_active]
        w = basket_weights[i % 3][:n_active]
        w = [x / sum(w) for x in w]
        products.append(BasketOption(
            [0.75, 1.25, 2.0, 2.5][i % 4], ids, w, 95.0 + 5.0 * (i % 5),
            OptionType.CALL if i % 2 == 0 else OptionType.PUT,
            BasketOptionType.ARITHMETIC if i % 3 != 0 else BasketOptionType.GEOMETRIC))

    for i in range(counts["asian"]):
        a = asset_ids[i % len(asset_ids)]
        products.append(AsianOption(
            0.0, [0.5, 0.75, 1.0, 1.5, 2.0][i % 5], 88.0 + 6.0 * (i % 6),
            [8, 12, 18, 24][i % 4],
            OptionType.CALL if i % 2 == 0 else OptionType.PUT,
            AsianAveragingType.ARITHMETIC if i % 3 != 0 else AsianAveragingType.GEOMETRIC,
            asset_id=a))

    for i in range(counts["barrier"]):
        a = asset_ids[i % len(asset_ids)]
        products.append(BarrierOption(
            0.0, [0.5, 0.75, 1.25, 1.75, 2.5, 3.0][i % 6], 85.0 + 7.5 * (i % 6),
            [8, 12, 18, 24, 36][i % 5],
            OptionType.CALL if i % 3 != 0 else OptionType.PUT,
            [118.0, 125.0, 132.0, 140.0][i % 4] + 2.0 * (i % 2),
            BarrierOptionType.UPANDOUT, asset_id=a))

    for i in range(counts["american"]):
        a = asset_ids[i % len(asset_ids)]
        products.append(AmericanOption(
            Equity(a), [0.75, 1.0, 1.5, 2.0, 2.5, 3.0][i % 6],
            [8, 12, 18, 24, 36, 48][i % 6],
            [80.0, 92.5, 100.0, 107.5, 120.0][i % 5],
            OptionType.PUT if i % 2 == 0 else OptionType.CALL, asset_id=a))

    for i in range(counts["flexicall"]):
        a = asset_ids[i % len(asset_ids)]
        maturity = [1.0, 1.5, 2.0, 2.5][i % 4]
        n_dates = [3, 4, 5][i % 3]
        dates = np.linspace(maturity / n_dates, maturity, n_dates)
        unds = [EuropeanOption(Equity(a), float(t), 90.0 + 6.0 * ((i + k) % 6),
                               OptionType.CALL, asset_id=a)
                for k, t in enumerate(dates)]
        products.append(FlexiCall(unds, num_exercise_rights=min(1 + (i % 3), n_dates - 1),
                                  asset_id=a))

    for i in range(counts["storage"]):
        a = asset_ids[i % len(asset_ids)]
        products.append(make_storage(
            a, [1.0, 1.5, 2.0, 2.5][i % 4], [18.0, 26.0, 34.0, 42.0][i % 4],
            2.0 + 0.5 * (i % 5), 0.10 + 0.02 * (i % 4), 0.08 + 0.015 * (i % 4),
            6 + (i % 5), [0.05, 0.10, 0.125][i % 3]))

    return products


def main(scale: float = 1.0, num_paths: int = 1000):
    full = {"european": 39_400, "binary": 1_000, "basket": 1_000, "asian": 2_000,
            "barrier": 4_000, "american": 1_800, "flexicall": 700, "storage": 100}
    counts = {k: max(1, int(v * scale)) for k, v in full.items()}

    asset_ids = [f"asset_{i}" for i in range(4)]
    corr = np.full((4, 4), 0.35)
    np.fill_diagonal(corr, 1.0)
    model = BlackScholesMulti(
        0.0, rate=0.03, asset_ids=asset_ids,
        spots=[95.0 + 7.5 * i for i in range(4)],
        volatilities=[0.18 + 0.03 * i for i in range(4)],
        correlation_matrix=corr,
    )

    t_build = time.perf_counter()
    products = build_book(asset_ids, counts)
    netting_set = NettingSet(name="mixed_book", products=products)
    controller = SimulationController(
        netting_sets=[netting_set],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=num_paths,
        num_paths_presim=num_paths,
        num_steps=1,
        simulation_scheme=SimulationScheme.ANALYTICAL,
    )
    t0 = time.perf_counter()
    results = controller.run_simulation()
    elapsed = time.perf_counter() - t0
    t1 = time.perf_counter()
    controller.run_simulation()
    warm = time.perf_counter() - t1

    pv = float(results.get_results("mixed_book", "pv", evaluation_idx=0))
    print(json.dumps({
        "metric": "products_per_second_mixed_book",
        "value": len(products) / warm,
        "unit": "products/sec (warm)",
        "num_products": len(products),
        "total_seconds_cold": elapsed,
        "total_seconds_warm": warm,
        "setup_seconds": t0 - t_build,
        "pv": pv,
    }))


if __name__ == "__main__":
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    main(scale)
