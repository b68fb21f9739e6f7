"""Worker process for tests/test_distributed.py (not a test module).

Launched N times with distinct process ids; initialises jax.distributed
over the CPU backend via parallel/distributed.py, runs a PV-only European
book through the public SimulationController with the path axis sharded
over the GLOBAL (cross-process) mesh, and prints the PV/SE so the parent
can assert cross-process agreement and single-process parity.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]

    from montecarlo_risk_engine_tpu.parallel import distributed

    sharding = distributed.initialize_and_make_sharding(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()

    from montecarlo_risk_engine_tpu import (
        BlackScholesModel,
        Equity,
        EuropeanOption,
        NettingSet,
        OptionType,
        PVMetric,
        RiskMetrics,
        SimulationController,
        SimulationScheme,
    )

    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                              asset_id="eq")
    option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                            asset_id="eq")
    controller = SimulationController(
        netting_sets=[NettingSet(name="b", products=[option])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=4096,
        num_paths_presim=0,
        num_steps=4,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        path_sharding=sharding,
    )
    res = controller.run_simulation()
    pv = float(res.get_results("b", "pv", evaluation_idx=0))
    se = float(res.get_mc_error("b", "pv", evaluation_idx=0))
    print(f"RESULT {process_id} {pv!r} {se!r}", flush=True)


if __name__ == "__main__":
    main()
