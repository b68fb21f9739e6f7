"""16M-path north-star CVA on an 8-device mesh — streaming-memory rehearsal.

The BASELINE.md north star is full xVA at 16M paths on a v5p-8.  This script
runs the exact north-star book (benchmarks/north_star.py) FORWARD (CVA + EPE
+ PFE values + MC errors, differentiate off) at 16M paths, path-sharded over
an 8-device mesh, in f32 — the per-chip workload (2M paths) and the
collective pattern (psum'd LSM Gram solves, bisection-order-statistic PFE, no
[T, D, N] plane: the streaming engine emits only the request rows) are the
v5p-8 production shape; here the mesh is 8 virtual CPU devices so the run
validates memory + sharding, not speed.

Usage: python benchmarks/north_star_16m_mesh.py [num_paths] [n_devices]
(defaults 16_777_216 paths, 8 devices; pass e.g. 1048576 for a quick check).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main(num_paths: int = 16_777_216, n_devices: int = 8):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from montecarlo_risk_engine_tpu import set_real_dtype
    import jax.numpy as jnp

    set_real_dtype(jnp.float32)

    from benchmarks.north_star import build, CP

    devices = np.array(jax.devices()[:n_devices])
    assert devices.size == n_devices, f"need {n_devices} devices, have {devices.size}"
    mesh = Mesh(devices, ("paths",))
    sharding = NamedSharding(mesh, PartitionSpec("paths"))

    controller = build(num_paths, hessian=False, path_sharding=sharding,
                       streaming=True, differentiate=False)

    t0 = time.perf_counter()
    results = controller.run_simulation()
    cold = time.perf_counter() - t0

    cva = float(results.get_results("north_star", f"cva[{CP}]", evaluation_idx=0))
    cva_se = float(results.get_mc_error("north_star", f"cva[{CP}]", evaluation_idx=0))
    pfe_mid = float(results.get_results("north_star", "pfe[0.95]", evaluation_idx=14))
    print(json.dumps({
        "metric": "north_star_16m_mesh_forward",
        "value": cold,
        "unit": f"seconds (cold, {num_paths} paths on {n_devices}-device mesh, f32)",
        "streaming": controller._emission_schedule is not None,
        "cva": cva,
        "cva_se": cva_se,
        "pfe95_mid": pfe_mid,
    }))
    assert controller._emission_schedule is not None, "streaming engine must be on"
    assert np.isfinite(cva) and cva_se > 0.0
    return cva


if __name__ == "__main__":
    np_paths = int(sys.argv[1]) if len(sys.argv) > 1 else 16_777_216
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(np_paths, nd)
