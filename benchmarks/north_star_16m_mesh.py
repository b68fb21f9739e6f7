"""16M-path north-star CVA on an 8-device mesh — streaming-memory rehearsal.

The BASELINE.md north star is full xVA (CVA + 1st/2nd-order Greeks) at 16M
paths on a v5p-8.  This script runs the exact north-star book
(benchmarks/north_star.py) at 16M paths, path-sharded over an 8-device mesh,
in f32 — the per-chip workload (2M paths) and the collective pattern (psum'd
LSM Gram solves, bisection-order-statistic PFE, no [T, D, N] plane: the
streaming engine emits only the request rows) are the v5p-8 production shape;
here the mesh is 8 virtual CPU devices so the run validates memory +
sharding, not speed.

Modes (VERDICT r2 #3 — the north star is differentiated, not forward-only):
  (default)        forward values + MC errors
  --aad            + full first-order jacobian (CVA/EPE/PFE Greeks, jacfwd
                   chunked over params)
  --hessian        + the full Hessian via the controller's per-parameter ROW
                   dispatch (one compiled row program executed P times — the
                   single-chip 1M-path recipe, controller._run_hessians); use
                   a reduced path count for CPU-mesh rehearsals

Usage: python benchmarks/north_star_16m_mesh.py [num_paths] [n_devices]
           [--aad] [--hessian] [--chunk=C]
(defaults 16_777_216 paths, 8 devices; pass e.g. 1048576 for a quick check).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main(num_paths: int = 16_777_216, n_devices: int = 8, aad: bool = False,
         hessian: bool = False, chunk: int = 4, presim=None):
    # The in-process CPU collectives rendezvous aborts the program when a
    # participant is >40s late; on a 1-core rehearsal host the n virtual
    # devices timeshare that core, so 2M+ paths of per-device work between
    # all-reduces legitimately exceeds it (observed SIGABRT at 2M, op_id=942).
    # Real multi-chip meshes give each participant its own chip; here we
    # raise the timeouts instead.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
        + " --xla_cpu_collective_timeout_seconds=7200"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
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

    differentiate = aad or hessian
    # presim: LSM-fit path count (regression coefficients converge far below
    # the mainsim count — a smaller presim bounds the peak of the fit tables
    # at 16M-scale runs; still sharded over the same mesh).
    controller = build(num_paths, hessian=False, path_sharding=sharding,
                       streaming=True, differentiate=differentiate,
                       grad_chunk_size=chunk, remat_paths=differentiate,
                       num_paths_presim=presim)
    if hessian:
        controller.compute_higher_derivatives()

    t0 = time.perf_counter()
    results = controller.run_simulation()
    cold = time.perf_counter() - t0

    cva = float(results.get_results("north_star", f"cva[{CP}]", evaluation_idx=0))
    cva_se = float(results.get_mc_error("north_star", f"cva[{CP}]", evaluation_idx=0))
    pfe_mid = float(results.get_results("north_star", "pfe[0.95]", evaluation_idx=14))
    out = {
        "metric": "north_star_16m_mesh"
        + ("_hessian" if hessian else "_aad" if aad else "_forward"),
        "value": cold,
        "unit": f"seconds (cold, {num_paths} paths on {n_devices}-device mesh, f32)",
        "streaming": controller._emission_schedule is not None,
        "cva": cva,
        "cva_se": cva_se,
        "pfe95_mid": pfe_mid,
    }
    if differentiate:
        grads = results.get_derivatives("north_star", f"cva[{CP}]",
                                        evaluation_idx=0)
        out["dcva_drate"] = float(grads["irs.rate"])
        out["dcva_dspot"] = float(grads["eq.spot"])
        assert all(np.isfinite(float(v)) for v in grads.values())
    if hessian:
        # the row dispatch computed the FULL Hessian tensor; report the
        # equity-spot diagonal as the headline element
        h = float(results.get_second_derivatives(
            "north_star", f"cva[{CP}]", param1="eq.spot", param2="eq.spot",
            evaluation_idx=0,
        ))
        out["d2cva_dspot2"] = h
        assert np.isfinite(h)
    print(json.dumps(out))
    assert controller._emission_schedule is not None, "streaming engine must be on"
    assert np.isfinite(cva) and cva_se > 0.0
    return out


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    np_paths = int(pos[0]) if pos else 16_777_216
    nd = int(pos[1]) if len(pos) > 1 else 8
    aad_flag = "--aad" in sys.argv
    hessian_flag = "--hessian" in sys.argv
    chunk = 4
    presim = None
    for a in sys.argv[1:]:
        if a.startswith("--chunk="):
            chunk = int(a.split("=")[1])
        if a.startswith("--presim="):
            presim = int(a.split("=")[1])
    main(np_paths, nd, aad=aad_flag, hessian=hessian_flag, chunk=chunk,
         presim=presim)
