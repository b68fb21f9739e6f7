"""shard_map entry point for the fused Pallas path kernels.

Round-2 verdict item #2: the kernel eligibility gate required
``path_sharding is None``, so the documented multi-chip plan ran the ~2x
slower XLA scan engine per chip.  Here the kernel runs per device under
``shard_map`` over the paths axis:

  * each device generates its block of paths with the SAME kernel, seeded by
    the *global* block index (``block_offset = axis_index * blocks_per_dev``
  — the kernels' two prng_seed words are (seed<<8|phase, global block), see
    ops/pallas_paths.py), so the sharded stream is identical per global
    block to a single-device run over the same path count whenever both pick
    the same rows_per_block (always true for power-of-two path counts);
  * ``rows_per_block`` is fixed host-side from the per-device path count so
    every device agrees on the block layout;
  * no collectives are needed — path generation is embarrassingly parallel;
    downstream reductions (metric means, Gram solves, bisect quantiles)
    already psum over the sharded axis.

The helper is generic over the per-shard path function so the mesh plumbing
is testable on the CPU mesh (where the hardware-PRNG kernel itself cannot
run): tests substitute a deterministic function of (local_paths,
block_offset) and pin the assembled global layout.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec

try:  # jax >= 0.4.35 re-exports shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _path_axis(sharding: NamedSharding) -> str:
    axes = [a for a in sharding.spec if a is not None]
    if len(axes) != 1:
        raise ValueError(
            f"path sharding must name exactly one mesh axis, got {sharding.spec}"
        )
    return axes[0]


def shard_paths_over_mesh(path_fn, params, sharding: NamedSharding,
                          num_paths: int, block_paths: int):
    """Run ``path_fn(params, local_paths, block_offset) -> [T, local, D]``
    per device and reassemble the path-sharded [T, num_paths, D] plane.

    ``block_paths`` is the kernel block size (rows_per_block * 128) used to
    convert the device index into a global block offset.
    """
    mesh = sharding.mesh
    axis = _path_axis(sharding)
    n_dev = int(mesh.shape[axis])
    if num_paths % n_dev:
        raise ValueError(f"num_paths {num_paths} not divisible by {n_dev} devices")
    local_paths = num_paths // n_dev
    # Kernels pad internally to a block multiple (pallas_paths.padded_paths),
    # so blocks_per_dev is the PADDED per-device block count — every device
    # agrees on it, keeping global block offsets collision-free.
    blocks_per_dev = -(-local_paths // block_paths)

    def local_fn(p):
        offset = jax.lax.axis_index(axis) * blocks_per_dev
        return path_fn(p, local_paths, offset)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # metadata, so the vma checker cannot type them (jax >= 0.8); the out
    # spec states the sharding explicitly.  Older jax has no such kwarg.
    try:
        smap = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(PartitionSpec(),),
            out_specs=PartitionSpec(None, axis, None),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        smap = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(PartitionSpec(),),
            out_specs=PartitionSpec(None, axis, None),
        )
    return smap(params)


def sharded_pallas_paths(model, params, scheme, timeline, num_paths: int,
                         num_steps: int, seed: int, phase: int,
                         sharding: NamedSharding, outputs_per_path: int):
    """Kernel path generation sharded over the mesh: [T, num_paths, D] f32.

    rows_per_block is chosen from the per-device path count (identical on
    every device; equals the single-device choice for power-of-two counts).
    """
    from montecarlo_risk_engine_tpu.ops.pallas_paths import (
        _LANES,
        pick_rows_for_model,
    )

    axis = _path_axis(sharding)
    n_dev = int(sharding.mesh.shape[axis])
    if num_paths % n_dev:
        raise ValueError(f"num_paths {num_paths} not divisible by {n_dev} devices")
    rows = pick_rows_for_model(model, num_paths // n_dev,
                               outputs_per_path=outputs_per_path)
    if rows is None:
        raise ValueError(
            f"per-device path count {num_paths // n_dev} not blockable for Pallas"
        )

    def path_fn(p, local_paths, offset):
        return model.pallas_paths(
            p, scheme, timeline, local_paths, num_steps,
            seed=seed, phase=phase, block_offset=offset, rows_per_block=rows,
        )

    return shard_paths_over_mesh(path_fn, params, sharding, num_paths,
                                 rows * _LANES)


def sharded_pallas_paths_with_noise(model, params, scheme, timeline,
                                    num_paths: int, seed: int, phase: int,
                                    sharding: NamedSharding,
                                    outputs_per_path: int):
    """Noise-emitting kernel forward sharded over the mesh, for the
    emitted-noise AD wrapper (``pallas_ad_mode() == "emit"``): returns
    (states [T, N, D], z [T, N, sim], u [T, N]) each sharded on the path
    axis.  Same global-block seeding contract as sharded_pallas_paths."""
    from montecarlo_risk_engine_tpu.ops.pallas_paths import (
        _LANES,
        pick_rows_for_model,
    )

    mesh = sharding.mesh
    axis = _path_axis(sharding)
    n_dev = int(mesh.shape[axis])
    if num_paths % n_dev:
        raise ValueError(f"num_paths {num_paths} not divisible by {n_dev} devices")
    local_paths = num_paths // n_dev
    rows = pick_rows_for_model(model, local_paths,
                               outputs_per_path=outputs_per_path)
    if rows is None:
        raise ValueError(
            f"per-device path count {local_paths} not blockable for Pallas"
        )
    blocks_per_dev = -(-local_paths // (rows * _LANES))  # padded count

    def local_fn(p):
        offset = jax.lax.axis_index(axis) * blocks_per_dev
        return model.pallas_paths_with_noise(
            p, scheme, timeline, local_paths,
            seed=seed, phase=phase, block_offset=offset, rows_per_block=rows,
        )

    out_specs = (
        PartitionSpec(None, axis, None),  # states [T, N, D]
        PartitionSpec(None, axis, None),  # z [T, N, sim]
        PartitionSpec(None, axis),        # u [T, N]
    )
    try:
        smap = shard_map(local_fn, mesh=mesh, in_specs=(PartitionSpec(),),
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax
        smap = shard_map(local_fn, mesh=mesh, in_specs=(PartitionSpec(),),
                         out_specs=out_specs)
    return smap(params)
