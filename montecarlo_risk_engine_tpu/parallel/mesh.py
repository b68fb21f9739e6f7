"""Device mesh and path-axis sharding helpers.

The reference is single-process CPU with no parallelism beyond tensor
vectorisation (SURVEY.md §2.4).  The TPU-native scaling story is data
parallelism over the *paths* axis: Monte Carlo paths are embarrassingly
parallel, so every [num_paths, ...] array is sharded over a 1-D mesh and XLA
inserts the psum/all-gather collectives for metric reductions, Gram-matrix
accumulation (LSM), and quantiles — the user code stays single-program.

Usage:
    mesh = make_path_mesh()                      # all local devices
    sharding = path_sharding(mesh)
    sc = SimulationController(..., path_sharding=sharding)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

PATH_AXIS = "paths"


def make_path_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the paths axis using (a prefix of) the local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (PATH_AXIS,))


def path_sharding(mesh: Mesh, extra_dims: int = 0) -> NamedSharding:
    """Sharding placing the leading (paths) axis across the mesh.

    With jax's partial specs, [N] and [N, d] arrays both accept
    ``P(PATH_AXIS)`` — trailing dims stay replicated.
    """
    return NamedSharding(mesh, PartitionSpec(PATH_AXIS))


def pad_to_multiple(n: int, devices: int) -> int:
    """Smallest path count >= n divisible by the device count."""
    return ((n + devices - 1) // devices) * devices
