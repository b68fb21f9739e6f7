"""Multi-host (pod / pod-slice) initialisation helpers.

The single-controller code in this package runs unchanged on a multi-host
TPU pod slice: initialise the jax distributed runtime on every host, build a
global mesh over all devices, and hand the resulting sharding to
``SimulationController(path_sharding=...)``.  Paths shard over ICI within a
slice and DCN across slices; all reductions remain XLA collectives
(SURVEY.md §2.4 "multi-host via jax.distributed").

Typical pod-slice launch (same script on every host):

    from montecarlo_risk_engine_tpu.parallel import distributed
    sharding = distributed.initialize_and_make_sharding()
    controller = SimulationController(..., path_sharding=sharding)

Per-host path counts: keep ``num_paths`` divisible by
``jax.device_count()`` (global device count).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from montecarlo_risk_engine_tpu.parallel.mesh import PATH_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed.

    With no arguments, relies on the TPU environment auto-detection
    (GCE metadata / megascale env vars).  No-op when already initialised or
    single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialised (or single-process run) — fine
        pass


def global_path_mesh() -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) job."""
    return Mesh(np.array(jax.devices()), (PATH_AXIS,))


def initialize_and_make_sharding(**kwargs) -> NamedSharding:
    initialize(**kwargs)
    return NamedSharding(global_path_mesh(), PartitionSpec(PATH_AXIS))
