"""Global configuration: dtype policy and simulation-scheme enum.

TPU-native counterpart of the reference's ``src/common/packages.py`` (device /
FLOAT globals, packages.py:10-11) and ``src/common/enums.py`` (SimulationScheme,
enums.py:4-9).

Design notes (TPU-first):
  * There is no mutable global "device" — placement is governed by jax
    shardings / the active mesh (see ``parallel/mesh.py``).
  * The working dtype is configurable.  The reference hard-codes float64 on
    CPU; on TPU float64 is software-emulated, so the engine defaults to the
    widest dtype the runtime supports (float64 under ``jax_enable_x64``,
    float32 otherwise) and every array the engine creates goes through
    :func:`real_dtype`.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

_dtype_override = None


def set_real_dtype(dtype) -> None:
    """Force the engine's working float dtype (e.g. ``jnp.float32`` on TPU)."""
    global _dtype_override
    _dtype_override = None if dtype is None else jnp.dtype(dtype)


def real_dtype():
    """The working float dtype: override > (float64 iff x64 enabled) > float32."""
    if _dtype_override is not None:
        return _dtype_override
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)


def int_dtype():
    return jnp.dtype(jnp.int64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.int32)


def asarray(x):
    """Convert to a jnp array in the working float dtype."""
    return jnp.asarray(x, dtype=real_dtype())


class SimulationScheme(enum.Enum):
    """Discretisation schemes (reference: src/common/enums.py:4-9).

    MILSTEIN exists in the reference enum but is neither dispatched nor
    implemented there (engine.py:28-33, model.py:129-133 — quirk Q1).  Here it
    is a first-class scheme implemented for models with tractable derivatives
    of the diffusion coefficient.
    """

    EULER = 0
    MILSTEIN = 1
    ANALYTICAL = 2
    QE = 3


def enable_compilation_cache(path: str = "/tmp/jax_compile_cache") -> None:
    """Enable JAX's persistent compilation cache for repeated cold starts.

    The controller's traced pipelines are byte-deterministic across processes
    (request-plan iteration is sorted; see requests._req_order), so identical
    run configurations reuse the AOT-compiled executables: measured 219s ->
    48s cold on the north-star book (docs/TUNING.md).
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
