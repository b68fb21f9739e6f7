"""Enable JAX's persistent compilation cache for benchmark harnesses.

Verified to work through the axon remote-compile relay (a cross-process
second compile of the probe kernel dropped 2.25s -> 0.73s).  The big-book
pipelines cost minutes of AOT compile; re-runs of the same harness
configuration skip it entirely.
"""

import jax


def enable(path: str = "/tmp/jax_compile_cache") -> None:
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
