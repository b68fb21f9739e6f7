"""Enable JAX's persistent compilation cache for benchmark harnesses."""

from montecarlo_risk_engine_tpu.config import enable_compilation_cache


def enable(path: str = "/tmp/jax_compile_cache") -> None:
    enable_compilation_cache(path)
