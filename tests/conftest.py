"""Test configuration: CPU backend, 8 virtual devices, float64.

Mirrors the multi-node testing strategy in SURVEY.md §4: sharded code paths
are exercised on a virtual CPU mesh (xla_force_host_platform_device_count)
so no TPU hardware is required, and the closed-form/statistical oracles remain
hardware-independent.  float64 is enabled to match the reference's precision
contract (src/common/packages.py:11).

Note: this image's sitecustomize imports jax and registers a TPU backend at
interpreter startup, so JAX_PLATFORMS env tweaks are too late — the platform
must be forced through jax.config before any backend initialises.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("RUN_TPU_PALLAS_TESTS"):
    # TPU-hardware tests (test_pallas_kernel_tpu.py) need the real backend and
    # f32: run them in a separate pytest invocation with this env var set.
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
