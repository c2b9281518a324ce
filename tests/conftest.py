"""Test env: run JAX on CPU with 8 virtual devices (the idiomatic JAX fake
backend for multi-chip tests — SURVEY §4).

Note: the tunneled TPU plugin on this machine ignores the JAX_PLATFORMS
env var, so platform forcing must go through jax.config before any backend
initializes — hence the import here.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from snn_object_detectionddp_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
