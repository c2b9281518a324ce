"""Test env: run JAX on CPU with 8 virtual devices (the idiomatic JAX fake
backend for multi-chip tests — SURVEY §4). Must run before jax backends
initialize, hence module-level in conftest."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
