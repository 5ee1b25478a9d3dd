"""Test harness config: run JAX on CPU with float64 enabled and 8 virtual
devices so multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 item 4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
