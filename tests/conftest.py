"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Mirrors the reference's CI (single-process CPU pytest with x64), plus a
virtual 8-device mesh so the multi-chip sharding paths are exercised — the
reference never tests its pmap paths (SURVEY.md §4).
"""

import os

# Must be set before the XLA backend initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
