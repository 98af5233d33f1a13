"""Test configuration: force JAX onto a virtual 8-device CPU backend.

pytest's plugin set (jaxtyping) imports jax before this conftest runs, so
plain env vars are too late for JAX_PLATFORMS. The XLA backend itself is
initialized lazily though, so jax.config.update() still works here -- as
long as no plugin has touched jax.devices() yet (none do).
"""

import os

platform = os.environ.get("LCT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)
