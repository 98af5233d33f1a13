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

# Tests run on the CPU backend where torch coexists with jax; skip the
# subprocess isolation used for tunneled-TPU serving (see torch_import).
os.environ.setdefault("LCT_TORCH_INPROC", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

# Persistent compilation cache: the heavy GAN train-step XLA compile (~10
# min on this 1-core host) is paid once, then reused across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full train-loop drives)")
