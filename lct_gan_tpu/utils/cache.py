"""Persistent XLA compilation cache (big QoL win: the fused GAN train step
is a single large XLA program; caching makes repeat CLI runs start in
seconds instead of minutes)."""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(path: str | None = None) -> None:
    if os.environ.get("LCT_NO_COMPILE_CACHE"):
        return
    import jax

    if path is None:
        path = os.environ.get(
            "LCT_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "lct_gan_tpu",
                         "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
