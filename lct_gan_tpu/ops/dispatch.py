"""Shared Pallas dispatch policy.

One place answers "should model code route through the fused TPU kernels,
and in which mode?" so every op (attention, FTF block) gates identically:

  * LCT_NO_PALLAS=1        -> never (pure jnp paths; CPU/GPU default)
  * LCT_PALLAS_INTERPRET=1 -> fused kernels in interpreter mode. This lets
    the CPU test mesh exercise the exact production dispatch path --
    pallas_call included -- under sharding (tests/test_pallas_attention.py).
  * otherwise              -> compiled kernels iff the backend is TPU.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Iterator, Optional

import jax

__all__ = ["pallas_mode", "pallas_override", "ftf_precise",
           "ftf_precise_override"]

_UNSET = object()
_override: contextvars.ContextVar = contextvars.ContextVar(
    "lct_pallas_override", default=_UNSET)
_precise_override: contextvars.ContextVar = contextvars.ContextVar(
    "lct_ftf_precise_override", default=_UNSET)


@contextlib.contextmanager
def pallas_override(mode: Optional[str]) -> Iterator[None]:
    """Scoped dispatch override for the current context: None (jnp path),
    'interpret', or 'compiled'. Takes precedence over the env vars, without
    mutating process-global state -- safe around concurrent traces (e.g.
    export during a live training run)."""
    if mode not in (None, "interpret", "compiled"):
        raise ValueError(f"invalid pallas mode {mode!r}")
    token = _override.set(mode)
    try:
        yield
    finally:
        _override.reset(token)


@contextlib.contextmanager
def ftf_precise_override(enabled: bool) -> Iterator[None]:
    """Scoped toggle for all-f32 FTF kernel GEMMs (fwd + fused bwd), so
    witnesses can assert tight numerical bands without mutating
    process-global state (same pattern as pallas_override). Takes
    precedence over the LCT_FTF_PRECISE env var."""
    token = _precise_override.set(bool(enabled))
    try:
        yield
    finally:
        _precise_override.reset(token)


def ftf_precise() -> bool:
    """Should the fused FTF kernels run their GEMMs in f32?"""
    ov = _precise_override.get()
    if ov is not _UNSET:
        return ov
    return bool(os.environ.get("LCT_FTF_PRECISE"))


def pallas_mode() -> Optional[str]:
    """None = jnp path; 'compiled' = fused TPU kernels; 'interpret' =
    fused kernels in interpreter mode (CPU-testable production path)."""
    ov = _override.get()
    if ov is not _UNSET:
        return ov
    if os.environ.get("LCT_NO_PALLAS"):
        return None
    if os.environ.get("LCT_PALLAS_INTERPRET"):
        return "interpret"
    try:
        return "compiled" if jax.default_backend() == "tpu" else None
    except Exception:
        return None
