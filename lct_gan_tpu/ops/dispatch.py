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

import os
from typing import Optional

import jax

__all__ = ["pallas_mode"]


def pallas_mode() -> Optional[str]:
    """None = jnp path; 'compiled' = fused TPU kernels; 'interpret' =
    fused kernels in interpreter mode (CPU-testable production path)."""
    if os.environ.get("LCT_NO_PALLAS"):
        return None
    if os.environ.get("LCT_PALLAS_INTERPRET"):
        return "interpret"
    try:
        return "compiled" if jax.default_backend() == "tpu" else None
    except Exception:
        return None
