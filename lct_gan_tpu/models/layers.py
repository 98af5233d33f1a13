"""Param-compatible LayerNorm / Dense with a `return_params` mode.

The fused FTF-block kernel (lct_gan_tpu/ops/ftf.py) consumes the block's
raw parameter arrays. flax.linen.LayerNorm/Dense create params only inside
their own __call__, so the blocks use these drop-in clones instead: same
param names ("scale"/"bias", "kernel"/"bias"), same default initializers,
same math (fast-variance LayerNorm, eps 1e-6) -- checkpoints and the
PyTorch converter are unaffected -- plus `return_params=True` to fetch the
arrays for the kernel without computing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LayerNorm", "Dense"]


class LayerNorm(nn.Module):
    """flax.linen.LayerNorm clone (fast-variance form) over the last axis."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 return_params: bool = False):
        if return_params:
            if x is None:
                raise ValueError("return_params needs x for the feature dim")
            features = x.shape[-1]
        else:
            features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        if return_params:
            return scale, bias
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(
            0.0,
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu))
        return (x - mu) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class Dense(nn.Module):
    """flax.linen.Dense clone (lecun_normal kernel, zero bias)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, *, return_params: bool = False):
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if return_params:
            return kernel, bias
        return jnp.einsum("...c,cf->...f", x, kernel,
                          preferred_element_type=jnp.float32) + bias
