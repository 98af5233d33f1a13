"""Weight-normalized / spectral-normalized convolutions for the waveform
discriminators (reference: models/discriminators.py:33, :162 use
torch.nn.utils.weight_norm / spectral_norm on every conv).

Weight norm follows torch's dim=0 semantics exactly: the direction tensor v
is normalized over all axes except the output-channel axis, and a per-output
gain g rescales it:  w = g * v / ||v||.  In our HWIO/WIO kernel layout the
output channel is the LAST axis, so the norm reduces over all leading axes.

Spectral norm power-iterates u on the [out, -1] matricization, one step per
call when `update_stats` is mutable (training), matching
torch.nn.utils.spectral_norm defaults (n_power_iterations=1, eps=1e-12).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["WNConv", "SNConv"]


def _conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
          strides: Sequence[int], padding: Sequence[Tuple[int, int]],
          groups: int, dtype: Any = jnp.float32) -> jax.Array:
    """Conv with optional reduced-precision compute: inputs/kernel are cast
    to `dtype` (params stay f32 at rest; the MXU accumulates f32 for bf16
    inputs regardless), the output stays in `dtype` so successive
    discriminator layers also halve their HBM traffic."""
    ndim_sp = kernel.ndim - 2
    if ndim_sp == 1:
        dn = ("NWC", "WIO", "NWC")
    elif ndim_sp == 2:
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        raise ValueError(f"Unsupported spatial rank {ndim_sp}")
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=tuple(strides),
        padding=tuple(padding),
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=dtype,
    )
    return y + bias.astype(dtype)


class WNConv(nn.Module):
    """Conv (1D or 2D by kernel_size rank) with torch-style weight norm."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Tuple[int, ...]
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch // self.groups, self.features)

        v = self.param(
            "v",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=-2, out_axis=-1),
            kshape)
        # torch weight_norm initializes g = ||v|| so w == v at init.
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(jnp.square(v), axis=tuple(range(v.ndim - 1)))),
            (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        axes = tuple(range(v.ndim - 1))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
        kernel = v * (g / jnp.maximum(norm, 1e-12))
        pads = tuple((p, p) for p in self.padding)
        return _conv(x, kernel, bias, self.strides, pads, self.groups,
                     self.dtype)


class SNConv(nn.Module):
    """Conv (1D or 2D) with torch-style spectral norm.

    Matches torch.nn.utils.spectral_norm (the old non-parametrize API the
    reference uses, discriminators.py:33): singular-vector estimates `u`
    and `v` are buffers in the 'spectral' variable collection. When the
    collection is mutable (training; pass mutable=['spectral'] to apply),
    one power iteration updates them and sigma uses the UPDATED vectors;
    when immutable (eval), sigma uses the stored vectors as-is -- exactly
    torch's do_power_iteration split.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Tuple[int, ...]
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch // self.groups, self.features)
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=-2, out_axis=-1),
            kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # Matricize with the output channel first (torch views weight as
        # [out, -1] for the power iteration).
        perm = (w.ndim - 1, *range(w.ndim - 1))
        mat = w.transpose(perm).reshape(self.features, -1)
        n_cols = mat.shape[1]

        def l2norm(t):
            return t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

        u_var = self.variable(
            "spectral", "u",
            lambda: l2norm(jax.random.normal(
                jax.random.PRNGKey(0), (self.features,))))
        v_var = self.variable(
            "spectral", "v",
            lambda: l2norm(jax.random.normal(
                jax.random.PRNGKey(1), (n_cols,))))
        u = u_var.value
        v = v_var.value

        updating = self.is_mutable_collection("spectral")
        if updating and not self.is_initializing():
            v = l2norm(jax.lax.stop_gradient(mat).T @ u)
            u = l2norm(jax.lax.stop_gradient(mat) @ v)
            u_var.value = u
            v_var.value = v
        sigma = u @ (mat @ v)

        # torch divides by sigma unguarded (it may be negative before the
        # first power iterations converge); matching exactly.
        kernel = w / sigma
        pads = tuple((p, p) for p in self.padding)
        return _conv(x, kernel, bias, self.strides, pads, self.groups,
                     self.dtype)
