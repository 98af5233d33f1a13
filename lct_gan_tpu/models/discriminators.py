"""Multi-period (MPD) and multi-scale (MSD) waveform discriminators,
HiFi-GAN style, matching the reference's models/discriminators.py.

TPU-first notes:
  * All tensors are channels-last ([B, T, C] / [B, H, W, C]) -- the native
    TPU conv layout. The reference's NCHW logits/fmaps differ only by a
    transpose; every loss consuming them (MSE / L1 / means) is
    layout-invariant, so parity holds without extra copies.
  * Period reshape ([B, T] -> [B, T//P, P, 1]) is a pure reshape; the
    reflect pad to a multiple of P is static per input length.
  * Grouped convs map to feature_group_count, which XLA lowers to batched
    MXU GEMMs.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lct_gan_tpu.models.norm import SNConv, WNConv

__all__ = [
    "PeriodDiscriminator",
    "MultiPeriodDiscriminator",
    "ScaleDiscriminator",
    "MultiScaleDiscriminator",
]


def _leaky(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.2)


class PeriodDiscriminator(nn.Module):
    """Period-P waveform discriminator
    (reference: models/discriminators.py:9-103).

    Reshapes [B, T] -> [B, T//P, P, 1] (after right reflect-pad to a
    multiple of P) and applies 5 norm'd Conv2d (k=(5,1), s=(3,1), grouped,
    channels 1->32->128->512->1024->1024) + a (3,1) post conv to 1 channel.

    Returns (logits [B, H, W, 1], feature_maps list incl. post).
    """

    period: int
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        if x.ndim == 3:  # [B, 1, T] reference-style
            x = x[:, 0]
        B, T = x.shape
        P = self.period
        if T % P != 0:
            pad = P - (T % P)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            T = T + pad
        h = x.reshape(B, T // P, P, 1)

        conv_cls: Type[nn.Module] = SNConv if self.use_spectral_norm else WNConv
        cfgs = [  # (out_channels, kernel_t, stride_t, groups)
            (32, 5, 3, 1),
            (128, 5, 3, 4),
            (512, 5, 3, 16),
            (1024, 5, 3, 64),
            (1024, 5, 1, 64),
        ]
        fmaps: List[jax.Array] = []
        for i, (out_ch, k, s, g) in enumerate(cfgs):
            h = conv_cls(
                features=out_ch,
                kernel_size=(k, 1),
                strides=(s, 1),
                padding=(k // 2, 0),
                groups=g,
                dtype=self.dtype,
                name=f"conv{i}")(h)
            h = _leaky(h)
            # fmaps stay in the compute dtype: under --bf16 the f32
            # upcast cost ~14 ms/step of convert+write traffic (xprof)
            # and doubled the FM-loss reads; the FM loss accumulates in
            # f32 regardless (losses.feature_matching_loss).
            fmaps.append(h)
        h = conv_cls(
            features=1, kernel_size=(3, 1), strides=(1, 1), padding=(1, 0),
            dtype=self.dtype, name="conv_post")(h)
        h = h.astype(jnp.float32)
        fmaps.append(h)
        return h, fmaps


class MultiPeriodDiscriminator(nn.Module):
    """MPD over periods (2, 3, 5, 7, 11)
    (reference: models/discriminators.py:106-147)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array
    ) -> Tuple[List[jax.Array], List[List[jax.Array]]]:
        logits_list, fmaps_list = [], []
        for p in self.periods:
            logits, fmaps = PeriodDiscriminator(
                period=p,
                use_spectral_norm=self.use_spectral_norm,
                dtype=self.dtype,
                name=f"disc_p{p}")(x)
            logits_list.append(logits)
            fmaps_list.append(fmaps)
        return logits_list, fmaps_list


def _avg_pool1d_no_pad_count(x: jax.Array) -> jax.Array:
    """torch AvgPool1d(kernel=4, stride=2, padding=2,
    count_include_pad=False) on [B, T, C]
    (reference: models/discriminators.py:252-255)."""
    B, T, C = x.shape
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 4, 1),
        window_strides=(1, 2, 1),
        padding=((0, 0), (2, 2), (0, 0)))
    t_out = summed.shape[1]
    # Static per-position valid-sample counts.
    starts = np.arange(t_out) * 2 - 2
    counts = (np.minimum(starts + 4, T) - np.maximum(starts, 0)).astype(
        np.float32)
    return summed / jnp.asarray(counts)[None, :, None]


class ScaleDiscriminator(nn.Module):
    """Single-scale 1D waveform discriminator
    (reference: models/discriminators.py:150-224)."""

    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        if x.ndim == 2:
            x = x[:, :, None]  # [B, T, 1]
        conv_cls: Type[nn.Module] = SNConv if self.use_spectral_norm else WNConv
        cfgs = [  # (out_channels, kernel, stride, groups)
            (16, 15, 1, 1),
            (64, 41, 4, 4),
            (256, 41, 4, 16),
            (1024, 41, 4, 64),
            (1024, 41, 4, 256),
            (1024, 5, 1, 1),
        ]
        fmaps: List[jax.Array] = []
        h = x
        for i, (out_ch, k, s, g) in enumerate(cfgs):
            h = conv_cls(
                features=out_ch, kernel_size=(k,), strides=(s,),
                padding=(k // 2,), groups=g, dtype=self.dtype,
                name=f"conv{i}")(h)
            h = _leaky(h)
            fmaps.append(h)  # compute dtype; see PeriodDiscriminator
        h = conv_cls(features=1, kernel_size=(3,), strides=(1,),
                     padding=(1,), dtype=self.dtype, name="conv_post")(h)
        h = h.astype(jnp.float32)
        fmaps.append(h)
        return h, fmaps


class MultiScaleDiscriminator(nn.Module):
    """MSD over 3 scales with AvgPool1d(4,2,2) downsampling between scales;
    spectral norm on the first scale only when use_spectral_norm=True
    (reference: models/discriminators.py:227-286)."""

    num_scales: int = 3
    use_spectral_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array
    ) -> Tuple[List[jax.Array], List[List[jax.Array]]]:
        if x.ndim == 2:
            x = x[:, :, None]
        logits_list, fmaps_list = [], []
        h = x
        for i in range(self.num_scales):
            logits, fmaps = ScaleDiscriminator(
                use_spectral_norm=(self.use_spectral_norm and i == 0),
                dtype=self.dtype,
                name=f"disc_s{i}")(h)
            logits_list.append(logits)
            fmaps_list.append(fmaps)
            h = _avg_pool1d_no_pad_count(h)
        return logits_list, fmaps_list
