"""Training losses: multi-resolution STFT, LS/hinge GAN, feature matching,
compressed-mask MSE. Pure functions over jnp arrays; weighting identical to
the reference (losses.py:11-181, train.py:240-243).

All discriminator-logit/fmap losses are means over whole tensors, so they
are layout-invariant to our channels-last discriminator outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from lct_gan_tpu.sigproc import STFTConfig, magnitude, stft

__all__ = [
    "MRSTFTLossConfig",
    "MultiResolutionSTFTLoss",
    "mr_stft_loss",
    "discriminator_loss",
    "generator_adv_loss",
    "feature_matching_loss",
    "mask_mse_loss",
    "flatten_logits_lists",
]


@dataclasses.dataclass(frozen=True)
class MRSTFTLossConfig:
    """Reference: losses.py:11-19."""

    fft_sizes: Tuple[int, ...] = (320, 512, 768)
    hop_factors: Tuple[float, ...] = (0.5, 0.5, 0.5)
    mag_weight: float = 1.0
    complex_weight: float = 1.0
    main_fft_size: int = 512
    main_fft_weight: float = 2.0
    default_weight: float = 1.0

    def stft_configs(self) -> Tuple[STFTConfig, ...]:
        return tuple(
            STFTConfig(n_fft=n, hop_length=int(round(n * h)),
                       win_length=n).finalize()
            for n, h in zip(self.fft_sizes, self.hop_factors))

    def weights(self) -> Tuple[float, ...]:
        return tuple(
            self.main_fft_weight if n == self.main_fft_size
            else self.default_weight for n in self.fft_sizes)


def mr_stft_loss(
    y_hat: jax.Array,
    y: jax.Array,
    cfg: MRSTFTLossConfig = MRSTFTLossConfig(),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Multi-resolution STFT loss (reference: losses.py:22-100).

    Per resolution: MSE on magnitudes + mean squared complex difference,
    combined with per-resolution weights (main 512-pt resolution weighted
    2x) and normalized by the weight sum.
    """
    if y_hat.ndim != 2 or y.ndim != 2:
        raise ValueError(
            f"mr_stft_loss wants 2-D [batch, samples] waveforms; "
            f"got {y_hat.shape} and {y.shape}")
    total = 0.0
    mag_total = 0.0
    complex_total = 0.0
    weight_sum = 0.0
    for scfg, w in zip(cfg.stft_configs(), cfg.weights()):
        Y_hat = stft(y_hat, scfg)
        Y = stft(y, scfg)
        mag_loss = jnp.mean(jnp.square(magnitude(Y_hat) - magnitude(Y)))
        diff = Y_hat - Y
        complex_loss = jnp.mean(jnp.square(diff.real) + jnp.square(diff.imag))
        total = total + w * (cfg.mag_weight * mag_loss +
                             cfg.complex_weight * complex_loss)
        mag_total = mag_total + w * mag_loss
        complex_total = complex_total + w * complex_loss
        weight_sum += w
    if weight_sum > 0:
        total = total / weight_sum
        mag_total = mag_total / weight_sum
        complex_total = complex_total / weight_sum
    details = {
        "mrstft_total": jax.lax.stop_gradient(total),
        "mrstft_mag": jax.lax.stop_gradient(mag_total),
        "mrstft_complex": jax.lax.stop_gradient(complex_total),
    }
    return total, details


def mr_stft_loss_per_sample(
    y_hat: jax.Array,
    y: jax.Array,
    cfg: MRSTFTLossConfig = MRSTFTLossConfig(),
) -> jax.Array:
    """Per-utterance MR-STFT loss: same math as `mr_stft_loss` but the
    means run over frequency/time only, returning a [B] vector.

    Used by validation so padded tail-batch rows can be excluded from the
    epoch mean instead of silently biasing it (the scalar loss averages
    over every row, duplicates included). `mr_stft_loss(x, y)[0]` equals
    `mr_stft_loss_per_sample(x, y).mean()` exactly.
    """
    if y_hat.ndim != 2 or y.ndim != 2:
        raise ValueError(
            f"mr_stft_loss_per_sample wants 2-D [batch, samples] waveforms; "
            f"got {y_hat.shape} and {y.shape}")
    total = jnp.zeros((y.shape[0],), jnp.float32)
    weight_sum = 0.0
    for scfg, w in zip(cfg.stft_configs(), cfg.weights()):
        Y_hat = stft(y_hat, scfg)
        Y = stft(y, scfg)
        mag_loss = jnp.mean(jnp.square(magnitude(Y_hat) - magnitude(Y)),
                            axis=(1, 2))
        diff = Y_hat - Y
        complex_loss = jnp.mean(
            jnp.square(diff.real) + jnp.square(diff.imag), axis=(1, 2))
        total = total + w * (cfg.mag_weight * mag_loss +
                             cfg.complex_weight * complex_loss)
        weight_sum += w
    if weight_sum > 0:
        total = total / weight_sum
    return total


class MultiResolutionSTFTLoss:
    """Callable wrapper mirroring the reference module interface
    (losses.py:22)."""

    def __init__(self, cfg: MRSTFTLossConfig | None = None):
        self.cfg = cfg if cfg is not None else MRSTFTLossConfig()

    def __call__(self, y_hat: jax.Array, y: jax.Array):
        return mr_stft_loss(y_hat, y, self.cfg)


def flatten_logits_lists(*logits_lists) -> List[jax.Array]:
    """Concat MPD+MSD logits lists (reference: losses.py:103-107)."""
    flat: List[jax.Array] = []
    for lst in logits_lists:
        flat.extend(list(lst))
    return flat


def discriminator_loss(real_logits: Sequence[jax.Array],
                       fake_logits: Sequence[jax.Array],
                       loss_type: str = "ls") -> jax.Array:
    """LS or hinge discriminator loss, averaged over logit tensors
    (reference: losses.py:110-135)."""
    if len(real_logits) != len(fake_logits):
        raise ValueError(
            f"logit list mismatch: {len(real_logits)} real vs "
            f"{len(fake_logits)} fake")
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        if loss_type == "ls":
            loss = loss + jnp.mean(jnp.square(r - 1.0)) + jnp.mean(
                jnp.square(f))
        elif loss_type == "hinge":
            loss = loss + jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(
                jax.nn.relu(1.0 + f))
        else:
            raise ValueError(f"Unknown loss_type: {loss_type}")
    return loss / max(len(real_logits), 1)


def generator_adv_loss(fake_logits: Sequence[jax.Array],
                       loss_type: str = "ls") -> jax.Array:
    """Reference: losses.py:138-151."""
    loss = 0.0
    for f in fake_logits:
        if loss_type == "ls":
            loss = loss + jnp.mean(jnp.square(f - 1.0))
        elif loss_type == "hinge":
            loss = loss - jnp.mean(f)
        else:
            raise ValueError(f"Unknown loss_type: {loss_type}")
    return loss / max(len(fake_logits), 1)


def feature_matching_loss(real_fmaps: Sequence[Sequence[jax.Array]],
                          fake_fmaps: Sequence[Sequence[jax.Array]]
                          ) -> jax.Array:
    """L1 over every (real, fake) feature-map pair, averaged by pair count
    (reference: losses.py:154-173)."""
    if len(real_fmaps) != len(fake_fmaps):
        raise ValueError(
            f"fmap outer-list mismatch: {len(real_fmaps)} real vs "
            f"{len(fake_fmaps)} fake sub-discriminators")
    loss = 0.0
    count = 0
    for r_list, f_list in zip(real_fmaps, fake_fmaps):
        if len(r_list) != len(f_list):
            raise ValueError(
                f"one sub-discriminator produced {len(r_list)} real but "
                f"{len(f_list)} fake feature maps")
        for r, f in zip(r_list, f_list):
            # dtype=f32: feature maps may arrive bf16 (discriminator
            # --bf16 compute path); the mean must accumulate in f32.
            loss = loss + jnp.mean(jnp.abs(f - r), dtype=jnp.float32)
            count += 1
    if count == 0:
        return jnp.asarray(0.0)
    return loss / count


def mask_mse_loss(pred_mask_c: jax.Array,
                  target_mask_c: jax.Array) -> jax.Array:
    """MSE between predicted compressed mask and IRM^c
    (reference: losses.py:176-181)."""
    if pred_mask_c.shape != target_mask_c.shape:
        raise ValueError(
            f"Shape mismatch: pred {pred_mask_c.shape} vs "
            f"target {target_mask_c.shape}")
    return jnp.mean(jnp.square(pred_mask_c - target_mask_c))
