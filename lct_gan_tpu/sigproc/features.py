"""TF-domain feature & target computation for training
(reference: datasets/tf_features.py).

Pure function over jnp arrays: wave pair -> dict of magnitude features and
the compressed-IRM target. Runs on device inside the jitted train step, so
the two STFTs fuse with the rest of the graph.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lct_gan_tpu.sigproc.stft import (
    STFTConfig,
    compress,
    compute_compressed_irm,
    magnitude,
    stft,
)

__all__ = ["TFFeaturesConfig", "compute_tf_features", "TFFeatures"]


@dataclasses.dataclass(frozen=True)
class TFFeaturesConfig:
    """Reference: datasets/tf_features.py:17-37."""

    n_fft: int = 512
    hop_length: Optional[int] = None
    win_length: Optional[int] = None
    c: float = 0.3
    compress_input: bool = False
    return_stfts: bool = True

    def stft_config(self) -> STFTConfig:
        return STFTConfig(
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
        ).finalize()


def compute_tf_features(
    noisy_wave: jax.Array,
    clean_wave: jax.Array,
    cfg: TFFeaturesConfig = TFFeaturesConfig(),
) -> Dict[str, jax.Array]:
    """Wave pair -> {noisy_mag, irm_c, noisy_mag_c[, noisy_stft, clean_stft]}
    (reference: datasets/tf_features.py:85-146)."""
    if noisy_wave.ndim != 2 or clean_wave.ndim != 2:
        raise ValueError(
            f"Expected [B, T] waves, got {noisy_wave.shape}, "
            f"{clean_wave.shape}")
    if noisy_wave.shape != clean_wave.shape:
        raise ValueError(
            f"noisy_wave and clean_wave must have same shape, got "
            f"{noisy_wave.shape} vs {clean_wave.shape}")

    scfg = cfg.stft_config()
    noisy_stft = stft(noisy_wave, scfg)
    clean_stft = stft(clean_wave, scfg)
    noisy_mag = magnitude(noisy_stft)
    irm_c = compute_compressed_irm(clean_stft, noisy_stft, c=cfg.c)
    noisy_mag_c = compress(noisy_mag, c=cfg.c)

    feats: Dict[str, jax.Array] = {
        "noisy_mag": noisy_mag_c if cfg.compress_input else noisy_mag,
        "irm_c": irm_c,
        "noisy_mag_c": noisy_mag_c,
    }
    if cfg.return_stfts:
        feats["noisy_stft"] = noisy_stft
        feats["clean_stft"] = clean_stft
    return feats


class TFFeatures:
    """Callable wrapper mirroring the reference module interface."""

    def __init__(self, cfg: TFFeaturesConfig | None = None):
        self.cfg = cfg if cfg is not None else TFFeaturesConfig()

    def __call__(self, noisy_wave: jax.Array,
                 clean_wave: jax.Array) -> Dict[str, jax.Array]:
        return compute_tf_features(noisy_wave, clean_wave, self.cfg)
