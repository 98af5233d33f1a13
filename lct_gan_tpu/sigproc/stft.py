"""TPU-native STFT / iSTFT and time-frequency mask algebra.

This is the signal-processing core of the framework: everything above it
(feature pipeline, generator, MR-STFT loss) reuses these functions.

Semantics match the reference implementation's use of torch.stft/torch.istft
(reference: datasets/stft.py:37-132) so that converted checkpoints produce
bit-close waveforms:

  * center=True       -> reflect-pad n_fft//2 on both sides
  * onesided=True     -> rFFT, F = n_fft//2 + 1 bins
  * normalized=False  -> plain (unscaled) DFT
  * window='hann'     -> periodic Hann (torch.hann_window default)
  * istft             -> windowed overlap-add divided by the window-square
                         envelope, center-unpadded, optional `length` trim

TPU-first design notes
----------------------
All shapes are static under jit. For the configurations this framework uses
(hop divides the window length; 50% overlap everywhere) both framing and
overlap-add are expressed as reshapes + slices + adds -- **no gather and no
scatter** -- which XLA fuses and lays out well on the VPU. The generic-hop
fallback uses take/segment-add. The window-square OLA envelope depends only
on static shapes, so its reciprocal is baked in as a compile-time constant
instead of being recomputed on device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "STFTConfig",
    "hann_window",
    "frame_signal",
    "overlap_add",
    "stft",
    "istft",
    "ComplexSTFT",
    "make_lct_stft",
    "magnitude",
    "compress",
    "decompress",
    "compute_compressed_irm",
    "decompress_mask",
    "apply_mask",
]


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """Configuration for STFT/iSTFT (reference: datasets/stft.py:10-34).

    Generic so it serves both the main TF representation used by the
    generator and the multi-resolution STFTs used in the loss.
    """

    n_fft: int = 512
    hop_length: Optional[int] = None  # default: n_fft // 2
    win_length: Optional[int] = None  # default: n_fft
    window: str = "hann"
    center: bool = True
    pad_mode: str = "reflect"
    normalized: bool = False
    onesided: bool = True

    def finalize(self) -> "STFTConfig":
        """Fill hop_length/win_length defaults (frozen -> returns a copy)."""
        hop = self.hop_length if self.hop_length is not None else self.n_fft // 2
        win = self.win_length if self.win_length is not None else self.n_fft
        return dataclasses.replace(self, hop_length=hop, win_length=win)

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1 if self.onesided else self.n_fft

    def num_frames(self, num_samples: int) -> int:
        pad = self.n_fft // 2 if self.center else 0
        return 1 + (num_samples + 2 * pad - self.n_fft) // self.hop_length


@functools.lru_cache(maxsize=None)
def _hann_np(win_length: int) -> np.ndarray:
    """Periodic Hann window (same values as torch.hann_window(N))."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_hann_np(win_length), dtype=dtype)


def _padded_window_np(cfg: STFTConfig) -> np.ndarray:
    """Window zero-padded symmetrically to n_fft, as torch.stft does."""
    if cfg.window != "hann":
        raise ValueError("Only 'hann' window is currently supported.")
    w = _hann_np(cfg.win_length)
    if cfg.win_length < cfg.n_fft:
        left = (cfg.n_fft - cfg.win_length) // 2
        w = np.pad(w, (left, cfg.n_fft - cfg.win_length - left))
    elif cfg.win_length > cfg.n_fft:
        raise ValueError("win_length must be <= n_fft")
    return w


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Slice a batch of signals into overlapping frames.

    Args:
      x: [B, T] already padded; caller guarantees (T - frame_length) % hop == 0
         is not required -- trailing partial frames are dropped like torch.

    Returns:
      frames: [B, N, frame_length] with N = 1 + (T - frame_length) // hop.
    """
    B, T = x.shape
    n_frames = 1 + (T - frame_length) // hop
    if frame_length % hop == 0:
        # Fast path: frame_length = r * hop. Reshape the signal into hop-sized
        # blocks; frame i is the concatenation of blocks i .. i+r-1. This is
        # r static slices + concat: no gather.
        r = frame_length // hop
        n_blocks_needed = n_frames + r - 1
        usable = n_blocks_needed * hop
        if usable > T:
            x = jnp.pad(x, ((0, 0), (0, usable - T)))
        blocks = x[:, :usable].reshape(B, n_blocks_needed, hop)
        parts = [blocks[:, k:k + n_frames, :] for k in range(r)]
        return jnp.concatenate(parts, axis=-1)
    # Generic fallback: one gather over frame start indices.
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[:, idx]


def overlap_add(frames: jax.Array, hop: int, out_length: int) -> jax.Array:
    """Overlap-add frames back into a signal.

    Args:
      frames: [B, N, L]
      hop: hop size
      out_length: (N - 1) * hop + L

    Returns:
      y: [B, out_length]
    """
    B, N, L = frames.shape
    if L % hop == 0:
        # Fast path: split each frame into r = L // hop chunks; output block j
        # (of size hop) = sum_k frames[j - k, chunk k]. Pure pad + add.
        r = L // hop
        chunks = frames.reshape(B, N, r, hop)
        total_blocks = N + r - 1
        y = jnp.zeros((B, total_blocks, hop), dtype=frames.dtype)
        for k in range(r):
            y = y.at[:, k:k + N, :].add(chunks[:, :, k, :])
        return y.reshape(B, total_blocks * hop)[:, :out_length]
    # Generic fallback: scatter-add.
    starts = np.arange(N) * hop
    idx = (starts[:, None] + np.arange(L)[None, :]).reshape(-1)
    flat = frames.reshape(B, N * L)
    y = jnp.zeros((B, out_length), dtype=frames.dtype)
    return y.at[:, idx].add(flat)


def stft(waveform: jax.Array, cfg: STFTConfig) -> jax.Array:
    """Complex STFT of a batch of waveforms.

    Args:
      waveform: [B, T] float array.

    Returns:
      complex64 [B, F, N] (onesided) -- same layout as the reference
      (datasets/stft.py:59-88).
    """
    cfg = cfg.finalize()
    if waveform.ndim != 2:
        raise ValueError(f"Expected waveform [B, T], got {waveform.shape}")
    x = waveform.astype(jnp.float32)
    if cfg.center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length)  # [B, N, n_fft]
    window = jnp.asarray(_padded_window_np(cfg))
    frames = frames * window
    if cfg.onesided:
        spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    else:
        spec = jnp.fft.fft(frames, n=cfg.n_fft, axis=-1)
    if cfg.normalized:
        spec = spec / np.sqrt(cfg.n_fft)
    return jnp.swapaxes(spec, 1, 2).astype(jnp.complex64)  # [B, F, N]


@functools.lru_cache(maxsize=None)
def _ola_envelope_inv_np(cfg: STFTConfig, n_frames: int,
                         out_length: int) -> np.ndarray:
    """Reciprocal of the window-square overlap-add envelope.

    Static-shape constant (baked in at trace time); torch.istft computes this
    on device every call.
    """
    w = _padded_window_np(cfg).astype(np.float64)
    w2 = w * w
    env = np.zeros(out_length, dtype=np.float64)
    for i in range(n_frames):
        s = i * cfg.hop_length
        env[s:s + cfg.n_fft] += w2
    # Guard: zeros only ever occur inside the removed center padding.
    safe = np.where(env > 1e-11, env, 1.0)
    return (1.0 / safe).astype(np.float32)


def istft(stft_matrix: jax.Array,
          cfg: STFTConfig,
          length: Optional[int] = None) -> jax.Array:
    """Inverse STFT matching torch.istft semantics (datasets/stft.py:90-132).

    Args:
      stft_matrix: complex [B, F, N]
      length: optional output length (zero-padded / trimmed to match).

    Returns:
      waveform [B, T]
    """
    cfg = cfg.finalize()
    if stft_matrix.ndim != 3:
        raise ValueError(
            f"Expected stft_matrix [B, F, N], got {stft_matrix.shape}")
    spec = jnp.swapaxes(stft_matrix, 1, 2)  # [B, N, F]
    n_frames = spec.shape[1]
    if cfg.normalized:
        spec = spec * np.sqrt(cfg.n_fft)
    if cfg.onesided:
        frames = jnp.fft.irfft(spec, n=cfg.n_fft, axis=-1)
    else:
        frames = jnp.fft.ifft(spec, axis=-1).real
    window = jnp.asarray(_padded_window_np(cfg))
    frames = frames.astype(jnp.float32) * window

    full_length = (n_frames - 1) * cfg.hop_length + cfg.n_fft
    y = overlap_add(frames, cfg.hop_length, full_length)
    env_inv = jnp.asarray(_ola_envelope_inv_np(cfg, n_frames, full_length))
    y = y * env_inv

    pad = cfg.n_fft // 2 if cfg.center else 0
    if length is None:
        end = full_length - pad
        return y[:, pad:end]
    have = full_length - pad
    if length <= have:
        return y[:, pad:pad + length]
    return jnp.pad(y[:, pad:], ((0, 0), (0, length - have)))


class ComplexSTFT:
    """Thin stateless convenience wrapper bundling a config.

    Mirrors the reference's ComplexSTFT module interface
    (datasets/stft.py:37-132) but is a plain callable -- there are no
    buffers/parameters; the window is a compile-time constant.
    """

    def __init__(self, cfg: STFTConfig):
        if cfg.window.lower() != "hann":
            raise ValueError("Only 'hann' window is currently supported.")
        self.cfg = cfg.finalize()

    def __call__(self, waveform: jax.Array) -> jax.Array:
        return stft(waveform, self.cfg)

    def istft(self,
              stft_matrix: jax.Array,
              length: Optional[int] = None) -> jax.Array:
        return istft(stft_matrix, self.cfg, length=length)


def make_lct_stft(n_fft: int = 512,
                  hop_length: Optional[int] = None,
                  win_length: Optional[int] = None) -> ComplexSTFT:
    """The canonical 512-point / 50%-overlap / Hann STFT
    (reference: datasets/stft.py:293-312)."""
    cfg = STFTConfig(
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window="hann",
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
    ).finalize()
    return ComplexSTFT(cfg)


# ====== Magnitude / compression helpers ======


def magnitude(stft_matrix: jax.Array,
              power: float = 1.0,
              eps: float = 1e-12) -> jax.Array:
    """Magnitude (or power) spectrogram, floored at eps
    (reference: datasets/stft.py:138-160)."""
    mag = jnp.maximum(jnp.abs(stft_matrix), eps)
    if power != 1.0:
        mag = mag ** power
    return mag


def compress(x: jax.Array, c: float = 0.3, eps: float = 1e-12) -> jax.Array:
    """Power-law magnitude compression x^c (datasets/stft.py:163-169)."""
    return jnp.maximum(x, eps) ** c


def decompress(x_c: jax.Array, c: float = 0.3,
               eps: float = 1e-12) -> jax.Array:
    """Undo magnitude compression x^(1/c) (datasets/stft.py:172-178)."""
    return jnp.maximum(x_c, eps) ** (1.0 / c)


def compute_compressed_irm(clean_stft: jax.Array,
                           noisy_stft: jax.Array,
                           c: float = 0.3,
                           gamma: float = 1e-12,
                           eps: float = 1e-12) -> jax.Array:
    """Compressed Ideal Ratio Mask IRM^c = |S|^c / (|X|^c + gamma)
    (reference: datasets/stft.py:184-218)."""
    clean_mag_c = jnp.maximum(jnp.abs(clean_stft), eps) ** c
    noisy_mag_c = jnp.maximum(jnp.abs(noisy_stft), eps) ** c
    return clean_mag_c / (noisy_mag_c + gamma)


def decompress_mask(mask_c: jax.Array,
                    c: float = 0.3,
                    eps: float = 1e-12) -> jax.Array:
    """Compressed mask -> linear domain (datasets/stft.py:221-240)."""
    return decompress(mask_c, c=c, eps=eps)


def apply_mask(noisy_stft: jax.Array,
               mask: jax.Array,
               compressed: bool = False,
               c: float = 0.3,
               eps: float = 1e-12) -> jax.Array:
    """Apply a (possibly compressed) real TF mask to a complex STFT
    (reference: datasets/stft.py:243-290).

    Accepts mask [B, F, N] or [B, 1, F, N].
    """
    if mask.ndim == 4:
        if mask.shape[1] != 1:
            raise ValueError(f"Expected mask [B, 1, F, N], got {mask.shape}")
        mask = mask[:, 0]
    if mask.ndim != 3:
        raise ValueError(
            f"Expected mask [B, F, N] (or [B, 1, F, N]), got {mask.shape}")
    if compressed:
        mask = decompress_mask(mask, c=c, eps=eps)
    mask = jnp.maximum(mask, 0.0)
    return noisy_stft * mask.astype(noisy_stft.dtype)
