"""Golden tests: sigproc STFT/iSTFT vs torch.stft/torch.istft (CPU oracle).

The reference pipeline is built on torch.stft semantics
(reference: datasets/stft.py); these tests pin our JAX implementation to
the same numerics for every configuration the framework uses
(512/256 main STFT + the 320/160 and 768/384 MR-STFT resolutions).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lct_gan_tpu.sigproc import (
    STFTConfig,
    stft,
    istft,
    magnitude,
    compress,
    decompress,
    compute_compressed_irm,
    apply_mask,
    make_lct_stft,
)

CONFIGS = [
    (512, 256, 512),
    (320, 160, 320),
    (768, 384, 768),
    (512, 128, 512),  # non-50% overlap exercise (hop divides win)
]


def _torch_stft(x, n_fft, hop, win):
    w = torch.hann_window(win)
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=w,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )


@pytest.mark.parametrize("n_fft,hop,win", CONFIGS)
def test_stft_matches_torch(n_fft, hop, win):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 16000)).astype(np.float32)

    ours = np.asarray(
        stft(jnp.asarray(x),
             STFTConfig(n_fft=n_fft, hop_length=hop, win_length=win)))
    ref = _torch_stft(x, n_fft, hop, win).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("n_fft,hop,win", CONFIGS)
def test_istft_matches_torch(n_fft, hop, win):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12345)).astype(np.float32)
    spec = _torch_stft(x, n_fft, hop, win)

    w = torch.hann_window(win)
    ref = torch.istft(
        spec, n_fft=n_fft, hop_length=hop, win_length=win, window=w,
        center=True, normalized=False, onesided=True, length=12345,
    ).numpy()

    ours = np.asarray(
        istft(jnp.asarray(spec.numpy()),
              STFTConfig(n_fft=n_fft, hop_length=hop, win_length=win),
              length=12345))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_istft_roundtrip_exact():
    """stft -> istft with length recovers the input waveform."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32000)).astype(np.float32)
    s = make_lct_stft(512)
    y = np.asarray(s.istft(s(jnp.asarray(x)), length=32000))
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-4)


def test_istft_default_length_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    spec = _torch_stft(x, 512, 256, 512)
    ref = torch.istft(
        spec, n_fft=512, hop_length=256, win_length=512,
        window=torch.hann_window(512), center=True, length=None,
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(spec.numpy()), STFTConfig()))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_magnitude_compress_roundtrip():
    rng = np.random.default_rng(4)
    z = (rng.standard_normal((2, 5, 7)) +
         1j * rng.standard_normal((2, 5, 7))).astype(np.complex64)
    mag = magnitude(jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(mag), np.maximum(np.abs(z), 1e-12), rtol=1e-6)
    c = compress(mag, c=0.3)
    back = decompress(c, c=0.3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mag),
                               rtol=1e-4, atol=1e-5)


def test_compressed_irm_range_and_formula():
    rng = np.random.default_rng(5)
    clean = (rng.standard_normal((2, 9, 11)) +
             1j * rng.standard_normal((2, 9, 11))).astype(np.complex64)
    noise = (rng.standard_normal((2, 9, 11)) +
             1j * rng.standard_normal((2, 9, 11))).astype(np.complex64)
    noisy = clean + noise
    irm = np.asarray(
        compute_compressed_irm(jnp.asarray(clean), jnp.asarray(noisy), c=0.3))
    expected = (np.maximum(np.abs(clean), 1e-12) ** 0.3 /
                (np.maximum(np.abs(noisy), 1e-12) ** 0.3 + 1e-12))
    np.testing.assert_allclose(irm, expected, rtol=1e-4)


def test_apply_mask_compressed_and_4d():
    rng = np.random.default_rng(6)
    z = (rng.standard_normal((2, 5, 7)) +
         1j * rng.standard_normal((2, 5, 7))).astype(np.complex64)
    mask_c = rng.uniform(0.1, 1.0, (2, 1, 5, 7)).astype(np.float32)
    out = np.asarray(
        apply_mask(jnp.asarray(z), jnp.asarray(mask_c), compressed=True, c=0.3))
    lin = np.maximum(mask_c[:, 0], 1e-12) ** (1 / 0.3)
    np.testing.assert_allclose(out, z * lin, rtol=1e-4, atol=1e-5)


def test_num_frames_helper():
    cfg = STFTConfig().finalize()
    assert cfg.num_frames(32000) == 126
    assert cfg.num_bins == 257
