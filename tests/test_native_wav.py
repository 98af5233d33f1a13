"""Native C++ wav loader vs the numpy reference implementation."""

import os

import numpy as np
import pytest

from lct_gan_tpu.data import write_wav
from lct_gan_tpu.data.audio_io import read_wav, resample

wav_loader = pytest.importorskip("lct_gan_tpu.ops.native.wav_loader")


def _native_available():
    try:
        wav_loader._get_lib()
        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="no C++ toolchain / native lib")


def test_native_decode_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 12345)) * 0.2).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, x, 16000)

    out = wav_loader.load_mono_wave_native(p, 0)
    assert out is not None
    mono, sr = out
    assert sr == 16000
    ref, _ = read_wav(p)
    np.testing.assert_allclose(mono, ref.mean(axis=0), atol=1e-6)


def test_native_resample_close_to_scipy(tmp_path):
    sr, target = 48000, 16000
    t = np.arange(sr, dtype=np.float64) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, sr, bits=32)

    out = wav_loader.load_mono_wave_native(p, target)
    assert out is not None
    y, out_sr = out
    assert out_sr == target

    ref = resample(x, sr, target)
    n = min(len(y), len(ref))
    # Interior agreement (edge transients differ slightly by design).
    sl = slice(200, n - 200)
    assert np.max(np.abs(y[sl] - ref[sl])) < 1e-3


def test_native_wrong_file_returns_none(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav file at all")
    assert wav_loader.load_mono_wave_native(p, 0) is None
