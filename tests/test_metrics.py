"""Metric tests: SI-SDR exactness, STOI/ESTOI behavioral properties, and
per-pair evaluation."""

import math

import numpy as np
import pytest

from lct_gan_tpu.metrics import (
    batch_si_sdr,
    compute_metrics_for_pair,
    pesq_available,
    si_sdr,
    stoi,
    stoi_score,
)


def test_si_sdr_perfect_and_scaled():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)
    # Perfect reconstruction -> very high SI-SDR
    assert si_sdr(x, x) > 70
    # Scale invariance (noisy estimate so the eps floor is irrelevant)
    y = x + 0.1 * rng.standard_normal(16000).astype(np.float32)
    assert abs(si_sdr(x, 0.5 * y) - si_sdr(x, y)) < 1e-4


def test_si_sdr_known_value():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(16000)
    n = rng.standard_normal(16000)
    # Orthogonalize noise against signal, equal power -> SI-SDR ~ 0 dB
    n = n - (n @ x) / (x @ x) * x
    n = n / np.linalg.norm(n) * np.linalg.norm(x)
    val = si_sdr(x, x + n)
    assert abs(val) < 0.1


def test_batch_si_sdr_with_lengths():
    rng = np.random.default_rng(2)
    ref = rng.standard_normal((2, 8000)).astype(np.float32)
    est = ref + 0.1 * rng.standard_normal((2, 8000)).astype(np.float32)
    vals = batch_si_sdr(ref, est, lengths=[8000, 5000])
    assert vals.shape == (2,)
    assert np.all(vals > 10)


def _speechlike(n, sr, seed=0):
    """4 Hz-modulated broadband noise: energy in every third-octave band
    (STOI correlates band envelopes, so tonal signals score low in empty
    bands by design)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = rng.standard_normal(n)
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4 * t)  # 4 Hz modulation
    return (sig * env).astype(np.float64)


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_clean_is_near_one(extended):
    sr = 16000
    x = _speechlike(sr * 3, sr)
    val = stoi(x, x, sr, extended=extended)
    assert val > 0.95


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_monotone_in_noise(extended):
    sr = 16000
    rng = np.random.default_rng(3)
    x = _speechlike(sr * 3, sr)
    noise = rng.standard_normal(len(x))
    noise = noise / np.std(noise) * np.std(x)
    scores = []
    for snr_db in (20, 5, -10):
        y = x + noise * (10 ** (-snr_db / 20))
        scores.append(stoi(x, y, sr, extended=extended))
    assert scores[0] > scores[1] > scores[2]
    assert scores[2] < 0.8


def test_stoi_score_wrapper_uses_fallback():
    sr = 16000
    x = _speechlike(sr * 2, sr, seed=4)
    v = stoi_score(x, x, sr)
    assert v > 0.95


def test_compute_metrics_for_pair(tmp_path):
    from lct_gan_tpu.data import write_wav

    sr = 16000
    x = (_speechlike(sr * 2, sr, seed=5) * 0.05).astype(np.float32)
    y = x + (np.random.default_rng(6).standard_normal(len(x)) *
             0.005).astype(np.float32)
    cp, ep = str(tmp_path / "c.wav"), str(tmp_path / "e.wav")
    write_wav(cp, x, sr)
    write_wav(ep, y, sr)
    m = compute_metrics_for_pair(cp, ep, sr)
    assert m["si_sdr"] > 15
    assert m["stoi"] > 0.9
    # PESQ gated: NaN when the wheel is absent (reference behavior)
    assert pesq_available() or math.isnan(m["pesq_wb"])
