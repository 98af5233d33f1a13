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
    # Upper bound matters: the ESTOI normalizer bug (sum/J instead of
    # sum/N) scored identity at 2.0 and still passed a one-sided check.
    assert 0.95 < val <= 1.0 + 1e-9


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
    assert np.isfinite(m["fwsegsnr"])
    # PESQ gated: NaN when the wheel is absent (reference behavior)
    assert pesq_available() or math.isnan(m["pesq_wb"])


def test_fwsegsnr_identity_hits_clip_ceiling():
    from lct_gan_tpu.metrics import fwsegsnr

    sr = 16000
    x = _speechlike(sr, sr, seed=7)
    assert fwsegsnr(x, x, sr) == 35.0  # per-frame clip max, exact


def test_fwsegsnr_monotone_in_noise():
    from lct_gan_tpu.metrics import fwsegsnr

    sr = 16000
    x = _speechlike(sr, sr, seed=8) * 0.1
    rng = np.random.default_rng(9)
    noise = rng.standard_normal(len(x))
    scores = [fwsegsnr(x, x + lvl * noise, sr)
              for lvl in (0.001, 0.01, 0.05)]
    assert scores[0] > scores[1] > scores[2]
    assert all(-10.0 <= s <= 35.0 for s in scores)


def test_fwsegsnr_matches_manual_computation():
    """Spot-check the vectorized implementation against a straightforward
    per-frame NumPy transcription of the Hu & Loizou formula."""
    from lct_gan_tpu.metrics.fwsegsnr import (
        _GAMMA,
        _mel_filterbank,
        fwsegsnr,
    )

    sr = 8000
    rng = np.random.default_rng(10)
    x = rng.standard_normal(sr).astype(np.float64) * 0.1
    y = x + rng.standard_normal(sr) * 0.01

    frame = int(0.030 * sr)
    hop = frame // 4
    n_fft = 1 << (frame - 1).bit_length()
    win = np.hanning(frame)
    fb = _mel_filterbank(n_fft, sr, 25)

    vals = []
    for start in range(0, len(x) - frame + 1, hop):
        X = np.abs(np.fft.rfft(x[start:start + frame] * win, n_fft))
        Y = np.abs(np.fft.rfft(y[start:start + frame] * win, n_fft))
        Xb, Yb = fb @ X, fb @ Y
        w = np.maximum(Xb, 1e-12) ** _GAMMA
        snr = 10 * np.log10(Xb ** 2 / np.maximum((Xb - Yb) ** 2, 1e-12))
        vals.append(np.clip((w * snr).sum() / w.sum(), -10, 35))
    np.testing.assert_allclose(fwsegsnr(x, y, sr), np.mean(vals), rtol=1e-9)


def test_pesq_unavailable_waiver():
    """The formal PESQ-unavailable acceptance path (BASELINE.md): when the
    wheel is absent, pesq_score is NaN (never a silent 0) and every
    fallback metric is computable natively."""
    import math as _math

    from lct_gan_tpu.metrics import fwsegsnr, pesq_score, si_sdr, stoi

    sr = 16000
    x = _speechlike(sr * 2, sr, seed=11) * 0.1
    if pesq_available():  # pragma: no cover - not this image
        import pytest

        pytest.skip("pesq wheel present; waiver path not in effect")
    v = pesq_score(x, x, sr, "wb")
    assert _math.isnan(v)
    # Fallback gate metrics all computable and sane on identical signals.
    assert si_sdr(x, x) > 50
    assert stoi(x, x, sr) > 0.99
    assert fwsegsnr(x, x, sr) == 35.0


# ---------------------------------------------------------------------------
# Vendored P.862 estimator (metrics/pesq_p862.py). These assert the
# pipeline's structural anchors and behavioral properties -- the estimator
# is openly approximate (see its module docstring), so no test claims
# certified-PESQ equality.

def test_pesq_p862_identical_anchors():
    """A signal against itself has zero disturbance by construction, so
    the raw score is exactly 4.5 and the MOS-LQO mappings land on the
    canonical ceilings (4.644 wb / 4.549 nb -- the same values the
    certified implementation returns for identical inputs)."""
    from lct_gan_tpu.metrics.pesq_p862 import (
        MOS_IDENTICAL_NB,
        MOS_IDENTICAL_WB,
        pesq_p862,
    )

    sr = 16000
    x = _speechlike(sr * 2, sr, seed=21) * 0.1
    assert abs(pesq_p862(x, x, sr, "wb") - MOS_IDENTICAL_WB) < 2e-3
    assert abs(pesq_p862(x, x, sr, "nb") - MOS_IDENTICAL_NB) < 2e-3


def test_pesq_p862_monotone_in_noise():
    from lct_gan_tpu.metrics.pesq_p862 import pesq_p862

    sr = 16000
    x = _speechlike(sr * 2, sr, seed=22) * 0.1
    rng = np.random.default_rng(23)
    noise = rng.standard_normal(len(x))
    noise /= np.sqrt(np.mean(noise ** 2))
    rms = np.sqrt(np.mean(x ** 2))
    scores = []
    for snr in (40, 25, 10, 0):
        y = x + noise * rms * 10.0 ** (-snr / 20.0)
        scores.append(pesq_p862(x, y, sr, "wb"))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert all(0.99 <= s <= 5.0 for s in scores)


def test_pesq_p862_gain_and_delay_invariance():
    """Level alignment and time alignment must absorb a flat gain and a
    constant delay (both are not distortions under P.862)."""
    from lct_gan_tpu.metrics.pesq_p862 import MOS_IDENTICAL_WB, pesq_p862

    sr = 16000
    x = _speechlike(sr * 2, sr, seed=24) * 0.1
    assert pesq_p862(x, 0.25 * x, sr, "wb") > MOS_IDENTICAL_WB - 0.02
    delayed = np.concatenate([np.zeros(320), x[:-320]])
    assert pesq_p862(x, delayed, sr, "wb") > MOS_IDENTICAL_WB - 0.05


def test_pesq_estimate_and_pair_slots():
    """pesq_estimate prefers the wheel; without it, the estimator fills
    the separate informational `pesq_wb_est` slot while the certified
    `pesq_wb` slot stays NaN (waiver semantics unchanged)."""
    from lct_gan_tpu.data import write_wav
    from lct_gan_tpu.metrics import pesq_estimate

    sr = 16000
    x = (_speechlike(sr * 2, sr, seed=25) * 0.05).astype(np.float32)
    v = pesq_estimate(x, x, sr, "wb")
    assert 4.5 < v <= 5.0
    if pesq_available():  # pragma: no cover - not this image
        return
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cp, ep = td + "/c.wav", td + "/e.wav"
        write_wav(cp, x, sr)
        write_wav(ep, x, sr)
        m = compute_metrics_for_pair(cp, ep, sr)
        assert math.isnan(m["pesq_wb"])
        assert m["pesq_wb_est"] > 4.5


def test_pesq_est_ladder_monotone_and_rank_agrees():
    """Sub-ladder gate for docs/PESQ_EST_CHARACTERIZATION.md (the full
    ladder lives in tools/pesq_ladder.py): the advisory estimator must
    fall monotonically with white-noise SNR and rank-agree with SI-SDR
    and ESTOI on that ladder."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from pesq_ladder import add_noise_snr, make_speechlike, spearman

    from lct_gan_tpu.metrics import pesq_estimate

    clean = make_speechlike(seconds=2.0, seed=0)
    snrs = [30, 20, 10, 0]
    est, sis, sto = [], [], []
    for i, snr in enumerate(snrs):
        deg = add_noise_snr(clean, "white", snr, seed=50 + i)
        est.append(pesq_estimate(clean, deg, 16000, "wb"))
        sis.append(float(si_sdr(clean, deg)))
        sto.append(stoi(clean, deg, 16000, extended=True))
    assert all(a > b for a, b in zip(est, est[1:])), est
    assert spearman(np.array(est), np.array(sis)) == 1.0
    assert spearman(np.array(est), np.array(sto)) == 1.0
