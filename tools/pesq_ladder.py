#!/usr/bin/env python
"""Characterize the vendored P.862 estimator (metrics/pesq_p862.py) on a
synthetic degradation ladder (VERDICT r3 weak #4).

BASELINE.md scopes pesq_wb_est as ADVISORY: it claims to track true PESQ
"in order and trend", but with no wheel in the image that claim was never
measured. This tool measures what CAN be measured in-image:

  1. Monotonicity: on each degradation family, MOS must fall as the
     degradation strengthens (SNR ladder per noise type, mask-error
     ladder, clip ladder).
  2. Rank agreement with the other metrics (SI-SDR, STOI/ESTOI,
     fwSegSNR) across the full ladder (Spearman rho).
  3. Level invariance: P.862's level alignment means a pure gain must
     barely move the score.
  4. If the certified `pesq` wheel IS importable (not in this image, but
     this tool is the harness for when it is), score every rung with it
     too and report estimator-vs-wheel Spearman/Pearson + max |delta|.

Writes a markdown report to docs/PESQ_EST_CHARACTERIZATION.md (--out).
tests/test_metrics.py pins the monotonicity + rank-agreement gates on a
small sub-ladder.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lct_gan_tpu.metrics import si_sdr  # noqa: E402
from lct_gan_tpu.metrics.external import _get_pesq  # noqa: E402
from lct_gan_tpu.metrics.fwsegsnr import fwsegsnr  # noqa: E402
from lct_gan_tpu.metrics.pesq_p862 import pesq_p862  # noqa: E402
from lct_gan_tpu.metrics.stoi import stoi  # noqa: E402

SR = 16000


def make_speechlike(seconds=4.0, sr=SR, seed=0):
    """Synthetic voiced-speech-like signal: pitch-modulated harmonic
    series through formant resonances, syllabic amplitude envelope with
    pauses. Not speech, but enough joint spectro-temporal structure for
    P.862's loudness-difference machinery to behave qualitatively."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120.0 * (1.0 + 0.15 * np.sin(2 * np.pi * 2.3 * t)
                  + 0.05 * np.sin(2 * np.pi * 5.1 * t + 1.0))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = np.zeros_like(t)
    for k in range(1, 24):
        x += np.cos(k * phase + rng.uniform(0, 2 * np.pi)) / k
    # crude formants via resonant filters
    from scipy.signal import lfilter

    for fc, bw in ((500, 80), (1500, 120), (2500, 180)):
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * fc / sr
        x = lfilter([1 - r], [1, -2 * r * np.cos(th), r * r], x)
    # syllabic envelope (~4 Hz) with pauses
    env = np.clip(np.sin(2 * np.pi * 3.7 * t) + 0.4, 0, None)
    env *= (np.sin(2 * np.pi * 0.45 * t) > -0.6)
    x = x * env
    # unvoiced-ish bursts
    x += 0.05 * rng.standard_normal(len(t)) * (env > 0.5)
    return (0.2 * x / (np.sqrt(np.mean(x ** 2)) + 1e-9)).astype(np.float32)


def _noise(kind, n, seed):
    rng = np.random.default_rng(seed)
    if kind == "white":
        v = rng.standard_normal(n)
    elif kind == "pink":
        # -3 dB/octave via spectral shaping
        spec = np.fft.rfft(rng.standard_normal(n))
        f = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
        v = np.fft.irfft(spec / np.sqrt(f), n)
    elif kind == "music":
        t = np.arange(n) / SR
        v = sum(np.sin(2 * np.pi * f * t + p) * (1 + np.sin(2 * np.pi * m * t))
                for f, p, m in ((220, 0.0, 1.1), (330, 1.0, 0.7),
                                (523, 2.0, 1.7), (1047, 0.5, 0.3)))
        v = np.asarray(v)
    elif kind == "impulse":
        v = np.zeros(n)
        idx = rng.integers(0, n, size=max(4, n // 4000))
        v[idx] = rng.choice([-1.0, 1.0], size=len(idx))
        from scipy.signal import lfilter
        v = lfilter([1.0], [1.0, -0.95], v)  # give clicks a tail
    else:
        raise ValueError(kind)
    return v / (np.sqrt(np.mean(v ** 2)) + 1e-12)


def add_noise_snr(clean, kind, snr_db, seed):
    v = _noise(kind, len(clean), seed)
    p_sig = np.mean(clean ** 2)
    v = v * np.sqrt(p_sig / (10 ** (snr_db / 10.0)))
    return (clean + v).astype(np.float32)


def mask_damage(clean, strength, seed):
    """ISTFT-artifact family: random TF-mask over-suppression, like an
    enhancer that eats speech. strength in [0,1] scales both the fraction
    of damaged bins and the suppression depth."""
    from lct_gan_tpu.sigproc import STFTConfig, istft, magnitude, stft

    import jax.numpy as jnp

    cfg = STFTConfig(n_fft=512).finalize()
    spec = stft(jnp.asarray(clean)[None], cfg)
    rng = np.random.default_rng(seed)
    m = np.ones(spec.shape, np.float32)
    hit = rng.random(spec.shape) < (0.6 * strength)
    m[hit] = 1.0 - 0.9 * strength
    out = istft(spec * m, cfg, length=len(clean))
    return np.asarray(out[0], np.float32)


def clip_damage(clean, frac):
    """Hard clipping at a fraction of the peak."""
    peak = np.max(np.abs(clean))
    th = peak * (1.0 - frac)
    return np.clip(clean, -th, th).astype(np.float32)


def score(clean, deg):
    row = {
        "pesq_est": pesq_p862(clean, deg, SR, "wb"),
        "si_sdr": float(si_sdr(clean, deg)),
        "estoi": stoi(clean, deg, SR, extended=True),
        "fwsegsnr": fwsegsnr(clean, deg, SR),
    }
    wheel = _get_pesq()
    if wheel is not None:
        row["pesq_true"] = float(
            wheel(SR, clean.astype(np.float64), deg.astype(np.float64),
                  "wb"))
    return row


def spearman(a, b):
    ar = np.argsort(np.argsort(a)).astype(np.float64)
    br = np.argsort(np.argsort(b)).astype(np.float64)
    return float(np.corrcoef(ar, br)[0, 1])


def build_ladder(seconds=4.0):
    clean = make_speechlike(seconds)
    rungs = []  # (family, level_desc, strength_rank, degraded)
    snrs = [40, 30, 20, 15, 10, 5, 0, -5]
    for kind in ("white", "pink", "music", "impulse"):
        for i, snr in enumerate(snrs):
            rungs.append((kind, f"SNR {snr:+d} dB", i,
                          add_noise_snr(clean, kind, snr, seed=100 + i)))
    for i, s in enumerate([0.1, 0.25, 0.4, 0.6, 0.8]):
        rungs.append(("mask_damage", f"strength {s:.2f}", i,
                      mask_damage(clean, s, seed=7)))
    for i, f in enumerate([0.5, 0.8, 0.95, 0.99]):
        rungs.append(("clip", f"clip {f:.2f}", i, clip_damage(clean, f)))
    return clean, rungs


def main():
    # Host-side tool: keep jax (used by the mask_damage family) off the
    # TPU backend so this can run alongside a device job.
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/PESQ_EST_CHARACTERIZATION.md")
    ap.add_argument("--seconds", type=float, default=4.0)
    args = ap.parse_args()

    clean, rungs = build_ladder(args.seconds)
    rows = []
    for fam, desc, rank, deg in rungs:
        r = score(clean, deg)
        r.update(family=fam, level=desc, rank=rank)
        rows.append(r)
        print(f"{fam:12s} {desc:14s} pesq_est={r['pesq_est']:.3f} "
              f"si_sdr={r['si_sdr']:+7.2f} estoi={r['estoi']:.3f} "
              f"fwsegsnr={r['fwsegsnr']:6.2f}"
              + (f" pesq_true={r['pesq_true']:.3f}"
                 if "pesq_true" in r else ""), flush=True)

    # level invariance
    inv = [score(clean, (g * clean).astype(np.float32))["pesq_est"]
           for g in (0.25, 0.5, 2.0)]
    ident = score(clean, clean)["pesq_est"]

    fams = sorted({r["family"] for r in rows})
    mono = {}
    for fam in fams:
        fr = sorted((r for r in rows if r["family"] == fam),
                    key=lambda r: r["rank"])
        vals = [r["pesq_est"] for r in fr]
        viol = sum(1 for a, b in zip(vals, vals[1:]) if b > a + 1e-6)
        mono[fam] = (viol, len(vals) - 1)

    est = np.array([r["pesq_est"] for r in rows])
    rho = {m: spearman(est, np.array([r[m] for r in rows]))
           for m in ("si_sdr", "estoi", "fwsegsnr")}
    wheel_stats = None
    if all("pesq_true" in r for r in rows):
        tr = np.array([r["pesq_true"] for r in rows])
        wheel_stats = (spearman(est, tr),
                       float(np.corrcoef(est, tr)[0, 1]),
                       float(np.max(np.abs(est - tr))))

    lines = [
        "# pesq_wb_est characterization (synthetic degradation ladder)",
        "",
        "Generated by `python tools/pesq_ladder.py`. Measures the claims",
        "BASELINE.md makes for the ADVISORY vendored P.862 estimator",
        "(lct_gan_tpu/metrics/pesq_p862.py): monotone in degradation",
        "strength, rank-consistent with the other quality metrics, and",
        "level-invariant. The certified `pesq` wheel is absent in this",
        "image; when present, this tool also reports estimator-vs-wheel",
        "agreement (section at the bottom activates automatically).",
        "",
        f"Signal: {args.seconds:.0f} s synthetic voiced-speech-like "
        "(pitch-modulated harmonics, formant resonances, syllabic "
        "envelope), 16 kHz.",
        "",
        "## Ladder scores",
        "",
        "| family | level | pesq_wb_est | SI-SDR dB | ESTOI | fwSegSNR |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['family']} | {r['level']} | {r['pesq_est']:.3f} "
            f"| {r['si_sdr']:+.2f} | {r['estoi']:.3f} "
            f"| {r['fwsegsnr']:.2f} |")
    lines += [
        "",
        "## Monotonicity (MOS must fall as degradation strengthens)",
        "",
        "| family | inversions / steps |",
        "|---|---|",
    ]
    for fam, (viol, steps) in sorted(mono.items()):
        lines.append(f"| {fam} | {viol} / {steps} |")
    lines += [
        "",
        "## Rank agreement across the full ladder (Spearman rho vs "
        "pesq_wb_est)",
        "",
        "| metric | rho |",
        "|---|---|",
    ] + [f"| {m} | {v:.3f} |" for m, v in rho.items()] + [
        "",
        "## Level invariance",
        "",
        f"identical signal -> {ident:.3f} MOS; pure gains x0.25/x0.5/x2.0 "
        f"-> {', '.join(f'{v:.3f}' for v in inv)} "
        "(P.862 level alignment should keep these within ~0.1 MOS).",
        "",
    ]
    if wheel_stats:
        lines += [
            "## vs certified PESQ wheel",
            "",
            f"Spearman rho {wheel_stats[0]:.3f}, Pearson r "
            f"{wheel_stats[1]:.3f}, max |MOS delta| {wheel_stats[2]:.3f}.",
            "",
        ]
    else:
        lines += [
            "## vs certified PESQ wheel",
            "",
            "`pesq` wheel not importable in this image -- section not "
            "measured. Re-run this tool where the wheel exists.",
            "",
        ]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"\nwrote {args.out}")
    print("monotonicity:", mono)
    print("spearman:", {k: round(v, 3) for k, v in rho.items()})


if __name__ == "__main__":
    main()
