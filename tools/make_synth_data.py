#!/usr/bin/env python
"""Write a seeded synthetic denoising dataset in the reference's layout
(reference datasets.py:10-60 expects D/{clean,noisy}_{train,test}/<id>.wav
+ D/{train,test}.scp).

No real speech ships in this image; this set is the stand-in used by the
committed training-evidence run (docs/TRAIN_DEMO.md). It is built to be
LEARNABLE but not trivial: clean = 2-3 amplitude-modulated harmonic tones
with per-utterance fundamentals, noisy = clean + white noise at a seeded
per-utterance SNR in [2.5, 7.5] dB, so a model that only learns a global
gain cannot win and val SI-SDR has real headroom over the noisy input.

Usage: python tools/make_synth_data.py OUT_DIR [--n_train 128] [--n_test 24]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lct_gan_tpu.data import write_wav  # noqa: E402

SR = 16000


def make_utt(rng: np.random.Generator, seconds: float):
    T = int(seconds * SR)
    t = np.arange(T) / SR
    clean = np.zeros(T, np.float64)
    for _ in range(rng.integers(2, 4)):
        f0 = rng.uniform(150.0, 1200.0)
        # 1-3 harmonics with decaying weights; slow AM so the envelope
        # (and hence the IRM target) varies within the utterance.
        for h in range(1, rng.integers(2, 4) + 1):
            am = 0.6 + 0.4 * np.sin(
                2 * np.pi * rng.uniform(0.5, 3.0) * t + rng.uniform(0, 6.28))
            clean += (0.25 / h) * am * np.sin(
                2 * np.pi * f0 * h * t + rng.uniform(0, 6.28))
    clean *= 0.3 / max(np.abs(clean).max(), 1e-6)
    snr_db = rng.uniform(2.5, 7.5)
    noise = rng.standard_normal(T)
    noise *= np.sqrt((clean ** 2).mean() / 10 ** (snr_db / 10)) / max(
        np.sqrt((noise ** 2).mean()), 1e-12)
    return clean.astype(np.float32), (clean + noise).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n_train", type=int, default=128)
    ap.add_argument("--n_test", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for sub in ("clean_train", "noisy_train", "clean_test", "noisy_test"):
        os.makedirs(os.path.join(args.out_dir, sub), exist_ok=True)
    for split, n in (("train", args.n_train), ("test", args.n_test)):
        ids = []
        for i in range(n):
            uid = f"{split}{i:04d}"
            ids.append(uid)
            seconds = float(rng.uniform(2.0, 4.0))
            clean, noisy = make_utt(rng, seconds)
            write_wav(os.path.join(args.out_dir, f"clean_{split}",
                                   f"{uid}.wav"), clean, SR)
            write_wav(os.path.join(args.out_dir, f"noisy_{split}",
                                   f"{uid}.wav"), noisy, SR)
        with open(os.path.join(args.out_dir, f"{split}.scp"), "w") as f:
            f.write("\n".join(ids) + "\n")
        print(f"{split}: {n} utterances -> {args.out_dir}", flush=True)


if __name__ == "__main__":
    main()
