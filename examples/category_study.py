#!/usr/bin/env python
"""Per-noise-category comparison study: the rebuild's counterpart of the
reference's §6 table (Experiments/LCT-GAN Inference.ipynb cell 5, driven
by ModelComparator, Experiments/util.py:395-657).

The reference's published numbers are per-noise-category metrics of its
trained checkpoint vs DeepFilterNet3 on VoiceBank-DEMAND. Neither the
trained checkpoint, the dataset, nor the `df` package exist in this
image, so the committed artifact (docs/CATEGORY_STUDY.md) runs the same
HARNESS end-to-end on what does exist:

  * a synthetic category set (static / pink / music-like / water-like /
    impulsive / babble-like noise at 5 and 15 dB SNR over a synthetic
    voiced-speech-like clean signal);
  * `ours`  = our enhancer loading a seeded reference .pt through the
    convert path (the production checkpoint flow);
  * `reference` = the torch oracle running the SAME .pt -- so the table
    doubles as a per-category end-to-end parity witness;
  * `dfn` slots in automatically when the `df` package is importable
    (make_deepfilternet_system), exactly as in the reference notebook.

With a real trained checkpoint this same command produces the real
study: python examples/category_study.py --checkpoint path/to.pt

Writes <out_dir>/<category_snr>/... (wavs, spectrograms, diffs) and a
markdown summary table; run with --out_dir docs/assets/category_study
--summary docs/CATEGORY_STUDY.md to regenerate the committed artifact.
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SR = 16000


def water_noise(n, seed):
    """Bubbling-water-like: lowpassed noise with random resonant chirps."""
    rng = np.random.default_rng(seed)
    from scipy.signal import lfilter

    base = lfilter([1.0], [1.0, -0.97], rng.standard_normal(n)) * 0.05
    t = np.arange(n) / SR
    for _ in range(40):
        f0 = rng.uniform(400, 2500)
        start = rng.integers(0, n - 800)
        dur = int(rng.uniform(0.01, 0.05) * SR)
        seg = np.sin(2 * np.pi * (f0 * (1 + 2.5 * np.linspace(0, 1, dur)))
                     * t[:dur]) * np.hanning(dur)
        base[start:start + dur] += 0.5 * seg
    return base / (np.sqrt(np.mean(base ** 2)) + 1e-12)


def babble_noise(n, seed):
    """Sum of several independent speech-like signals."""
    from pesq_ladder import make_speechlike

    acc = np.zeros(n)
    for i in range(6):
        s = make_speechlike(seconds=n / SR + 0.1, seed=100 + seed + i)[:n]
        acc += np.roll(s, i * 1234)
    return acc / (np.sqrt(np.mean(acc ** 2)) + 1e-12)


def build_category_set(out_root, seconds=4.0):
    """Write clean + per-category noisy wavs; returns [(name, noisy, clean)]."""
    from pesq_ladder import _noise, make_speechlike

    from lct_gan_tpu.data import write_wav

    clean = make_speechlike(seconds, seed=3)
    n = len(clean)
    cats = {
        "static": _noise("white", n, 1),
        "pink": _noise("pink", n, 2),
        "music": _noise("music", n, 3),
        "impulse": _noise("impulse", n, 4),
        "water": water_noise(n, 5),
        "babble": babble_noise(n, 6),
    }
    os.makedirs(out_root, exist_ok=True)
    clean_path = os.path.join(out_root, "clean.wav")
    write_wav(clean_path, clean, SR)
    p_sig = np.mean(clean ** 2)
    files = []
    for name, v in cats.items():
        for snr in (5, 15):
            w = v * np.sqrt(p_sig / (10 ** (snr / 10.0)))
            noisy = (clean + w).astype(np.float32)
            path = os.path.join(out_root, f"{name}_snr{snr}.wav")
            write_wav(path, noisy, SR)
            files.append((f"{name}_snr{snr}", path, clean_path))
    return files


def make_seeded_reference_ckpt(path):
    """Seeded random-init reference LCTEnhancer .pt (the oracle's and our
    convert path's shared weights)."""
    import torch

    from tests._reference import import_reference

    _, gen_mod, _, _ = import_reference()
    torch.manual_seed(1234)
    enh = gen_mod.LCTEnhancer(gen_cfg=gen_mod.LCTGeneratorConfig())
    torch.save({"enhancer": enh.state_dict()}, path)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="category_study_out")
    ap.add_argument("--summary", default=None,
                    help="markdown summary path (default <out_dir>/SUMMARY.md)")
    ap.add_argument("--checkpoint", default=None,
                    help=".pt or Orbax dir; default = seeded random-init "
                         "reference .pt (parity-witness mode)")
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--no_reference", action="store_true",
                    help="skip the torch oracle column")
    args = ap.parse_args()

    # torch oracle + jax in one process: keep jax off the TPU backend
    # (torch import deadlocks device fetches over the tunnel -- CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from lct_gan_tpu.eval import ModelComparator, make_jax_system
    from lct_gan_tpu.eval.compare import make_torch_reference_system
    from lct_gan_tpu.metrics.external import pesq_estimate

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt = args.checkpoint
    parity_mode = ckpt is None
    if parity_mode:
        ckpt = make_seeded_reference_ckpt(
            os.path.join(args.out_dir, "seeded_reference.pt"))

    systems = {"ours": make_jax_system(ckpt)}
    if not args.no_reference and str(ckpt).endswith(".pt"):
        systems["reference"] = make_torch_reference_system(ckpt)
    try:
        from lct_gan_tpu.eval import make_deepfilternet_system

        systems["dfn"] = make_deepfilternet_system()
        print("DeepFilterNet3 available: added 'dfn' system")
    except ImportError as e:
        print(f"dfn slot inactive: {e}", file=sys.stderr)

    files = build_category_set(os.path.join(args.out_dir, "data"),
                               args.seconds)
    comp = ModelComparator(systems, metrics_estoi=False)
    rows = []
    for tag, noisy_path, clean_path in files:
        res = comp.process_one_file(noisy_path,
                                    os.path.join(args.out_dir, tag),
                                    clean_path=clean_path)
        from lct_gan_tpu.data import load_mono_wave

        clean, _ = load_mono_wave(clean_path, SR)
        row = {"tag": tag}
        for name in ("noisy", *systems):
            m = res[name]
            est, _ = load_mono_wave(res[name]["dir"], SR)
            row[name] = {
                "si_sdr": m.get("si_sdr", math.nan),
                "stoi": m.get("stoi", math.nan),
                "pesq_est": pesq_estimate(clean, est, SR),
            }
        rows.append(row)
        print(f"{tag}: " + "  ".join(
            f"{n} si_sdr={row[n]['si_sdr']:+.2f}" for n in row if n != "tag"),
            flush=True)

    sysnames = ["noisy", *systems]
    lines = [
        "# Per-noise-category study (synthetic set)",
        "",
        "Generated by `python examples/category_study.py --out_dir "
        "docs/assets/category_study --summary docs/CATEGORY_STUDY.md`.",
        "",
        "Rebuild counterpart of the reference's §6 per-category table "
        "(Experiments/LCT-GAN Inference.ipynb cell 5 / util.py:395-657). "
        + ("Weights are a SEEDED RANDOM-INIT reference checkpoint pushed "
           "through the production convert path, so `ours` vs `reference` "
           "is an end-to-end per-category parity witness (expect near-"
           "identical columns), not an enhancement-quality claim -- the "
           "reference ships no trained weights and the image has no "
           "dataset to train on. With a trained checkpoint the same "
           "command produces the real study."
           if parity_mode else f"Checkpoint: `{ckpt}`.")
        + " A DeepFilterNet3 column activates automatically when the `df` "
        "package is importable (absent in this image).",
        "",
        "PESQ column is the ADVISORY vendored estimator "
        "(docs/PESQ_EST_CHARACTERIZATION.md); STOI is native.",
        "",
        "| category | " + " | ".join(
            f"{n} SI-SDR / STOI / PESQ-est" for n in sysnames) + " |",
        "|---" * (1 + len(sysnames)) + "|",
    ]
    for row in rows:
        cells = [row["tag"]]
        for n in sysnames:
            m = row[n]
            cells.append(f"{m['si_sdr']:+.2f} / {m['stoi']:.3f} / "
                         f"{m['pesq_est']:.2f}")
        lines.append("| " + " | ".join(cells) + " |")
    if "reference" in systems:
        d = max(
            max(abs(row["ours"][k] - row["reference"][k])
                for k in ("si_sdr", "stoi", "pesq_est"))
            for row in rows)
        lines += ["",
                  f"Max |ours - reference| over all categories/metrics: "
                  f"{d:.4f} (converted-weight parity, end to end through "
                  "wav decode -> enhance -> metrics)."]
    summary = args.summary or os.path.join(args.out_dir, "SUMMARY.md")
    os.makedirs(os.path.dirname(summary) or ".", exist_ok=True)
    with open(summary, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {summary}")


if __name__ == "__main__":
    main()
