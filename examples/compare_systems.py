#!/usr/bin/env python
"""Side-by-side comparison of enhancement systems on single files -- the
CLI equivalent of the reference's Experiments notebooks
(Experiments/LCT-GAN Inference.ipynb / compare.ipynb, SURVEY.md §2.10).

Example:
    python examples/compare_systems.py \
        --noisy noisy.wav --clean clean.wav --out_dir comparison/ \
        --system ours=exprs/<ts>/ckpts/best \
        --system reference=path/to/reference_ckpt.pt

Each --system is NAME=CHECKPOINT where CHECKPOINT is one of our Orbax
checkpoint dirs or a reference PyTorch .pt. Writes per-system enhanced
wavs, spectrogram PNGs, clean-minus-estimate diff artifacts, and prints a
metrics table (SI-SDR / PESQ / STOI).
"""

import argparse
import json
import math


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noisy", required=True)
    ap.add_argument("--clean", default=None)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--system", action="append", default=[],
                    metavar="NAME=CKPT")
    ap.add_argument("--estoi", action="store_true")
    args = ap.parse_args()

    from lct_gan_tpu.eval import (
        ModelComparator,
        make_deepfilternet_system,
        make_jax_system,
    )

    systems = {}
    for spec in args.system:
        name, _, ckpt = spec.partition("=")
        if not ckpt:
            ap.error(f"--system must be NAME=CHECKPOINT, got {spec!r}")
        if ckpt == "dfn":
            # DeepFilterNet3 comparison (needs `pip install deepfilternet`;
            # raises a clear ImportError in images without it).
            systems[name] = make_deepfilternet_system()
        else:
            systems[name] = make_jax_system(ckpt)

    comp = ModelComparator(systems, metrics_estoi=args.estoi)
    result = comp.process_one_file(args.noisy, args.out_dir,
                                   clean_path=args.clean)

    print(json.dumps(result, indent=2, default=str))
    if args.clean is not None:
        print(f"\n{'system':<16}{'SI-SDR':>10}{'PESQ':>8}{'STOI':>8}")
        for name in ["noisy", *systems]:
            m = result[name]
            pesq = m.get("pesq", math.nan)
            print(f"{name:<16}{m.get('si_sdr', math.nan):>10.2f}"
                  f"{pesq:>8.3f}{m.get('stoi', math.nan):>8.4f}")


if __name__ == "__main__":
    main()
