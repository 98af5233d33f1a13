#!/usr/bin/env python
"""Standalone evaluation CLI (reference: metrics.py:162-285).

Computes SI-SDR / PESQ / STOI between a directory of enhanced wavs and the
matching clean test set, reporting mean +/- std per metric.

Layout note: the reference CLI expects data_root/test/clean
(metrics.py:225), inconsistent with train.py's clean_test layout
(SURVEY.md §2.7). This CLI defaults to the clean_test layout and keeps a
--clean_dir override for any other layout.
"""

import argparse
import math
import os


def parse_args():
    parser = argparse.ArgumentParser(
        description="Evaluate enhanced wavs against clean references")
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--test_scp", type=str, default="test.scp")
    parser.add_argument("--enhanced_dir", type=str, required=True)
    parser.add_argument("--clean_dir", type=str, default=None,
                        help="Defaults to <data_root>/clean_test")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--no_pesq", action="store_true")
    parser.add_argument("--no_stoi", action="store_true")
    parser.add_argument("--estoi", action="store_true",
                        help="Extended STOI instead of classic STOI "
                             "(reference metrics.py:190-207)")
    parser.add_argument("--no_si_sdr", action="store_true",
                        help="Skip SI-SDR (reference metrics.py:190-207)")
    return parser.parse_args()


def main():
    args = parse_args()

    import numpy as np

    from lct_gan_tpu.data import read_scp
    from lct_gan_tpu.metrics import compute_metrics_for_pair, pesq_available

    if not args.no_pesq and not pesq_available():
        print("NOTICE: `pesq` wheel unavailable -- PESQ slots will be NaN. "
              "Acceptance falls back to SI-SDR/STOI/fwSegSNR "
              "(see BASELINE.md, PESQ-unavailable acceptance procedure).")

    scp = args.test_scp
    if not os.path.isabs(scp):
        scp = os.path.join(args.data_root, scp)
    ids = read_scp(scp)
    clean_dir = args.clean_dir or os.path.join(args.data_root, "clean_test")

    per_metric = {}
    n_missing = 0
    for uid in ids:
        clean_path = os.path.join(clean_dir, f"{uid}.wav")
        enh_path = os.path.join(args.enhanced_dir, f"{uid}.wav")
        if not (os.path.exists(clean_path) and os.path.exists(enh_path)):
            print(f"WARNING: missing files for {uid}, skipping")
            n_missing += 1
            continue
        m = compute_metrics_for_pair(
            clean_path, enh_path, args.sample_rate,
            include_pesq=not args.no_pesq,
            include_stoi=not args.no_stoi,
            include_si_sdr=not args.no_si_sdr,
            estoi=args.estoi)
        for k, v in m.items():
            if math.isfinite(v):
                per_metric.setdefault(k, []).append(v)

    print(f"Evaluated {len(ids) - n_missing}/{len(ids)} utterances")
    for k in sorted(per_metric):
        vals = np.asarray(per_metric[k])
        print(f"{k}: {vals.mean():.4f} +/- {vals.std():.4f} "
              f"(n={len(vals)})")


if __name__ == "__main__":
    main()
