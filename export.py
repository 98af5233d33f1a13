#!/usr/bin/env python
"""Export a trained enhancer to a self-contained serialized artifact.

The JAX-native counterpart to the reference's TorchScript ship vehicle
(`FTFNet_scripted.pt`): weights baked in, loadable with jax alone.

    python export.py --checkpoint exprs/<ts>/ckpts/best \
        --output enhancer.lct.zip --batch_size 8 --seconds 2 4 8

Load side (no lct_gan_tpu needed beyond this helper):

    from lct_gan_tpu.export_model import load_exported
    enhance = load_exported("enhancer.lct.zip")
    out = enhance(noisy_batch)   # [B, T] float32 in/out
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoint dir or reference .pt file")
    p.add_argument("--output", required=True, help="output .zip path")
    p.add_argument("--batch_size", type=int, default=None,
                   help="Rows per exported shape (default 8). With "
                        "--adaptive_buckets this is the row CAP "
                        "(default 128).")
    p.add_argument("--seconds", type=float, nargs="+", default=[2.0, 4.0],
                   help="utterance-length buckets to export")
    p.add_argument("--adaptive_buckets", type=float, nargs=2, default=None,
                   metavar=("MIN_S", "MAX_S"),
                   help="Instead of --seconds x batch_size, export one "
                        "shape per geometric length bucket covering "
                        "[MIN_S, MAX_S] seconds with length-ADAPTIVE row "
                        "counts (target_batch_seconds padded audio per "
                        "batch) -- the serving-side mirror of infer.py's "
                        "adaptive batching.")
    p.add_argument("--target_batch_seconds", type=float, default=256.0,
                   help="Padded audio-seconds per adaptive shape "
                        "(--adaptive_buckets only).")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--compress_c", type=float, default=None)
    p.add_argument("--max_time_context", type=int, default=None)
    p.add_argument("--keep_pallas", action="store_true",
                   help="bake the fused TPU kernels into the artifact "
                        "(max on-TPU throughput; artifact becomes "
                        "TPU-only and Mosaic-version-pinned)")
    return p.parse_args()


def main():
    args = parse_args()

    from lct_gan_tpu.export_model import export_enhancer
    from lct_gan_tpu.train import TrainConfig
    from lct_gan_tpu.train.checkpoint import (
        load_generator_params,
        read_checkpoint_meta,
    )
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()

    saved_cfg = read_checkpoint_meta(args.checkpoint).get("train_cfg", {})
    compress_c = (args.compress_c if args.compress_c is not None
                  else float(saved_cfg.get("compress_c", 0.3)))
    mtc = args.max_time_context
    if mtc is None:
        mtc = saved_cfg.get("max_time_context")
        mtc = int(mtc) if mtc is not None else None

    cfg = TrainConfig(sample_rate=args.sample_rate, compress_c=compress_c,
                      max_time_context=mtc)
    g_params = load_generator_params(args.checkpoint, cfg)
    if args.adaptive_buckets is not None:
        from lct_gan_tpu.export_model import adaptive_export_shapes

        lo, hi = args.adaptive_buckets
        shapes = adaptive_export_shapes(
            lo, hi, args.sample_rate,
            target_batch_seconds=args.target_batch_seconds,
            max_batch=(128 if args.batch_size is None
                       else args.batch_size))
    else:
        b = 8 if args.batch_size is None else args.batch_size
        shapes = [(b, int(s * args.sample_rate)) for s in args.seconds]
    export_enhancer(args.output, g_params, cfg, shapes,
                    keep_pallas=args.keep_pallas)
    print(f"Exported {len(shapes)} shape(s) {shapes} to {args.output}")


if __name__ == "__main__":
    main()
