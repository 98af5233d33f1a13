#!/usr/bin/env python
"""Batched wav-in/wav-out inference (reference: infer.py:12-195).

Loads a checkpoint (ours, or a reference PyTorch .pt via the converter),
enhances every utterance in the test scp, and writes
<output_dir>/<id>.wav. Full utterances are padded to geometric length
buckets so the jitted enhancer compiles a bounded number of shapes; unlike
the reference (which saves padded-length wavs, infer.py:150-155 -- a
documented quirk), outputs are trimmed back to their true lengths.
"""

import argparse
import os
import time


def parse_args():
    parser = argparse.ArgumentParser(description="LCT-GAN inference (TPU)")
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--test_scp", type=str, default="test.scp")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Orbax checkpoint dir (ckpts/best) or a "
                             "reference PyTorch .pt file.")
    parser.add_argument("--output_dir", type=str, default="enhanced_test")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="Bucketed-batch row CAP. With length-sorted "
                             "bucketing (the default) batches are sized "
                             "ADAPTIVELY per length bucket -- "
                             "target_batch_seconds of padded audio per "
                             "batch, at most this many rows -- so short "
                             "utterances run at large B (device "
                             "utilization) and long ones at small B "
                             "(memory); default 128. With "
                             "--no_sort_by_length this is the FIXED "
                             "batch size and defaults to 32 (scp-order "
                             "batches pad to the batch max, so a large "
                             "fixed B can exceed the memory-safe padded "
                             "size the adaptive path guarantees).")
    parser.add_argument("--target_batch_seconds", type=float, default=256.0,
                        help="Padded audio-seconds per adaptive batch "
                             "(256 = the 128 x 2 s shape known to fill a "
                             "v5e chip with memory headroom). Only used "
                             "with length-sorted bucketing.")
    parser.add_argument("--no_sort_by_length", action="store_true",
                        help="Keep scp order with fixed batch_size "
                             "instead of length-sorted adaptive "
                             "bucketing (sorted+adaptive is faster; "
                             "outputs match except the final ~n_fft+hop "
                             "samples, where the conv/OLA edge depends "
                             "on the pad bucket -- use --exact_lengths "
                             "for bit-honest tails).")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--compress_c", type=float, default=None,
                        help="Mask compression exponent. Default: the "
                             "checkpoint's saved train config (0.3 if "
                             "unavailable).")
    parser.add_argument("--max_time_context", type=int, default=None,
                        help="Banded-causal time-attention lookback. "
                             "Default: the checkpoint's saved train config "
                             "(full attention if unavailable). Must match "
                             "training or outputs diverge silently.")
    parser.add_argument("--pad_outputs", action="store_true",
                        help="Reproduce the reference's quirk of saving "
                             "padded-length wavs (infer.py:150-155).")
    parser.add_argument("--chunk_seconds", type=float, default=None,
                        help="Enhance in fixed-size overlapping chunks "
                             "(bounded memory + one compiled shape; for "
                             "very long recordings).")
    parser.add_argument("--chunk_overlap", type=float, default=0.5)
    parser.add_argument("--exact_lengths", action="store_true",
                        help="Enhance one utterance at a time at its exact "
                             "length (no bucket padding). The bucketed "
                             "default masks padding out of the time "
                             "attention EXCEPT 3 trailing receptive-field "
                             "frames whose contents differ under padding; "
                             "they are keys for every query, so outputs "
                             "diverge GLOBALLY but weighted by those keys' "
                             "softmax mass: measured max|diff| <= ~1e-5 for "
                             ">= 2 s utterances, up to ~5e-3 below 2 s, "
                             "plus a ~1e-2 local edge effect in the final "
                             "~n_fft+hop samples at any length "
                             "(docs/BUCKETED_VS_EXACT.md; the reference's "
                             "padded batches have no mask at all, "
                             "infer.py:131-164). This flag trades one "
                             "compile per distinct length for bit-honest "
                             "outputs -- use for parity evaluation or "
                             "sub-2 s clips.")
    return parser.parse_args()


def main():
    args = parse_args()

    import numpy as np

    from lct_gan_tpu.data import (
        Prefetcher,
        ScpDataset,
        batch_iterator,
        write_wav,
    )
    from lct_gan_tpu.train import TrainConfig, build_models
    from lct_gan_tpu.train.checkpoint import (
        load_generator_params,
        read_checkpoint_meta,
    )
    from lct_gan_tpu.eval.serve import bake_enhance
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()

    # Behavioral hyperparameters default to the checkpoint's own training
    # config (they change outputs without changing parameter shapes, so a
    # mismatch would be silent). CLI flags override, with a warning.
    saved_cfg = read_checkpoint_meta(args.checkpoint).get("train_cfg", {})
    compress_c = args.compress_c
    if compress_c is None:
        compress_c = float(saved_cfg.get("compress_c", 0.3))
    elif ("compress_c" in saved_cfg
          and compress_c != float(saved_cfg["compress_c"])):
        print(f"WARNING: --compress_c={compress_c} differs from the "
              f"checkpoint's training value {saved_cfg['compress_c']}")
    max_time_context = args.max_time_context
    if max_time_context is None:
        max_time_context = saved_cfg.get("max_time_context")
        if max_time_context is not None:
            max_time_context = int(max_time_context)
    elif saved_cfg and max_time_context != saved_cfg.get("max_time_context"):
        print(f"WARNING: --max_time_context={max_time_context} differs from "
              f"the checkpoint's training value "
              f"{saved_cfg.get('max_time_context')}")

    cfg = TrainConfig(sample_rate=args.sample_rate,
                      compress_c=compress_c,
                      max_time_context=max_time_context)
    g_params = load_generator_params(args.checkpoint, cfg)
    enhancer, _, _ = build_models(cfg)

    # Baked-params jit: the weights are fixed for the whole run, so close
    # them over the trace -- XLA constant-folds the per-call parameter
    # prep (kernel operand packing, casts). Measured LIVE on TPU
    # (chained-scan A/B, B=128 x 2 s, 2026-08-19): baked 36.6 ms/call vs
    # params-as-argument 38.9 = 1.06x; the exported StableHLO artifact
    # built from the same baking measured 1.07x (tools/bench_export.py).
    # lengths masks bucket-padding frames out of the time attention
    # (models/generator.py); with exact shapes it is a no-op.
    enhance = bake_enhance(enhancer, g_params)

    # load_clean=False: inference only needs the noisy side; skipping the
    # clean decode halves host input cost (the 48 kHz full-utterance path
    # is input-bound on small hosts otherwise).
    ds = ScpDataset(args.data_root, args.test_scp, "test",
                    sample_rate=args.sample_rate, segment_length=None,
                    random_segment=False, load_clean=False)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.chunk_seconds is not None:
        from lct_gan_tpu.eval.streaming import enhance_in_chunks

        t0 = time.time()
        total_audio = 0.0
        n_done = 0
        # Decode/resample on a background thread so the host IO overlaps
        # the device's chunk pipeline (the bucketed path below already
        # prefetches; this one used to decode serially).
        decoded = Prefetcher(
            ((uid, ds[i]) for i, uid in enumerate(ds.utt_ids)),
            depth=max(2, args.num_workers))
        for n_done, (uid, sample) in enumerate(decoded, 1):
            out = enhance_in_chunks(
                enhance, sample["noisy"],
                args.sample_rate, chunk_seconds=args.chunk_seconds,
                overlap_seconds=args.chunk_overlap)
            write_wav(os.path.join(args.output_dir, f"{uid}.wav"),
                      out, args.sample_rate)
            total_audio += out.shape[-1] / args.sample_rate
            print(f"[{n_done}/{len(ds)}] enhanced (chunked)", flush=True)
        dt = time.time() - t0
        print(f"Done: {n_done} utterances, {total_audio:.1f}s audio in "
              f"{dt:.1f}s ({total_audio / max(dt, 1e-9):.2f}x realtime)")
        return

    t0 = time.time()
    total_audio = 0.0
    n_done = 0
    # --exact_lengths: batches of one, padded only to the batch "max"
    # (= the utterance itself) -> exact shapes, no attention-over-padding.
    sort_by_length = not args.exact_lengths and not args.no_sort_by_length
    if args.exact_lengths:
        batch_size = 1
    elif args.batch_size is not None:
        batch_size = args.batch_size
    else:
        batch_size = 128 if sort_by_length else 32
    adaptive = (int(args.target_batch_seconds * args.sample_rate)
                if sort_by_length else None)
    it = Prefetcher(
        batch_iterator(ds, batch_size, bucket=not args.exact_lengths,
                       sort_by_length=sort_by_length,
                       adaptive_target_samples=adaptive,
                       num_workers=args.num_workers),
        depth=max(2, args.num_workers))
    for batch in it:
        # Exact-lengths mode: the shapes ARE the lengths, so skip the
        # key-bias masking entirely (lengths=None). Passing lengths here
        # would still mask the 3 conv-derived trailing bottleneck frames
        # out of the time attention -- not a no-op vs the unmasked
        # exact-shape run this flag promises.
        lengths = (None if args.exact_lengths
                   else np.asarray(batch["lengths"], dtype=np.int32))
        enhanced = np.asarray(enhance(batch["noisy"], lengths))
        for i, uid in enumerate(batch["id"]):
            L = int(batch["lengths"][i])
            wave = enhanced[i] if args.pad_outputs else enhanced[i, :L]
            write_wav(os.path.join(args.output_dir, f"{uid}.wav"),
                      wave, args.sample_rate)
            total_audio += L / args.sample_rate
            n_done += 1
        print(f"[{n_done}/{len(ds)}] enhanced", flush=True)
    dt = time.time() - t0
    print(f"Done: {n_done} utterances, {total_audio:.1f}s audio in "
          f"{dt:.1f}s ({total_audio / max(dt, 1e-9):.2f}x realtime)")


if __name__ == "__main__":
    main()
