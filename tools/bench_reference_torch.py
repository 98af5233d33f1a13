#!/usr/bin/env python
"""Measure the REFERENCE PyTorch LCTEnhancer's enhancement throughput on
CPU in this container -- the `vs_baseline` denominator used by bench.py.

Imports the reference implementation from /root/reference (read-only
mount) and times eval-mode forward passes of random 2 s @ 16 kHz batches,
reporting enhanced-audio seconds per wall second, same metric as bench.py.

Usage:
    python tools/bench_reference_torch.py [--batch 8] [--iters 3]
        [--seconds 2.0] [--reference /root/reference]

Prints one JSON line:
    {"metric": "reference_torch_cpu_throughput", "value": ..., "unit":
     "audio-sec/sec", ...}
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--batch", type=int, default=None,
                    help="Fixed mode: rows per batch (default 8). "
                         "--full mode: overrides the adaptive row CAP "
                         "(default 128, matching bench.py --full).")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch.set_num_threads (0 = torch default)")
    ap.add_argument("--full", action="store_true",
                    help="bench.py --full's bucketed full-utterance "
                         "workload (same seeded 1.5-10 s lengths, same "
                         "length-adaptive batching)")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch  # noqa: E402  (CPU-only in this image)

    # torchaudio is absent in this image; the reference's datasets package
    # imports it at module scope (datasets/datasets.py:6) and gets pulled
    # in transitively by models.generator -> datasets.stft. Stub it -- the
    # forward pass never touches audio I/O.
    import types  # noqa: E402

    ta = types.ModuleType("torchaudio")
    ta.functional = types.ModuleType("torchaudio.functional")
    ta.__path__ = []  # mark as package so submodule imports resolve
    sys.modules.setdefault("torchaudio", ta)
    sys.modules.setdefault("torchaudio.functional", ta.functional)

    # reference generator.py:635 / :19
    from models.generator import LCTEnhancer, LCTGeneratorConfig

    if args.threads:
        torch.set_num_threads(args.threads)

    model = LCTEnhancer(LCTGeneratorConfig())
    model.eval()

    if args.full:
        # Same utterance set + bucketing as bench.py --full; the reference
        # has no lengths-aware path, so it just runs the padded batches
        # (its infer.py pads batches the same way).
        import numpy as np
        sys.path.insert(0, "/root/repo")
        from bench import full_batch_chunks, full_utterance_lengths
        from lct_gan_tpu.data import bucket_length

        rng = np.random.default_rng(11)
        lens = full_utterance_lengths(sr=args.sample_rate)
        batches = []
        total_audio = 0.0
        for chunk in full_batch_chunks(lens, batch=args.batch):
            pad_to = bucket_length(max(chunk))
            x = np.zeros((len(chunk), pad_to), np.float32)
            for j, L in enumerate(chunk):
                x[j, :L] = 0.1 * rng.standard_normal(L)
            batches.append(torch.from_numpy(x))
            total_audio += sum(chunk) / args.sample_rate
        with torch.no_grad():
            model(batches[0])  # warmup
            t0 = time.perf_counter()
            for _ in range(args.iters):
                for x in batches:
                    out = model(x)
            dt = time.perf_counter() - t0
        _ = (out[0] if isinstance(out, tuple) else out).sum().item()
        thr = args.iters * total_audio / dt
        print(json.dumps({
            "metric": "reference_torch_cpu_full_utterance_throughput",
            "value": round(thr, 3),
            "unit": "audio-sec/sec",
            "iters": args.iters,
            "audio_sec_per_iter": round(total_audio, 2),
            "torch": torch.__version__,
            "threads": torch.get_num_threads(),
            "wall_sec": round(dt, 3),
        }))
        return

    batch = 8 if args.batch is None else args.batch
    T = int(args.seconds * args.sample_rate)
    torch.manual_seed(0)
    wave = torch.randn(batch, T) * 0.1

    with torch.no_grad():
        model(wave)  # warmup (allocator, thread pool)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = model(wave)
        dt = time.perf_counter() - t0
    # LCTEnhancer.forward returns (enhanced, mask); touch it for safety.
    _ = out[0].sum().item() if isinstance(out, tuple) else out.sum().item()

    audio_sec = args.iters * batch * args.seconds
    thr = audio_sec / dt
    print(json.dumps({
        "metric": "reference_torch_cpu_throughput",
        "value": round(thr, 3),
        "unit": "audio-sec/sec",
        "batch": batch,
        "iters": args.iters,
        "seconds_per_utt": args.seconds,
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "wall_sec": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
