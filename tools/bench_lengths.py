#!/usr/bin/env python
"""Throughput vs. utterance length: map the kernel-dispatch boundaries.

The fused FTF kernel covers time-axis L <= MAX_FTF_SEQ (512 frames,
~8.2 s @ 16 kHz / 256 hop); the composed path's standalone attention
kernel covers L <= 1024 (~16.4 s); beyond that, jnp attention. This tool
measures enhancer forward throughput at a ladder of utterance lengths
straddling those boundaries, at a fixed total-samples budget per batch
(so each row is one length; batch size shrinks as length grows, like
bucketed inference).

Usage: python tools/bench_lengths.py [--seconds 2 4 6 8 8.5 10 16 17 20]
           [--budget_sec 128] [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, nargs="*",
                    default=[2.0, 4.0, 6.0, 8.0, 8.5, 10.0, 16.0, 17.0,
                             20.0])
    ap.add_argument("--budget_sec", type=float, default=128.0,
                    help="total audio seconds per batch (rows = budget/len)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no_lengths", action="store_true",
                    help="skip the lengths/key-bias path (exact shapes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lct_gan_tpu.ops.ftf import MAX_FTF_SEQ
    from lct_gan_tpu.train import TrainConfig, build_models
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    log(f"device: {jax.devices()[0]} ({jax.default_backend()}), "
        f"MAX_FTF_SEQ={MAX_FTF_SEQ}")

    cfg = TrainConfig()
    enhancer, _, _ = build_models(cfg)
    sr = 16000
    hop = 256
    params = enhancer.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, sr), jnp.float32))["params"]

    @jax.jit
    def enhance(p, x, lengths):
        out, _ = enhancer.apply({"params": p}, x, lengths=lengths)
        return out

    rng = np.random.default_rng(3)
    rows = []
    for sec in args.seconds:
        T = int(sec * sr)
        B = max(1, int(args.budget_sec / sec))
        frames = T // hop + 1
        x = jnp.asarray(0.1 * rng.standard_normal((B, T)), jnp.float32)
        lengths = (None if args.no_lengths
                   else jnp.full((B,), T, jnp.int32))
        t0 = time.time()
        float(jnp.sum(enhance(params, x, lengths)))
        compile_s = time.time() - t0
        float(jnp.sum(enhance(params, x, lengths)))  # warm
        t0 = time.time()
        outs = [enhance(params, x, lengths) for _ in range(args.iters)]
        float(jnp.sum(outs[-1]))
        dt = time.time() - t0
        thr = args.iters * B * sec / dt
        path = ("fused" if frames <= MAX_FTF_SEQ
                else "composed+attn-kernel" if frames <= 1024 else
                "composed+jnp-attn")
        rows.append((sec, B, frames, thr, path))
        log(f"len={sec:5.1f}s B={B:3d} frames={frames:4d} [{path:>20s}] "
            f"compile={compile_s:6.1f}s  {thr:8.1f} audio-sec/s")

    log("\nsec  B  frames  path  audio-sec/s")
    for sec, B, frames, thr, path in rows:
        log(f"{sec:5.1f} {B:3d} {frames:5d}  {path:>20s} {thr:9.1f}")


if __name__ == "__main__":
    main()
