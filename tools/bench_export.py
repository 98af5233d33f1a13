#!/usr/bin/env python
"""Throughput of the exported serving artifact vs the live jitted model.

The export story (export.py -> StableHLO zip, the reference's
FTFNet_scripted.pt counterpart) needs a number: what does serving from
the deserialized artifact cost relative to the live model? This tool
exports the enhancer at the headline shape, loads it back, and times
both paths on the current backend.

Two measurement modes per path:
  * device-resident: outputs stay on device; fence = scalar fetch of the
    last output (bench.py's convention -- pure compute rate).
  * host roundtrip: numpy in, numpy out per call (ExportedEnhancer's
    call contract -- what a serving wrapper actually pays, including
    D2H of the enhanced audio).

Usage: python tools/bench_export.py [--batch 128] [--seconds 2]
           [--iters 10] [--keep_pallas]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--keep_pallas", action="store_true",
                    help="bake the fused TPU kernels into the artifact "
                         "(default: portable jnp path, like export.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lct_gan_tpu.export_model import export_enhancer, load_exported
    from lct_gan_tpu.train import TrainConfig, build_models
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})",
          flush=True)

    cfg = TrainConfig(sample_rate=args.sample_rate)
    enhancer, _, _ = build_models(cfg)
    B, T = args.batch, int(args.seconds * args.sample_rate)
    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T),
                                   jnp.float32)
    params = enhancer.init(jax.random.PRNGKey(0), wave)["params"]
    audio_sec = B * args.seconds * args.iters
    wave_np = np.asarray(wave)

    @jax.jit
    def live(p, x):
        out, _ = enhancer.apply({"params": p}, x)
        return out

    def bench_device(fn, label):
        float(jnp.sum(fn()))  # compile + warm
        float(jnp.sum(fn()))
        t0 = time.time()
        outs = [fn() for _ in range(args.iters)]
        float(jnp.sum(outs[-1]))
        dt = time.time() - t0
        print(f"{label:34s} {audio_sec / dt:8.1f} audio-sec/s "
              f"({dt * 1000 / args.iters:.1f} ms/call)", flush=True)
        return audio_sec / dt

    def bench_roundtrip(fn, label):
        fn()
        fn()
        t0 = time.time()
        for _ in range(args.iters):
            out = fn()
        assert isinstance(out, np.ndarray)
        dt = time.time() - t0
        print(f"{label:34s} {audio_sec / dt:8.1f} audio-sec/s "
              f"({dt * 1000 / args.iters:.1f} ms/call)", flush=True)
        return audio_sec / dt

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.lct.zip")
        t0 = time.time()
        export_enhancer(path, params, cfg, [(B, T)],
                        keep_pallas=args.keep_pallas)
        print(f"export ({'pallas' if args.keep_pallas else 'portable'}): "
              f"{time.time() - t0:.1f}s, "
              f"{os.path.getsize(path) / 1e6:.1f} MB", flush=True)
        loaded = load_exported(path)
        program = loaded._programs[(B, T)]

        r_live = bench_device(lambda: live(params, wave), "live jit (device-resident)")
        r_art = bench_device(lambda: program.call(wave)[0],
                             "artifact (device-resident)")
        bench_roundtrip(lambda: np.asarray(live(params, wave_np)),
                        "live jit (np roundtrip)")
        bench_roundtrip(lambda: loaded(wave_np), "artifact (np roundtrip)")
        print(f"artifact/live device-resident ratio: {r_art / r_live:.3f}")


if __name__ == "__main__":
    main()
