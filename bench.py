#!/usr/bin/env python
"""Headline benchmark: streaming enhancement throughput (audio-sec/sec/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference publishes no performance numbers (BASELINE.md) and
no GPU is available in this environment, so the recorded baseline is the
reference PyTorch LCTEnhancer measured in THIS container at the SAME
workload as this benchmark (torch 2.13.0+cpu, 1 thread, batch 128 x 2 s
@ 16 kHz): 11.68 audio-sec/sec -- reproduce with
`python tools/bench_reference_torch.py --batch 128 --iters 2`.
vs_baseline is our TPU throughput over that number. Details go to stderr;
the JSON line is the only stdout output.
"""

import json
import sys
import time

# Reference torch-CPU throughput at this benchmark's exact workload
# (B=128 x 2 s), measured 2026-08-16 by tools/bench_reference_torch.py.
TORCH_CPU_BASELINE_AUDIO_SEC_PER_SEC = 11.68

BATCH = 128
SECONDS = 2.0
SR = 16000
WARMUP = 3
ITERS = 10
REPS = 3  # median-of-REPS timing loops: reproducible headline number


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lct_gan_tpu.train import TrainConfig, build_models
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    log(f"bench device: {dev} ({jax.default_backend()})")

    cfg = TrainConfig()
    enhancer, _, _ = build_models(cfg)
    T = int(SECONDS * SR)
    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, T),
                                   jnp.float32)
    params = enhancer.init(jax.random.PRNGKey(0), wave)["params"]

    @jax.jit
    def enhance(p, x):
        out, _ = enhancer.apply({"params": p}, x)
        return out

    # NOTE: on the tunneled TPU platform block_until_ready can return
    # early; a host fetch of a value derived from the LAST dispatched step
    # is the reliable fence (device executes in order).
    t0 = time.time()
    float(jnp.sum(enhance(params, wave)))
    log(f"compile+first run: {time.time() - t0:.2f}s")

    for _ in range(WARMUP):
        float(jnp.sum(enhance(params, wave)))

    audio_sec = BATCH * SECONDS * ITERS
    values = []
    for rep in range(REPS):
        t0 = time.time()
        outs = [enhance(params, wave) for _ in range(ITERS)]
        float(jnp.sum(outs[-1]))
        dt = time.time() - t0
        values.append(audio_sec / dt)
        log(f"rep {rep + 1}/{REPS}: {ITERS} iters x {BATCH}x{SECONDS:.0f}s "
            f"in {dt:.3f}s ({values[-1]:.1f} audio-sec/s)")
    value = sorted(values)[len(values) // 2]
    print(json.dumps({
        "metric": "enhanced_audio_throughput",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / TORCH_CPU_BASELINE_AUDIO_SEC_PER_SEC,
                             2),
    }))


if __name__ == "__main__":
    main()
