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

Serving configuration: weights are BAKED into the jitted program
(eval/serve.py bake_enhance) -- the same configuration infer.py serves
with, measured 1.06x the params-as-argument jit on TPU 2026-08-19
(infer.py:143). Both sides hold weights fixed for the whole run, so this
matches the torch baseline's footing (fixed nn.Module weights).

`--full` switches to the full-utterance workload validation/inference
actually run (VERDICT r3 weak #2): 256 utterances drawn from a seeded
1.5-10 s length distribution, length-sorted and batched ADAPTIVELY
(constant padded batch size: B=128 for 2 s buckets down to B=25 for
10 s buckets), padded to geometric buckets with true `lengths` (exactly
infer.py's default bucketed path). Throughput counts TRUE audio seconds,
not padding. Baseline for --full: reference torch-CPU at the same
utterance set and batching (`python tools/bench_reference_torch.py
--full`).
"""

import argparse
import json
import sys
import time

# Reference torch-CPU throughput at this benchmark's exact workload
# (B=128 x 2 s), measured 2026-08-16 by tools/bench_reference_torch.py.
TORCH_CPU_BASELINE_AUDIO_SEC_PER_SEC = 11.68
# torch-CPU at the --full workload (same seeded 256-utterance set,
# length-sorted ADAPTIVE bucketed batching -- each batching improvement
# sped torch up too: scp-order 2.12 -> sorted B=32 3.26 -> adaptive
# 8.08, since less padding is less torch compute), measured 2026-08-18
# by tools/bench_reference_torch.py --full --iters 1.
TORCH_CPU_FULL_BASELINE = 8.08

BATCH = 128
SECONDS = 2.0
SR = 16000
WARMUP = 3
ITERS = 10
REPS = 3  # median-of-REPS timing loops: reproducible headline number

# 256 utterances: enough that each length bucket's run can fill its
# adaptive row count (a real test set is this shape -- VoiceBank's is
# 824 utts); at 64 utts every bucket fragmented into tiny batches and
# the number measured scheduling, not the pipeline.
FULL_N_UTTS = 256
# Adaptive bucketed batching (mirrors infer.py's default): each batch's
# row count is target_samples // bucket, capped at FULL_MAX_BATCH, so a
# 2 s bucket runs at B=128 (full chip) and a 10 s bucket at B=25 (same
# memory footprint). 128 x 32000 = the headline workload's padded size.
FULL_TARGET_SAMPLES = 128 * 32000
FULL_MAX_BATCH = 128


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def full_utterance_lengths(n=FULL_N_UTTS, sr=SR, seed=7):
    """Seeded VoiceBank-like utterance lengths (samples), 1.5-10 s."""
    import numpy as np

    rng = np.random.default_rng(seed)
    secs = np.clip(rng.gamma(4.0, 1.1, size=n), 1.5, 10.0)
    return [int(s * sr) for s in secs]


def full_batch_chunks(lens, batch=None):
    """Length-sorted, length-ADAPTIVE chunks: exactly infer.py's default
    bucketed batching (data/pipeline.py adaptive_slices -- per-bucket row
    counts targeting a ~constant padded batch size, so short utterances
    run at large B). Shared with tools/bench_reference_torch.py so the
    torch baseline runs the identical workload. `batch` overrides the
    row cap."""
    from lct_gan_tpu.data import adaptive_slices

    s = sorted(lens)
    cap = batch or FULL_MAX_BATCH
    return [s[i:j] for i, j in
            adaptive_slices(s, FULL_TARGET_SAMPLES, cap)]


def _setup(max_time_context=None):
    import jax
    import jax.numpy as jnp

    from lct_gan_tpu.train import TrainConfig, build_models
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    log(f"bench device: {dev} ({jax.default_backend()})")
    if max_time_context is not None:
        log(f"banded time attention: max_time_context={max_time_context}")

    cfg = TrainConfig(max_time_context=max_time_context)
    enhancer, _, _ = build_models(cfg)
    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                   (BATCH, int(SECONDS * SR)), jnp.float32)
    params = enhancer.init(jax.random.PRNGKey(0), wave)["params"]
    return enhancer, params, wave


def run_fixed(max_time_context=None):
    import jax
    import jax.numpy as jnp

    from lct_gan_tpu.eval.serve import bake_enhance

    enhancer, params, wave = _setup(max_time_context)
    enhance = bake_enhance(enhancer, params)

    # NOTE: on the tunneled TPU platform block_until_ready can return
    # early; a host fetch of a value derived from the LAST dispatched step
    # is the reliable fence (device executes in order).
    t0 = time.time()
    float(jnp.sum(enhance(wave)))
    log(f"compile+first run: {time.time() - t0:.2f}s")

    for _ in range(WARMUP):
        float(jnp.sum(enhance(wave)))

    audio_sec = BATCH * SECONDS * ITERS
    values = []
    for rep in range(REPS):
        t0 = time.time()
        outs = [enhance(wave) for _ in range(ITERS)]
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


def run_full(max_time_context=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lct_gan_tpu.data import bucket_length
    from lct_gan_tpu.eval.serve import bake_enhance

    enhancer, params, _ = _setup(max_time_context)
    enhance = bake_enhance(enhancer, params)

    rng = np.random.default_rng(11)
    lens = full_utterance_lengths()
    batches = []
    total_audio = 0.0
    for chunk in full_batch_chunks(lens):
        pad_to = bucket_length(max(chunk))
        x = np.zeros((len(chunk), pad_to), np.float32)
        for j, L in enumerate(chunk):
            x[j, :L] = 0.1 * rng.standard_normal(L)
        batches.append((jnp.asarray(x),
                        jnp.asarray(np.asarray(chunk, np.int32))))
        total_audio += sum(chunk) / SR
    shapes = sorted({tuple(b[0].shape) for b in batches})
    log(f"--full: {len(lens)} utts, {total_audio:.1f}s audio, "
        f"{len(batches)} batches, bucket shapes {shapes}")

    t0 = time.time()
    for x, ln in batches:  # compile every bucket shape
        float(jnp.sum(enhance(x, ln)))
    log(f"compile+first pass: {time.time() - t0:.2f}s")
    for x, ln in batches:  # warm pass
        float(jnp.sum(enhance(x, ln)))

    values = []
    for rep in range(REPS):
        t0 = time.time()
        out = [enhance(x, ln) for x, ln in batches]
        float(jnp.sum(out[-1]))
        dt = time.time() - t0
        values.append(total_audio / dt)
        log(f"rep {rep + 1}/{REPS}: {total_audio:.1f} audio-sec in "
            f"{dt:.3f}s ({values[-1]:.1f} audio-sec/s)")
    value = sorted(values)[len(values) // 2]
    print(json.dumps({
        "metric": "full_utterance_throughput",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / TORCH_CPU_FULL_BASELINE, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="bucketed full-utterance workload (1.5-10 s)")
    ap.add_argument("--max_time_context", type=int, default=None,
                    help="Banded-causal time-attention lookback (frames). "
                         "Makes attention linear in T; a serving-mode "
                         "tradeoff quantified in docs/STATUS.md. Default: "
                         "full attention (the headline config).")
    args = ap.parse_args()
    if args.full:
        run_full(args.max_time_context)
    else:
        run_fixed(args.max_time_context)


if __name__ == "__main__":
    main()
