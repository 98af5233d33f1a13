"""Serving LATENCY benchmark on real TPU: B=1 per-call latency + RTF.

Every number in the perf ledger is THROUGHPUT (audio-sec/s at large B).
This tool measures the latency serving story the reference never had:

  * one-shot: B=1, one whole utterance per call (the interactive
    "enhance this recording" case; reference infer.py:131-164 is the
    batch counterpart).
  * streaming: B=1 chunk per call at eval/streaming.py chunk geometry.
    Per-chunk compute must beat the chunk duration (RTF > 1) for real
    time; user-perceived latency = chunk duration + overlap + compute
    (the crossfade needs the next chunk's head before a seam is final).

Methodology: per-call D2H over the axon tunnel costs ~25 ms, which
would swamp a B=1 latency measurement. The enhancer is wave->wave with
the SAME shape, so `iters` calls are chained inside one jit via
lax.scan (RMS renorm between steps keeps activations bounded) and a
single scalar is fetched: the per-call figure is pure device latency
(CLAUDE.md bench-methodology rule). The wall time of a single
UNchained call -- tunnel round trip included -- is reported separately
and labelled tunnel-bound; on a host-attached TPU the true per-call
wall sits between the two.

    python tools/bench_serving_latency.py [--max_time_context 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lct_gan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

SR = 16000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_chained(enhance, x, iters, repeats):
    """Median device seconds per enhance call (chained inside one jit)."""

    @jax.jit
    def chained(x):
        def body(c, _):
            o = enhance(c)
            rms = jnp.sqrt(jnp.mean(o * o) + 1e-8)
            return o / rms, None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out)

    float(chained(x))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(x))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def time_tunnel(enhance, x, repeats):
    """Median wall seconds for ONE call incl. the D2H scalar fetch."""
    float(jnp.sum(enhance(x)))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(enhance(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_time_context", type=int, default=None,
                    help="banded-causal lookback (frames); the causal "
                         "serving configuration for streaming")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--utterance_seconds", type=float, nargs="*",
                    default=[2.0, 10.0])
    ap.add_argument("--chunk_seconds", type=float, nargs="*",
                    default=[0.5, 1.0, 2.0, 4.0])
    ap.add_argument("--overlap_seconds", type=float, default=0.5)
    args = ap.parse_args()

    from lct_gan_tpu.eval.serve import bake_enhance
    from lct_gan_tpu.train import TrainConfig, build_models

    log(f"device: {jax.devices()[0]} ({jax.default_backend()})")
    cfg = TrainConfig(max_time_context=args.max_time_context)
    enhancer, _, _ = build_models(cfg)
    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 2 * SR),
                                   jnp.float32)
    params = enhancer.init(jax.random.PRNGKey(0), wave)["params"]
    enhance = bake_enhance(enhancer, params)
    rows = []

    for secs in args.utterance_seconds:
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                    (1, int(secs * SR)), jnp.float32)
        dev = time_chained(enhance, x, args.iters, args.repeats)
        wall = time_tunnel(enhance, x, args.repeats)
        rows.append({"mode": "one-shot", "seconds": secs,
                     "device_ms": round(dev * 1e3, 3),
                     "tunnel_wall_ms": round(wall * 1e3, 2),
                     "rtf": round(secs / dev, 1)})
        log(f"one-shot B=1 {secs:.1f}s: device {dev * 1e3:.2f} ms/call "
            f"(RTF {secs / dev:.0f}x), tunnel wall {wall * 1e3:.1f} ms")

    for ch in args.chunk_seconds:
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                    (1, int(ch * SR)), jnp.float32)
        dev = time_chained(enhance, x, args.iters, args.repeats)
        # A seam is final once the NEXT chunk's head is captured and
        # enhanced: worst-case perceived latency for a sample at a seam.
        latency_ms = (ch + args.overlap_seconds) * 1e3 + dev * 1e3
        rows.append({"mode": "streaming-chunk", "seconds": ch,
                     "device_ms": round(dev * 1e3, 3),
                     "rtf": round(ch / dev, 1),
                     "perceived_latency_ms": round(latency_ms, 1)})
        log(f"chunk B=1 {ch:.1f}s: device {dev * 1e3:.2f} ms/chunk "
            f"(RTF {ch / dev:.0f}x), perceived latency "
            f"{latency_ms:.0f} ms (chunk+overlap+compute)")

    print(json.dumps({"max_time_context": args.max_time_context,
                      "rows": rows}))


if __name__ == "__main__":
    main()
