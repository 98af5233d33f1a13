"""Crossover sweep for the banded time-attention productions on real TPU.

Three productions serve a banded-causal MHSA call (max_time_context,
reference models/generator.py:194-198):

  * full   -- the fused attention kernel (ops/attention.py), band as an
              additive score bias: O(S^2) score FLOPs, S <= 1024 only.
  * banded -- the block-skipping kernel (ops/banded_attention.py):
              O(S*W) compute, constant VMEM, any S.
  * blocked -- the O(S*W) two-key-block jnp path, XLA-tiled through HBM.

This tool measures all three at production-like load (N sequences =
adaptive-batch rows x 33 freq bins, E=64, 4 heads) across S and reports
ms per call, to set models/attention.py::BANDED_KERNEL_MIN_SEQ from data.

Timing: per-call D2H over the axon tunnel costs ~25 ms, so iterations are
chained inside ONE jit via lax.scan (RMS-renormalized between steps to
keep activations bounded) and a single scalar is fetched (CLAUDE.md
bench-methodology rule).

    python tools/bench_banded_attention.py [--lookback 64] [--iters 30]
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

from lct_gan_tpu.ops.attention import fused_mhsa  # noqa: E402
from lct_gan_tpu.ops.banded_attention import (  # noqa: E402
    banded_mhsa,
    banded_mhsa_reference,
)

E, NH = 64, 4
FREQ_BINS = 33          # compressed freq bins -> sequences per sample
TARGET_SAMPLES = 4_096_000  # adaptive-batch padded-sample target
HOP = 256


def n_seqs(S: int) -> int:
    """Production-like sequence count at this frame length: the adaptive
    batcher (data/pipeline.py) fills ~TARGET_SAMPLES padded samples, and
    each batch row contributes FREQ_BINS time sequences."""
    rows = max(1, min(128, TARGET_SAMPLES // (S * HOP)))
    return rows * FREQ_BINS


def time_chained(fn, x, iters: int, repeats: int) -> float:
    """Median seconds per call: `iters` chained applications inside one
    jit, one scalar fetched."""

    @jax.jit
    def chained(x):
        def body(c, _):
            o = fn(c)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lookback", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--seqs", type=int, default=None,
                    help="fixed sequence count (default: production-like)")
    ap.add_argument("--lengths", type=int, nargs="*", default=[
        192, 256, 384, 512, 641, 768, 1024, 1301, 2048, 3751])
    ap.add_argument("--block_rows", type=int, nargs="*", default=[None],
                    help="banded-kernel tile heights to sweep")
    args = ap.parse_args()

    W = args.lookback
    rng = np.random.default_rng(0)
    iw = jnp.asarray(rng.standard_normal((E, 3 * E)).astype(np.float32) * 0.1)
    ib = jnp.asarray(rng.standard_normal((3 * E,)).astype(np.float32) * 0.1)
    ow = jnp.asarray(rng.standard_normal((E, E)).astype(np.float32) * 0.1)
    ob = jnp.asarray(rng.standard_normal((E,)).astype(np.float32) * 0.1)

    for S in args.lengths:
        N = args.seqs or n_seqs(S)
        x = jnp.asarray(rng.standard_normal((N, S, E)).astype(np.float32))
        audio_sec = N / FREQ_BINS * S * HOP / 16000.0
        row = {"S": S, "N": N, "W": W, "audio_sec": round(audio_sec, 1)}

        if S <= 1024:
            t = time_chained(
                lambda c: fused_mhsa(c, iw, ib, ow, ob, num_heads=NH,
                                     lookback=W),
                x, args.iters, args.repeats)
            row["full_ms"] = round(t * 1e3, 3)

        for T in args.block_rows:
            t = time_chained(
                lambda c: banded_mhsa(c, iw, ib, ow, ob, num_heads=NH,
                                      lookback=W, block_rows=T),
                x, args.iters, args.repeats)
            key = "banded_ms" if T is None else f"banded_T{T}_ms"
            row[key] = round(t * 1e3, 3)

        ref = jax.jit(lambda c: banded_mhsa_reference(
            c, iw, ib, ow, ob, num_heads=NH, lookback=W))
        t = time_chained(ref, x, args.iters, args.repeats)
        row["blocked_ms"] = round(t * 1e3, 3)

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
