#!/usr/bin/env python
"""Measure bucketed(masked) vs exact-length enhancement divergence by length.

The bucketed inference path (infer.py default) pads each utterance to its
geometric length bucket and masks the padding out of the time attention's
KEYS. The mask cuts at frames_valid + 3 (models/generator.py — the three
trailing conv-derived bottleneck frames carry real receptive-field
content), and those 3 frames differ slightly between the bucketed and the
exact-shape run (their conv inputs include bucket zero-padding vs nothing).
Because they are attention keys for EVERY query frame, the bucketed-vs-
exact difference is GLOBAL but weighted ~1/n_frames — it shrinks as the
utterance grows. The final ~n_fft+hop output samples additionally carry
the local conv/OLA edge effect, which does NOT shrink with length.

This tool quantifies both as a function of utterance length, on whatever
backend it runs on (the committed table in docs/BUCKETED_VS_EXACT.md is
from the real TPU). Reference counterpart being improved on: the
reference's batched inference has no mask at all (reference
infer.py:131-164 + generator.py:245-246), so its bucketed-vs-exact
divergence is strictly larger.

Usage: python tools/bucketed_vs_exact.py [--seconds 0.3 0.5 1 2 4 8 10]
           [--seed 0] [--markdown]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, nargs="*",
                    default=[0.3, 0.5, 1.0, 2.0, 4.0, 8.0, 10.0])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--markdown", action="store_true",
                    help="emit a GitHub-markdown table row block")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (f32 jnp path -- isolates "
                         "attention-key leakage from bf16 kernel noise). "
                         "JAX_PLATFORMS=cpu is NOT enough here: the axon "
                         "shim force-registers the TPU backend; only an "
                         "in-process jax.config.update escapes it.")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lct_gan_tpu.data.pipeline import bucket_length
    from lct_gan_tpu.train import TrainConfig, build_models
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    sr = 16000
    hop, n_fft = 256, 512
    n_edge = n_fft + hop

    print(f"device: {jax.devices()[0]} ({jax.default_backend()})",
          flush=True)

    cfg = TrainConfig()
    enhancer, _, _ = build_models(cfg)
    params = enhancer.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, sr), jnp.float32),
    )["params"]

    @jax.jit
    def run(noisy, lengths=None):
        out, _ = enhancer.apply({"params": params}, noisy, lengths)
        return out

    rows = []
    for sec in args.seconds:
        L = int(sec * sr)
        T = bucket_length(L)
        wave = 0.1 * np.asarray(jax.random.normal(
            jax.random.PRNGKey(args.seed + 1), (L,), jnp.float32))

        exact = np.asarray(run(jnp.asarray(wave[None])))[0]

        buck = np.zeros((1, T), np.float32)
        buck[0, :L] = wave
        bucketed = np.asarray(
            run(jnp.asarray(buck), jnp.asarray([L], jnp.int32)))[0, :L]

        diff = np.abs(bucketed - exact)
        body = float(diff[: max(L - n_edge, 0)].max()) if L > n_edge else 0.0
        tail = float(diff[max(L - n_edge, 0):].max())
        scale = float(np.abs(exact).max())
        n_frames = L // hop + 1
        rows.append((sec, L, T, n_frames, body, tail, scale))
        print(f"len={sec:5.1f}s L={L:7d} bucket={T:7d} frames={n_frames:5d} "
              f"max|diff| body(=all but last {n_edge})={body:.3e} "
              f"tail={tail:.3e} out_scale={scale:.3e}", flush=True)

    if args.markdown:
        print("\n| length (s) | frames | bucket pad | body max diff | "
              "tail max diff | body diff x frames |")
        print("|---|---|---|---|---|---|")
        for sec, L, T, n_frames, body, tail, scale in rows:
            print(f"| {sec:.1f} | {n_frames} | {T - L} | {body:.2e} | "
                  f"{tail:.2e} | {body * n_frames:.3f} |")


if __name__ == "__main__":
    main()
