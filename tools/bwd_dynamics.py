#!/usr/bin/env python
"""Training-dynamics comparison: fused Pallas FTF backward kernel vs the
exact jnp recompute VJP (LCT_FTF_JNP_BWD=1).

tests/test_pallas_ftf.py bounds the per-call gradient error of the fused
backward (bf16-GEMM noise band); this tool retires the remaining risk --
"does that noise band perturb GAN training DYNAMICS?" (round-2 verdict
weak #2) -- by running the same N-step synthetic denoising GAN twice,
identical seeds/data, once per backward path, and comparing the held-out
val SI-SDR / MR-STFT curves.

Run on the real TPU (both arms run serially; each arm is a subprocess so
the LCT_FTF_JNP_BWD trace-time env var is isolated):

    python tools/bwd_dynamics.py --steps 500

Prints one JSON line per arm with the metric curves, then the comparison
verdict: max |d SI-SDR| over the aligned curves and at the final point.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--eval_every", type=int, default=25)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--segment_seconds", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--arm", choices=["kernel", "jnp", "both"],
                   default="both")
    p.add_argument("--max_gap_db", type=float, default=1.5,
                   help="Allowed |d SI-SDR| between arms at any shared "
                        "eval point after the first quarter of training.")
    return p.parse_args()


def run_arm(args) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from lct_gan_tpu.train import TrainConfig, create_state
    from lct_gan_tpu.train.step import make_eval_step, make_train_step
    from lct_gan_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = TrainConfig(segment_seconds=args.segment_seconds,
                      batch_size=args.batch, lr_g=args.lr, lr_d=args.lr,
                      bf16=True)
    sr, T, B = cfg.sample_rate, cfg.segment_length, cfg.batch_size

    # Fixed synthetic task: B tones, K distinct noise draws cycled
    # deterministically; held-out val noise.
    rng = np.random.default_rng(7)
    t = np.arange(T) / sr
    freqs = np.linspace(200.0, 2400.0, B)
    phases = rng.uniform(0, 2 * np.pi, B)
    clean = np.stack([0.3 * np.sin(2 * np.pi * f * t + p)
                      for f, p in zip(freqs, phases)]).astype(np.float32)
    K = 8
    train_noises = [(rng.standard_normal(clean.shape) * 0.15
                     ).astype(np.float32) for _ in range(K)]
    noise_va = (rng.standard_normal(clean.shape) * 0.15).astype(np.float32)
    noisy_va = jnp.asarray(clean + noise_va)
    clean_j = jnp.asarray(clean)
    lengths = jnp.asarray(np.full((B,), T, np.int64))

    state = create_state(cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(make_train_step(cfg), donate_argnums=0)
    eval_step = jax.jit(make_eval_step(cfg))

    def val():
        _, m = eval_step(state.g_params, noisy_va, clean_j, lengths)
        return (float(np.mean(np.asarray(m["si_sdr"]))),
                float(np.mean(np.asarray(m["mrstft"]))))

    curve = {"step": [], "si_sdr": [], "mrstft": []}

    def record(step):
        si, mr = val()
        curve["step"].append(step)
        curve["si_sdr"].append(round(si, 4))
        curve["mrstft"].append(round(mr, 5))
        print(f"  step {step:4d}: val SI-SDR {si:7.3f} dB  "
              f"MR-STFT {mr:.4f}", file=sys.stderr, flush=True)

    record(0)
    for step in range(1, args.steps + 1):
        noisy = jnp.asarray(clean + train_noises[(step - 1) % K])
        state, metrics = train_step(state, noisy, clean_j)
        if step % args.eval_every == 0 or step == args.steps:
            float(metrics["g_loss"])  # fence
            record(step)

    arm = "jnp" if os.environ.get("LCT_FTF_JNP_BWD") else "kernel"
    out = {"arm": arm, "backend": jax.default_backend(), **curve}
    print(json.dumps(out))
    return out


def main():
    args = parse_args()
    if args.arm != "both":
        if args.arm == "jnp":
            os.environ["LCT_FTF_JNP_BWD"] = "1"
        else:
            os.environ.pop("LCT_FTF_JNP_BWD", None)
        run_arm(args)
        return

    results = {}
    for arm in ("kernel", "jnp"):
        env = dict(os.environ)
        env.pop("LCT_FTF_JNP_BWD", None)
        if arm == "jnp":
            env["LCT_FTF_JNP_BWD"] = "1"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        print(f"== arm: {arm} ==", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", arm,
             "--steps", str(args.steps), "--eval_every",
             str(args.eval_every), "--batch", str(args.batch),
             "--segment_seconds", str(args.segment_seconds),
             "--lr", str(args.lr)],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=14400)
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            print(f"arm {arm} FAILED rc={proc.returncode}")
            sys.exit(1)
        results[arm] = json.loads(proc.stdout.strip().splitlines()[-1])

    k, j = results["kernel"], results["jnp"]
    assert k["step"] == j["step"]
    gaps = [abs(a - b) for a, b in zip(k["si_sdr"], j["si_sdr"])]
    settle = len(gaps) // 4  # ignore the noisy first quarter
    max_gap = max(gaps[settle:])
    final_gap = gaps[-1]
    verdict = "PASS" if max_gap <= args.max_gap_db else "FAIL"
    print(json.dumps({
        "steps": args.steps,
        "kernel_final_si_sdr": k["si_sdr"][-1],
        "jnp_final_si_sdr": j["si_sdr"][-1],
        "max_gap_db_after_settle": round(max_gap, 3),
        "final_gap_db": round(final_gap, 3),
        "allowed_gap_db": args.max_gap_db,
        "verdict": verdict,
        "curves": {"step": k["step"], "kernel": k["si_sdr"],
                   "jnp": j["si_sdr"]},
    }))
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
