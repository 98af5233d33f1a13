#!/usr/bin/env python
"""Extract serving weights: full Orbax training checkpoint (~190 MB with
discriminators + optimizer states) -> generator-only .npz (~0.5 MB).

The .npz loads anywhere a checkpoint path is accepted (infer.py,
export.py, eval/compare.py, eval/streaming.py) via
train/checkpoint.py::load_generator_params. Used to commit the trained
evidence weights of docs/TRAIN_DEMO.md.

Usage: python tools/extract_generator.py CKPT_DIR OUT.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("out_npz")
    args = ap.parse_args()

    import jax

    # Host-side IO only; keep off the TPU tunnel (eager restore over the
    # tunnel costs minutes -- CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from lct_gan_tpu.train import TrainConfig
    from lct_gan_tpu.train.checkpoint import (
        load_generator_params,
        read_checkpoint_meta,
        save_generator_params_npz,
    )

    meta = read_checkpoint_meta(args.ckpt_dir)
    g = load_generator_params(args.ckpt_dir, TrainConfig())
    # Embed the meta so train_cfg.max_time_context / compress_c keep
    # steering infer.py / export.py after extraction.
    path = save_generator_params_npz(args.out_npz, g, meta=meta)
    n = sum(int(np.asarray(x).size) for x in jax.tree.leaves(g))
    print(f"{args.ckpt_dir} (epoch {meta.get('epoch', '?')}, "
          f"best_val {meta.get('best_val', '?')}) -> {path}: "
          f"{n} params, {os.path.getsize(path) / 1e6:.2f} MB", flush=True)


if __name__ == "__main__":
    main()
