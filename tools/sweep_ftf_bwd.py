"""Tile sweep for the fused FTF BACKWARD kernel on the real TPU.

Times grad-of-sum through fused_ftf_block at the production shapes
(freq: N=B*T sequences of L=33; time: N=B*F of L=129, B=64 training
batch) for a grid of (block_seqs, sub) backward tiles. The forward tile
stays at its save_hidden default. Run: python tools/sweep_ftf_bwd.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lct_gan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import lct_gan_tpu.ops.ftf_bwd as fb  # noqa: E402
from lct_gan_tpu.ops.ftf import fused_ftf_block  # noqa: E402

C, G, H = 64, 4, 16


def params(key, bidi):
    D = 2 if bidi else 1
    ks = jax.random.split(key, 8)
    u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.25, 0.25)
    return (1.0 + 0.1 * u(ks[0], (C,)), 0.1 * u(ks[0], (C,)),
            u(ks[1], (D, G, H, 3 * H)), u(ks[2], (D, G, H, 3 * H)),
            u(ks[3], (D, G, 3 * H)), u(ks[3], (D, G, 3 * H)),
            1.0 + 0.1 * u(ks[4], (C,)), 0.1 * u(ks[4], (C,)),
            u(ks[5], (C, 3 * C)), 0.1 * u(ks[5], (3 * C,)),
            u(ks[6], (C, C)), 0.1 * u(ks[6], (C, )),
            u(ks[7], ((2 * C if bidi else C), C)), 0.1 * u(ks[7], (C,)))


def sweep(name, N, L, bidi, combos):
    p = params(jax.random.PRNGKey(0), bidi)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, L, C), jnp.float32)
    orig = fb.pick_ftf_bwd_tile
    for bs, sub in combos:
        fb.pick_ftf_bwd_tile = lambda _l, bs=bs, sub=sub: (bs, sub)
        try:
            f = jax.jit(jax.grad(lambda x: jnp.sum(fused_ftf_block(
                x, *p, bidirectional=bidi, num_heads=4))))
            y = f(x); float(jnp.sum(y))
            t0 = time.time()
            for _ in range(10):
                y = f(x)
            float(jnp.sum(y))
            dt = (time.time() - t0) / 10 * 1000
            print(f"{name} bwd ({bs},{sub}): {dt:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} bwd ({bs},{sub}): FAILED "
                  f"{str(e)[:90]}", flush=True)
        finally:
            fb.pick_ftf_bwd_tile = orig
            jax.clear_caches()


B = 64
sweep("freq(L=33)", B * 126, 33, True,
      [(32, 8), (64, 8), (96, 8), (64, 4), (128, 4), (96, 4)])
sweep("time(L=129)", B * 33, 129, False,
      [(16, 2), (32, 2), (48, 2), (32, 1), (64, 1), (48, 2)])
