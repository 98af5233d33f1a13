"""Discriminator backward-pass breakdown on the real TPU.

The GAN step's D fwd+bwd measured ~9x the D forward (bf16, B=64) --
pathological for conv nets (expected ~3x). This times MPD and MSD
separately, and each MSD scale / MPD period alone, fwd vs fwd+bwd, to
locate the slow gradient ops (grouped-conv wgrad is the usual TPU
suspect). Run: python tools/profile_d_bwd.py [batch] [--f32]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lct_gan_tpu.models.discriminators import (  # noqa: E402
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    PeriodDiscriminator,
    ScaleDiscriminator,
)
from lct_gan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
T = 32000
rng = np.random.default_rng(0)
wave = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32) * .1)


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


def bench(name, module):
    params = jax.jit(module.init)(jax.random.PRNGKey(0), wave)["params"]

    @jax.jit
    def fwd(p, w):
        logits, fmaps = module.apply({"params": p}, w)
        return sum(jnp.sum(l) for l in jax.tree.leaves(logits))

    @jax.jit
    def fwd_bwd(p, w):
        return jax.grad(lambda p: fwd(p, w))(p)

    @jax.jit
    def input_grad(p, w):
        return jax.grad(lambda w: fwd(p, w))(w)

    tf = timeit(f"{name} fwd", fwd, params, wave)
    tb = timeit(f"{name} fwd+wgrad", fwd_bwd, params, wave)
    ti = timeit(f"{name} fwd+igrad", input_grad, params, wave)
    print(f"{name}: bwd/fwd ratio {tb / tf:.1f} (wgrad), "
          f"{ti / tf:.1f} (igrad)", flush=True)


print(f"batch={batch} dtype={dtype.__name__} T={T}")
bench("MPD", MultiPeriodDiscriminator(dtype=dtype))
bench("MSD", MultiScaleDiscriminator(dtype=dtype))
for p in (2, 11):
    bench(f"period{p}", PeriodDiscriminator(period=p, dtype=dtype))
bench("scale0", ScaleDiscriminator(use_spectral_norm=False, dtype=dtype))
