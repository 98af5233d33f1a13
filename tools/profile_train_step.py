"""Train-step time breakdown on the real TPU.

Times isolated jitted pieces of the GAN step (G forward, G forward+backward,
discriminator forward/backward, full D step, full G step, fused full step)
so perf work targets the real bottleneck. Run on TPU:

    python tools/profile_train_step.py [batch] [--bf16]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lct_gan_tpu.train.state import TrainConfig, create_state  # noqa: E402
from lct_gan_tpu.train.step import make_train_step  # noqa: E402
from lct_gan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
bf16 = "--bf16" in sys.argv
cfg = TrainConfig(batch_size=batch, bf16=bf16)
state = create_state(cfg, jax.random.PRNGKey(0))

seg = cfg.segment_length
rng = np.random.default_rng(0)
clean = jnp.asarray(rng.standard_normal((batch, seg)).astype(np.float32) * .1)
noisy = clean + jnp.asarray(
    rng.standard_normal((batch, seg)).astype(np.float32) * .05)

from lct_gan_tpu.losses import (  # noqa: E402
    MRSTFTLossConfig,
    discriminator_loss,
    mr_stft_loss,
)
from lct_gan_tpu.train.state import build_models  # noqa: E402

enhancer, mpd, msd = build_models(cfg)
mr_cfg = MRSTFTLossConfig()


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # tunnel fence
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:34s} {dt:8.1f} ms")
    return dt


@jax.jit
def g_fwd(g_params, noisy):
    wave, mask = enhancer.apply({"params": g_params}, noisy)
    return wave


@jax.jit
def g_fwd_bwd(g_params, noisy, clean):
    def loss(p):
        wave, mask = enhancer.apply({"params": p}, noisy)
        l, _ = mr_stft_loss(wave, clean, mr_cfg)
        return l
    return jax.grad(loss)(g_params)


@jax.jit
def d_fwd(d_params, wave):
    lm, fm = mpd.apply({"params": d_params[0]}, wave)
    ls, fs = msd.apply({"params": d_params[1]}, wave)
    return sum(jnp.sum(x) for x in lm + ls)


@jax.jit
def d_fwd_bwd(d_params, real, fake):
    def loss(p):
        lr, _ = mpd.apply({"params": p[0]}, real)
        lf, _ = mpd.apply({"params": p[0]}, fake)
        sr, _ = msd.apply({"params": p[1]}, real)
        sf, _ = msd.apply({"params": p[1]}, fake)
        l = discriminator_loss(lr + sr, lf + sf)
        return l
    return jax.grad(loss)(d_params)


full = jax.jit(make_train_step(cfg))

print(f"batch={batch} bf16={bf16} seg={seg}")
t_gf = timeit("G forward (enhancer)", g_fwd, state.g_params, noisy)
t_gb = timeit("G fwd+bwd (mrstft only)", g_fwd_bwd, state.g_params, noisy,
              clean)
t_df = timeit("D forward (mpd+msd, 1 wave)", d_fwd, (state.mpd_params, state.msd_params), clean)
t_db = timeit("D fwd+bwd (2 waves)", d_fwd_bwd, (state.mpd_params, state.msd_params), clean, noisy)
t_full = timeit("FULL train step", full, state, noisy, clean)
print(f"\nG bwd-only est: {t_gb - t_gf:.1f} ms; "
      f"full-step accounted: G~{t_gb:.0f} + D-step~{t_db:.0f} "
      f"+ G-adv D fwds ~{3 * t_df:.0f} vs full {t_full:.0f}")
