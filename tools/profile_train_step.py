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

batch = (int(sys.argv[1]) if len(sys.argv) > 1
         and not sys.argv[1].startswith("-") else 64)
bf16 = "--bf16" in sys.argv
use_sn = "--use_spectral_norm" in sys.argv
fast_sn = "--fast_spectral_norm" in sys.argv
remainder = "--remainder" in sys.argv
cfg = TrainConfig(batch_size=batch, bf16=bf16, use_spectral_norm=use_sn,
                  fast_spectral_norm=fast_sn)
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

print(f"batch={batch} bf16={bf16} use_spectral_norm={use_sn} "
      f"fast_spectral_norm={fast_sn} seg={seg}")

if remainder:
    # --remainder: isolate the pieces of the full step that the four
    # headline rows do NOT account for (G-adv D forwards with feature
    # maps + adv/FM losses, the TF feature pipeline, the MR-STFT loss
    # w.r.t. the waveform, and the two optimizer updates), so the
    # "everything else" bucket has a published breakdown.
    from lct_gan_tpu.losses import (  # noqa: E402
        feature_matching_loss,
        flatten_logits_lists,
        generator_adv_loss,
    )
    from lct_gan_tpu.sigproc import (  # noqa: E402
        TFFeaturesConfig,
        compute_tf_features,
    )
    from lct_gan_tpu.train.state import make_optimizers  # noqa: E402

    tf_cfg = TFFeaturesConfig(n_fft=512, c=cfg.compress_c,
                              compress_input=False, return_stfts=False)

    @jax.jit
    def tf_feats(noisy, clean):
        return compute_tf_features(noisy, clean, tf_cfg)["irm_c"]

    @jax.jit
    def mr_wave_bwd(enhanced, clean):
        return jax.grad(lambda e: mr_stft_loss(e, clean, mr_cfg)[0])(enhanced)

    @jax.jit
    def gadv_fwd_bwd(d_params, enhanced, clean):
        # The G-step adversarial piece exactly as train_step builds it
        # (concat-batched 2B apply, adv + FM losses), differentiated
        # w.r.t. the enhancer OUTPUT (the enhancer bwd itself is counted
        # in the G fwd+bwd row).
        def loss(e):
            b = e.shape[0]
            both = jnp.concatenate([e, clean], axis=0)
            mpd_l, mpd_fm = mpd.apply({"params": d_params[0]}, both)
            msd_l, msd_fm = msd.apply({"params": d_params[1]}, both)
            adv = generator_adv_loss(
                flatten_logits_lists([l[:b] for l in mpd_l],
                                     [l[:b] for l in msd_l]))
            fake_fm = ([[f[:b] for f in fs] for fs in mpd_fm]
                       + [[f[:b] for f in fs] for fs in msd_fm])
            real_fm = jax.lax.stop_gradient(
                [[f[b:] for f in fs] for fs in mpd_fm]
                + [[f[b:] for f in fs] for fs in msd_fm])
            return adv + cfg.lambda_fm * feature_matching_loss(
                real_fm, fake_fm)
        return jax.grad(loss)(enhanced)

    g_tx, d_tx = make_optimizers(cfg)

    @jax.jit
    def opt_updates(state, g_grads, d_grads):
        g_up, g_os = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        d_params = {"mpd": state.mpd_params, "msd": state.msd_params}
        d_up, d_os = d_tx.update(d_grads, state.d_opt_state, d_params)
        new_g = jax.tree.map(lambda p, u: p + u, state.g_params, g_up)
        new_d = jax.tree.map(lambda p, u: p + u, d_params, d_up)
        return new_g, new_d, g_os, d_os

    g_grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, state.g_params)
    d_grads = {"mpd": jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4,
                                   state.mpd_params),
               "msd": jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4,
                                   state.msd_params)}
    timeit("tf features (irm_c)", tf_feats, noisy, clean)
    timeit("MR-STFT fwd+bwd wrt wave", mr_wave_bwd, clean, noisy)
    timeit("G-adv D fwd+FM, bwd wrt wave", gadv_fwd_bwd,
           (state.mpd_params, state.msd_params), noisy, clean)
    timeit("optimizer updates (G+D AdamW)", opt_updates, state, g_grads,
           d_grads)
if use_sn:
    # The piecewise D helpers don't thread the spectral (u/v) collection;
    # the headline question for SN is the full-step cost of the
    # power-iteration-order-preserving 4-apply sequential form vs the
    # default concat-batched path (train/step.py).
    timeit("FULL train step (spectral norm)", full, state, noisy, clean)
else:
    t_gf = timeit("G forward (enhancer)", g_fwd, state.g_params, noisy)
    t_gb = timeit("G fwd+bwd (mrstft only)", g_fwd_bwd, state.g_params,
                  noisy, clean)
    t_df = timeit("D forward (mpd+msd, 1 wave)", d_fwd,
                  (state.mpd_params, state.msd_params), clean)
    t_db = timeit("D fwd+bwd (2 waves)", d_fwd_bwd,
                  (state.mpd_params, state.msd_params), clean, noisy)
    t_full = timeit("FULL train step", full, state, noisy, clean)
    print(f"\nG bwd-only est: {t_gb - t_gf:.1f} ms; "
          f"full-step accounted: G~{t_gb:.0f} + D-step~{t_db:.0f} "
          f"+ G-adv D fwds ~{3 * t_df:.0f} vs full {t_full:.0f}")
