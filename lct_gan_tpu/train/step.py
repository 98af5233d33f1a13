"""The jitted GAN optimization step (D step then G step) and the jitted
eval step.

Replicates the reference's per-batch schedule (train.py:145-258):
  1. IRM^c targets from the TF feature pipeline,
  2. D step on stop_gradient'd enhancer output (torch.no_grad equivalent),
  3. D update,
  4. G step against the UPDATED discriminators: MR-STFT + lambda_mask *
     mask-MSE + lambda_adv * (adv + lambda_fm * FM),
  5. G update with global-norm clip.

Everything -- both forwards/backwards, feature extraction, all 10+ STFTs --
compiles into ONE XLA program. The noisy-signal STFT appears in both the
feature pipeline and the enhancer; XLA CSEs the duplicate FFTs that the
reference executes twice. Donated state gives in-place parameter updates.

Data parallelism comes from sharding, not code: batches arrive sharded on
the 'data' mesh axis, parameters are replicated, and XLA inserts gradient
all-reduces automatically (see lct_gan_tpu/parallel/mesh.py).
"""

from __future__ import annotations


from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from lct_gan_tpu.losses import (
    discriminator_loss,
    feature_matching_loss,
    flatten_logits_lists,
    generator_adv_loss,
    mask_mse_loss,
    mr_stft_loss,
    mr_stft_loss_per_sample,
)
from lct_gan_tpu.sigproc import TFFeaturesConfig, compute_tf_features
from lct_gan_tpu.train.state import (
    GanTrainState,
    TrainConfig,
    build_models,
    make_optimizers,
)

__all__ = ["make_train_step", "make_eval_step", "align_tf_targets"]


def align_tf_targets(irm_c: jax.Array,
                     pred_mask_c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Crop IRM target and predicted mask to the minimum frame count
    (reference: train.py:388-413). Static shapes -> trace-time slice."""
    t = min(irm_c.shape[-1], pred_mask_c.shape[-1])
    return irm_c[..., :t], pred_mask_c[..., :t]


def make_train_step(cfg: TrainConfig):
    """Build the fused D+G train step: (state, noisy, clean) ->
    (state, metrics)."""
    enhancer, mpd, msd = build_models(cfg)
    g_tx, d_tx = make_optimizers(cfg)
    tf_cfg = TFFeaturesConfig(n_fft=512, c=cfg.compress_c,
                              compress_input=False, return_stfts=False)

    use_sn = cfg.use_spectral_norm
    # Concat-batched D applies (one 2B apply per stack) are used by the
    # default weight-norm path and, opt-in, by fast spectral norm; the
    # parity SN path keeps torch's sequential per-B applies because each
    # training forward advances the u/v power iteration, so the apply
    # ORDER changes the u/v trajectory (not the steady state).
    concat_batched = (not use_sn) or cfg.fast_spectral_norm

    def apply_disc(model, params, spectral, x):
        """Discriminator forward with torch spectral-norm semantics: when
        SN is on, every training-mode forward runs one power iteration on
        the u/v buffers (torch updates them even under no_grad -- they are
        buffers, gated by module.training, not by grad mode)."""
        if not use_sn:
            return model.apply({"params": params}, x), spectral
        out, upd = model.apply({"params": params, "spectral": spectral}, x,
                               mutable=["spectral"])
        return out, upd["spectral"]

    def train_step(state: GanTrainState, noisy: jax.Array,
                   clean: jax.Array) -> Tuple[GanTrainState, Dict[str, Any]]:
        irm_c = compute_tf_features(noisy, clean, tf_cfg)["irm_c"]

        # ONE enhancer forward serves both phases. The reference forwards
        # twice (no_grad for the D step, train.py:180-181, then with grad
        # for the G step, :208-209) because torch needs a fresh graph; the
        # forward does not depend on D params, so here an explicit vjp
        # gives the D step its fake AND the G step its residuals from the
        # same pass. XLA cannot CSE the two applies itself: the G-step
        # forward runs the save_hidden variant of the fused FTF kernel
        # (ops/ftf.py), a different pallas_call than the plain forward.
        # Measured: full step 256 -> 240 ms (B=64 bf16, v5e-1); verified
        # bit-exact (metrics and updated params) vs the two-forward form.
        (enhanced0, mask_c0), enh_vjp = jax.vjp(
            lambda p: enhancer.apply({"params": p}, noisy), state.g_params)
        fake_for_d = jax.lax.stop_gradient(enhanced0)

        def d_loss_fn(d_params, spectral):
            if concat_batched:
                # Real+fake CONCAT-batched through each stack: identical
                # math (every discriminator op is per-sample), but ONE
                # conv graph at 2B instead of two at B -- measured 1.9x
                # faster fwd+bwd on v5e (143 -> 75 ms at B=64 bf16).
                # Under fast_spectral_norm this runs ONE power iteration
                # per stack here (torch-order parity runs two).
                both = jnp.concatenate([clean, fake_for_d], axis=0)
                b = clean.shape[0]
                sp_mpd = spectral["mpd"] if use_sn else None
                sp_msd = spectral["msd"] if use_sn else None
                (mpd_l, _), sp_mpd = apply_disc(
                    mpd, d_params["mpd"], sp_mpd, both)
                (msd_l, _), sp_msd = apply_disc(
                    msd, d_params["msd"], sp_msd, both)
                loss = discriminator_loss(
                    flatten_logits_lists([l[:b] for l in mpd_l],
                                         [l[:b] for l in msd_l]),
                    flatten_logits_lists([l[b:] for l in mpd_l],
                                         [l[b:] for l in msd_l]),
                    loss_type=cfg.gan_loss)
                return loss, ({"mpd": sp_mpd, "msd": sp_msd} if use_sn
                              else None)
            # Spectral norm: forward order matches the reference
            # (train.py:184-189) -- each forward runs one power
            # iteration, so the u/v trajectory depends on the sequence
            # and concat-batching would change it.
            sp_mpd = spectral["mpd"]
            sp_msd = spectral["msd"]
            (mpd_real, _), sp_mpd = apply_disc(
                mpd, d_params["mpd"], sp_mpd, clean)
            (mpd_fake, _), sp_mpd = apply_disc(
                mpd, d_params["mpd"], sp_mpd, fake_for_d)
            (msd_real, _), sp_msd = apply_disc(
                msd, d_params["msd"], sp_msd, clean)
            (msd_fake, _), sp_msd = apply_disc(
                msd, d_params["msd"], sp_msd, fake_for_d)
            loss = discriminator_loss(
                flatten_logits_lists(mpd_real, msd_real),
                flatten_logits_lists(mpd_fake, msd_fake),
                loss_type=cfg.gan_loss)
            return loss, {"mpd": sp_mpd, "msd": sp_msd}

        d_params = {"mpd": state.mpd_params, "msd": state.msd_params}
        (d_loss, spectral), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params, state.spectral)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             d_params)
        d_params = jax.tree.map(lambda p, u: p + u, d_params, d_updates)

        # ---- Generator step against updated D (train.py:204-249) ----
        # Differentiated w.r.t. the enhancer OUTPUTS; the cotangents chain
        # through enh_vjp below to give exactly d(g_loss)/d(g_params).
        def g_loss_fn(enhanced, mask_c, spectral):
            mr_loss, _ = mr_stft_loss(enhanced, clean)

            irm_a, pred_a = align_tf_targets(irm_c, mask_c[:, 0])
            m_loss = mask_mse_loss(pred_a, irm_a)

            if concat_batched:
                # Same concat-batching as the D step: fake+real through
                # each stack once. Row independence keeps the math
                # identical; the real rows depend only on `clean`, so no
                # generator gradient flows through them (stop_gradient
                # kept for clarity). NEGATIVE RESULT (r3, do not retry):
                # splitting this into fake-apply (B, differentiated) +
                # real-apply (B, forward-only) to halve the input-grad
                # convs and the FM cotangent pad/add_any measured SLOWER
                # (full step 240 -> 247 ms; xprof: the 9.6 ms FM add_any
                # disappears but the grouped-conv dgrads cost the same at
                # B as at 2B -- they are MXU-utilization-bound, not
                # batch-bound -- while the two B forwards cost +3.6 ms
                # and the FM forward reductions +1.8 ms).
                b = enhanced.shape[0]
                both = jnp.concatenate([enhanced, clean], axis=0)
                sp_mpd = spectral["mpd"] if use_sn else None
                sp_msd = spectral["msd"] if use_sn else None
                ((mpd_l, mpd_fm), sp_mpd_2) = apply_disc(
                    mpd, d_params["mpd"], sp_mpd, both)
                ((msd_l, msd_fm), sp_msd_2) = apply_disc(
                    msd, d_params["msd"], sp_msd, both)
                mpd_fake = [l[:b] for l in mpd_l]
                msd_fake = [l[:b] for l in msd_l]
                mpd_fake_fm = [[f[:b] for f in fs] for fs in mpd_fm]
                msd_fake_fm = [[f[:b] for f in fs] for fs in msd_fm]
                mpd_real_fm = jax.lax.stop_gradient(
                    [[f[b:] for f in fs] for fs in mpd_fm])
                msd_real_fm = jax.lax.stop_gradient(
                    [[f[b:] for f in fs] for fs in msd_fm])
            else:
                sp_mpd = spectral["mpd"]
                sp_msd = spectral["msd"]
                (mpd_out, sp_mpd_1) = apply_disc(
                    mpd, d_params["mpd"], sp_mpd, enhanced)
                mpd_fake, mpd_fake_fm = mpd_out
                (msd_out, sp_msd_1) = apply_disc(
                    msd, d_params["msd"], sp_msd, enhanced)
                msd_fake, msd_fake_fm = msd_out
                ((_, mpd_real_fm), sp_mpd_2) = apply_disc(
                    mpd, d_params["mpd"], sp_mpd_1, clean)
                ((_, msd_real_fm), sp_msd_2) = apply_disc(
                    msd, d_params["msd"], sp_msd_1, clean)
                mpd_real_fm = jax.lax.stop_gradient(mpd_real_fm)
                msd_real_fm = jax.lax.stop_gradient(msd_real_fm)

            adv_loss = generator_adv_loss(
                flatten_logits_lists(mpd_fake, msd_fake),
                loss_type=cfg.gan_loss)
            fm_loss = feature_matching_loss(mpd_real_fm + msd_real_fm,
                                            mpd_fake_fm + msd_fake_fm)
            adv_total = adv_loss + cfg.lambda_fm * fm_loss
            g_loss = (mr_loss + cfg.lambda_mask * m_loss +
                      cfg.lambda_adv * adv_total)
            new_sp = ({"mpd": sp_mpd_2, "msd": sp_msd_2} if use_sn
                      else None)
            aux = {
                "mr_loss": mr_loss,
                "mask_loss": m_loss,
                "adv_loss": adv_loss,
                "fm_loss": fm_loss,
            }
            return g_loss, (aux, new_sp)

        (g_loss, (aux, spectral)), out_grads = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1), has_aux=True)(
                enhanced0, mask_c0, spectral)
        (g_grads,) = enh_vjp(out_grads)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = jax.tree.map(lambda p, u: p + u, state.g_params, g_updates)

        new_state = GanTrainState(
            step=state.step + 1,
            g_params=g_params,
            mpd_params=d_params["mpd"],
            msd_params=d_params["msd"],
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            spectral=jax.lax.stop_gradient(spectral) if use_sn else None,
        )
        metrics = {"d_loss": d_loss, "g_loss": g_loss, **aux}
        return new_state, metrics

    return train_step


def make_eval_step(cfg: TrainConfig):
    """Build the jitted eval step: (g_params, noisy, clean, lengths) ->
    (enhanced, {mrstft [B], si_sdr [B]}) with length-masked SI-SDR
    (reference: train.py:285-385 computes these per utterance on device).

    MR-STFT is PER-SAMPLE so the caller can exclude padded tail-batch rows
    from the validation mean (the scalar mean would over-weight the
    repeated pad rows and bias best-checkpoint selection)."""
    enhancer, _, _ = build_models(cfg)

    def eval_step(g_params, noisy, clean, lengths):
        # lengths also masks the time attention's keys so padded rows of
        # bucketed val batches don't perturb valid rows' enhancement
        # (models/generator.py TimeGRUBlock).
        enhanced, _ = enhancer.apply({"params": g_params}, noisy, lengths)
        mr = mr_stft_loss_per_sample(enhanced, clean)
        si = _masked_si_sdr(clean, enhanced, lengths)
        return enhanced, {"mrstft": mr, "si_sdr": si}

    return eval_step


def _masked_si_sdr(reference: jax.Array, estimate: jax.Array,
                   lengths: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-utterance SI-SDR over zero-padded batches
    (reference formula: train.py:261-282). Returns [B]."""
    B, T = reference.shape
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    n = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    ref = (reference - jnp.sum(reference * mask, -1, keepdims=True) /
           n[:, None]) * mask
    est = (estimate - jnp.sum(estimate * mask, -1, keepdims=True) /
           n[:, None]) * mask
    ref_energy = jnp.sum(ref * ref, -1) + eps
    scale = jnp.sum(ref * est, -1) / ref_energy
    s_target = scale[:, None] * ref
    e_noise = est - s_target
    return 10.0 * jnp.log10(
        (jnp.sum(s_target * s_target, -1) + eps) /
        (jnp.sum(e_noise * e_noise, -1) + eps))
