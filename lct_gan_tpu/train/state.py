"""Training configuration and GAN train state.

Mirrors the reference's optimizer setup (train.py:601-610: two AdamW
optimizers, G over enhancer params, D over MPD+MSD jointly, betas
(0.8, 0.99), lr 2e-4) and flag surface (train.py:416-522).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lct_gan_tpu.models import (
    LCTGeneratorConfig,
    LctEnhancer,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

__all__ = ["TrainConfig", "GanTrainState", "build_models", "create_state"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters (defaults = reference train.py:416-522)."""

    sample_rate: int = 16000
    segment_seconds: float = 2.0
    batch_size: int = 8
    epochs: int = 100
    lr_g: float = 2e-4
    lr_d: float = 2e-4
    betas_g: Tuple[float, float] = (0.8, 0.99)
    betas_d: Tuple[float, float] = (0.8, 0.99)
    grad_clip: float = 5.0
    lambda_mask: float = 1.0
    lambda_adv: float = 1e-2
    lambda_fm: float = 1.0
    gan_loss: str = "ls"
    compress_c: float = 0.3
    num_heads: int = 4
    gru_groups: int = 4
    max_time_context: Optional[int] = None
    # Spectral norm on MPD + MSD scale 0 (reference discriminators.py:
    # 243-248 supports it at module level; its train.py never exposes a
    # flag). Training with it threads the 'spectral' u/v buffers through
    # every discriminator forward, torch power-iteration semantics.
    use_spectral_norm: bool = False
    # Opt-in fast spectral-norm step: real+fake CONCAT-batched through
    # each discriminator stack (one 2B apply instead of two sequential B
    # applies per stack), same as the default weight-norm path. The
    # sigma math per sample is identical; only the u/v power-iteration
    # TRAJECTORY differs from torch (one iteration per 2B apply instead
    # of one per B apply -- half as many per step). Power iteration's
    # fixed point is the weight's top singular pair regardless of how
    # often it runs, so training dynamics match the parity path in
    # steady state (tools/sn_dynamics.py measures it); use
    # use_spectral_norm WITHOUT this flag for bit-honest torch
    # power-iteration ORDER parity. Measured v5e-1 step time B=64 bf16:
    # parity 305.8 ms, fast see docs/STATUS.md ledger.
    fast_spectral_norm: bool = False
    # bf16 discriminator compute (params stay f32; MXU accumulates f32).
    # The generator keeps f32 convs + bf16-matmul Pallas kernels either way.
    bf16: bool = False
    seed: int = 42
    log_interval: int = 50
    val_interval: int = 50
    ckpt_interval: int = 50
    # Padded audio-seconds per ADAPTIVE validation batch (0 disables:
    # fixed batch_size rows). Full-utterance val batches are sized per
    # length bucket -- target // bucket rows, <= 128 -- so short buckets
    # fill the chip instead of running at the small train batch size.
    # Per-utterance metrics are lengths-masked and averaged over valid
    # rows, so the val numbers are invariant to this (tests pin it).
    val_target_batch_seconds: float = 256.0

    @property
    def segment_length(self) -> int:
        return int(self.segment_seconds * self.sample_rate)


class GanTrainState(struct.PyTreeNode):
    """Complete on-device training state (both players + optimizers).

    `spectral` holds the discriminators' spectral-norm u/v power-iteration
    buffers ({"mpd": ..., "msd": ...}) when use_spectral_norm=True; None
    (an empty pytree) for the default weight-norm configuration."""

    step: jax.Array
    g_params: Any
    mpd_params: Any
    msd_params: Any
    g_opt_state: Any
    d_opt_state: Any
    spectral: Any = None


def build_models(cfg: TrainConfig):
    """Instantiate the three model defs (reference train.py:569-585).

    Unlike the reference -- where num_heads/gru_groups are plumbed through
    the CLI but never read (SURVEY.md §2.4) -- these are honored here."""
    gen_cfg = LCTGeneratorConfig(num_heads=cfg.num_heads,
                                 gru_groups=cfg.gru_groups,
                                 max_time_context=cfg.max_time_context)
    ddtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    enhancer = LctEnhancer(gen_cfg=gen_cfg, c=cfg.compress_c)
    mpd = MultiPeriodDiscriminator(use_spectral_norm=cfg.use_spectral_norm,
                                   dtype=ddtype)
    msd = MultiScaleDiscriminator(use_spectral_norm=cfg.use_spectral_norm,
                                  dtype=ddtype)
    return enhancer, mpd, msd


def make_optimizers(cfg: TrainConfig):
    """AdamW pair; global-norm clip on G only (train.py:245-249, 601-610).
    torch AdamW defaults: eps=1e-8, weight_decay=0.01."""
    g_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip > 0
        else optax.identity(),
        optax.adamw(cfg.lr_g, b1=cfg.betas_g[0], b2=cfg.betas_g[1],
                    eps=1e-8, weight_decay=0.01),
    )
    d_tx = optax.adamw(cfg.lr_d, b1=cfg.betas_d[0], b2=cfg.betas_d[1],
                       eps=1e-8, weight_decay=0.01)
    return g_tx, d_tx


def create_state(cfg: TrainConfig, rng: jax.Array) -> GanTrainState:
    """Initialize parameters and optimizer states.

    The whole init is jitted into ONE XLA program: Flax init is otherwise
    eager op-by-op dispatch, which over a tunneled TPU backend means one
    RPC round-trip per op (minutes for the 17.8M-param discriminator
    stack)."""
    enhancer, mpd, msd = build_models(cfg)
    g_tx, d_tx = make_optimizers(cfg)
    seg = cfg.segment_length

    def init(rng):
        rng_g, rng_mpd, rng_msd = jax.random.split(rng, 3)
        wave = jnp.zeros((1, seg), jnp.float32)
        g_params = enhancer.init(rng_g, wave)["params"]
        mpd_vars = mpd.init(rng_mpd, wave)
        msd_vars = msd.init(rng_msd, wave)
        mpd_params = mpd_vars["params"]
        msd_params = msd_vars["params"]
        spectral = None
        if cfg.use_spectral_norm:
            spectral = {"mpd": mpd_vars["spectral"],
                        "msd": msd_vars["spectral"]}
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            mpd_params=mpd_params,
            msd_params=msd_params,
            g_opt_state=g_tx.init(g_params),
            d_opt_state=d_tx.init({"mpd": mpd_params, "msd": msd_params}),
            spectral=spectral,
        )

    return jax.jit(init)(rng)
