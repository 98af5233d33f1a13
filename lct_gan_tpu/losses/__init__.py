from lct_gan_tpu.losses.losses import (
    MRSTFTLossConfig,
    MultiResolutionSTFTLoss,
    mr_stft_loss,
    mr_stft_loss_per_sample,
    discriminator_loss,
    generator_adv_loss,
    feature_matching_loss,
    mask_mse_loss,
    flatten_logits_lists,
)

__all__ = [
    "MRSTFTLossConfig",
    "MultiResolutionSTFTLoss",
    "mr_stft_loss",
    "mr_stft_loss_per_sample",
    "discriminator_loss",
    "generator_adv_loss",
    "feature_matching_loss",
    "mask_mse_loss",
    "flatten_logits_lists",
]
