"""lct_gan_tpu: a TPU-native (JAX/XLA/Pallas/pjit) speech-enhancement
framework with the capabilities of the LCT-GAN reference stack.

Subpackages:
  sigproc   -- STFT/iSTFT, magnitude compression, IRM, mask algebra
  models    -- LctGenerator/LctEnhancer, MPD/MSD discriminators (Flax)
  losses    -- MR-STFT, LS/hinge GAN, feature-matching, mask MSE
  data      -- scp dataset, wav I/O, host-side prefetching pipeline
  train     -- jitted GAN train step, epoch driver, checkpointing
  parallel  -- device mesh + sharding rules (data parallelism over ICI)
  metrics   -- SI-SDR, STOI; gated PESQ wrapper
  convert   -- PyTorch checkpoint importer (for parity testing)
  ops       -- Pallas TPU kernels for hot ops
"""

__version__ = "0.1.0"
