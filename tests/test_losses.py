"""Loss parity vs the reference losses.py (torch CPU oracle) plus feature
pipeline parity vs datasets/tf_features.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests._reference import import_reference, reference_available

from lct_gan_tpu.losses import (
    MRSTFTLossConfig,
    discriminator_loss,
    feature_matching_loss,
    flatten_logits_lists,
    generator_adv_loss,
    mask_mse_loss,
    mr_stft_loss,
)
from lct_gan_tpu.sigproc import TFFeaturesConfig, compute_tf_features

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    return import_reference()


def test_mr_stft_loss_parity(ref_modules):
    _, _, _, ref_losses = ref_modules
    rng = np.random.default_rng(0)
    y_hat = rng.standard_normal((3, 16000)).astype(np.float32) * 0.1
    y = rng.standard_normal((3, 16000)).astype(np.float32) * 0.1

    ref_mod = ref_losses.MultiResolutionSTFTLoss(ref_losses.MRSTFTLossConfig())
    with torch.no_grad():
        ref_total, ref_details = ref_mod(
            torch.from_numpy(y_hat), torch.from_numpy(y))

    total, details = mr_stft_loss(jnp.asarray(y_hat), jnp.asarray(y))
    np.testing.assert_allclose(float(total), float(ref_total),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(details["mrstft_mag"]),
                               float(ref_details["mrstft_mag"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(details["mrstft_complex"]),
                               float(ref_details["mrstft_complex"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("loss_type", ["ls", "hinge"])
def test_gan_losses_parity(ref_modules, loss_type):
    _, _, _, ref_losses = ref_modules
    rng = np.random.default_rng(1)
    real = [rng.standard_normal((2, 1, 7, p)).astype(np.float32)
            for p in (3, 5)]
    fake = [rng.standard_normal((2, 1, 7, p)).astype(np.float32)
            for p in (3, 5)]

    ref_d = ref_losses.discriminator_loss(
        [torch.from_numpy(r) for r in real],
        [torch.from_numpy(f) for f in fake], loss_type=loss_type)
    ref_g = ref_losses.generator_adv_loss(
        [torch.from_numpy(f) for f in fake], loss_type=loss_type)

    ours_d = discriminator_loss([jnp.asarray(r) for r in real],
                                [jnp.asarray(f) for f in fake],
                                loss_type=loss_type)
    ours_g = generator_adv_loss([jnp.asarray(f) for f in fake],
                                loss_type=loss_type)
    np.testing.assert_allclose(float(ours_d), float(ref_d), rtol=1e-5)
    np.testing.assert_allclose(float(ours_g), float(ref_g), rtol=1e-5)


def test_feature_matching_parity(ref_modules):
    _, _, _, ref_losses = ref_modules
    rng = np.random.default_rng(2)
    real = [[rng.standard_normal((2, 4, 9)).astype(np.float32)
             for _ in range(3)] for _ in range(2)]
    fake = [[rng.standard_normal((2, 4, 9)).astype(np.float32)
             for _ in range(3)] for _ in range(2)]

    ref = ref_losses.feature_matching_loss(
        [[torch.from_numpy(t) for t in lst] for lst in real],
        [[torch.from_numpy(t) for t in lst] for lst in fake])
    ours = feature_matching_loss(
        [[jnp.asarray(t) for t in lst] for lst in real],
        [[jnp.asarray(t) for t in lst] for lst in fake])
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_mask_mse_parity(ref_modules):
    _, _, _, ref_losses = ref_modules
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (2, 257, 20)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 257, 20)).astype(np.float32)
    ref = ref_losses.mask_mse_loss(torch.from_numpy(a), torch.from_numpy(b))
    ours = mask_mse_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_flatten_logits_lists():
    a = [jnp.zeros((1,)), jnp.ones((2,))]
    b = [jnp.full((3,), 2.0)]
    flat = flatten_logits_lists(a, b)
    assert len(flat) == 3


def test_tf_features_parity(ref_modules):
    """Feature pipeline vs reference datasets/tf_features.py:85-146."""
    import importlib

    tf_feats_mod = importlib.import_module("datasets.tf_features")
    rng = np.random.default_rng(4)
    noisy = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    clean = rng.standard_normal((2, 16000)).astype(np.float32) * 0.05

    ref_cfg = tf_feats_mod.TFFeaturesConfig(
        n_fft=512, c=0.3, compress_input=False, return_stfts=True)
    ref_mod = tf_feats_mod.TFFeatures(ref_cfg)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(noisy), torch.from_numpy(clean))

    ours = compute_tf_features(
        jnp.asarray(noisy), jnp.asarray(clean),
        TFFeaturesConfig(n_fft=512, c=0.3, compress_input=False,
                         return_stfts=True))

    for key in ("noisy_mag", "irm_c", "noisy_mag_c"):
        np.testing.assert_allclose(
            np.asarray(ours[key]), ref[key].numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["noisy_stft"]), ref["noisy_stft"].numpy(),
        rtol=1e-3, atol=2e-4)
