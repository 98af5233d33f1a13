"""Numerical parity: MPD/MSD vs the reference PyTorch discriminators with
converted weight-normed weights. Our tensors are channels-last; reference
NCHW outputs are transposed for comparison.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests._reference import import_reference, reference_available

from lct_gan_tpu.convert.torch_import import convert_mpd, convert_msd
from lct_gan_tpu.models import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

torch.manual_seed(0)


@pytest.fixture(scope="module")
def ref_modules():
    return import_reference()


def _to_channels_last(t: torch.Tensor) -> np.ndarray:
    x = t.detach().numpy()
    if x.ndim == 4:  # [B, C, H, W] -> [B, H, W, C]
        return x.transpose(0, 2, 3, 1)
    if x.ndim == 3:  # [B, C, T] -> [B, T, C]
        return x.transpose(0, 2, 1)
    return x


def test_mpd_parity(ref_modules):
    _, _, ref_disc, _ = ref_modules
    torch_mpd = ref_disc.MultiPeriodDiscriminator().eval()

    B, T = 2, 4000
    x = torch.randn(B, T)
    with torch.no_grad():
        ref_logits, ref_fmaps = torch_mpd(x)

    params = convert_mpd(torch_mpd.state_dict())
    logits, fmaps = MultiPeriodDiscriminator().apply(
        {"params": params}, jnp.asarray(x.numpy()))

    assert len(logits) == len(ref_logits) == 5
    for ours, ref in zip(logits, ref_logits):
        np.testing.assert_allclose(
            np.asarray(ours), _to_channels_last(ref), rtol=1e-3, atol=1e-4)
    for ours_list, ref_list in zip(fmaps, ref_fmaps):
        assert len(ours_list) == len(ref_list) == 6
        for ours, ref in zip(ours_list, ref_list):
            np.testing.assert_allclose(
                np.asarray(ours), _to_channels_last(ref),
                rtol=1e-3, atol=1e-4)


def test_msd_parity(ref_modules):
    _, _, ref_disc, _ = ref_modules
    torch_msd = ref_disc.MultiScaleDiscriminator().eval()

    B, T = 2, 4000
    x = torch.randn(B, T)
    with torch.no_grad():
        ref_logits, ref_fmaps = torch_msd(x)

    params = convert_msd(torch_msd.state_dict())
    logits, fmaps = MultiScaleDiscriminator().apply(
        {"params": params}, jnp.asarray(x.numpy()))

    assert len(logits) == len(ref_logits) == 3
    for ours, ref in zip(logits, ref_logits):
        np.testing.assert_allclose(
            np.asarray(ours), _to_channels_last(ref), rtol=1e-3, atol=2e-4)
    for ours_list, ref_list in zip(fmaps, ref_fmaps):
        assert len(ours_list) == len(ref_list) == 7
        for ours, ref in zip(ours_list, ref_list):
            np.testing.assert_allclose(
                np.asarray(ours), _to_channels_last(ref),
                rtol=1e-3, atol=2e-4)


def test_discriminator_param_counts(ref_modules):
    """MPD 785,770 and MSD 16,924,086 trainable params (BASELINE.md)."""
    import jax

    x = jnp.zeros((1, 2000))
    mpd_vars = MultiPeriodDiscriminator().init(jax.random.PRNGKey(0), x)
    msd_vars = MultiScaleDiscriminator().init(jax.random.PRNGKey(0), x)
    n_mpd = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(mpd_vars["params"]))
    n_msd = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(msd_vars["params"]))
    assert n_mpd == 785770
    assert n_msd == 16924086
