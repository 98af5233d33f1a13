"""Spectral-norm discriminator parity vs torch (eval semantics: sigma from
the stored u/v buffers, no power iteration)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests._reference import import_reference, reference_available

from lct_gan_tpu.convert.torch_import import convert_mpd_sn, convert_msd_sn
from lct_gan_tpu.models import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

torch.manual_seed(0)


def _to_channels_last(t):
    x = t.detach().numpy()
    if x.ndim == 4:
        return x.transpose(0, 2, 3, 1)
    if x.ndim == 3:
        return x.transpose(0, 2, 1)
    return x


def test_mpd_spectral_norm_parity(ref_modules=None):
    _, _, ref_disc, _ = import_reference()
    torch_mpd = ref_disc.MultiPeriodDiscriminator(
        use_spectral_norm=True).eval()

    B, T = 2, 3000
    x = torch.randn(B, T)
    with torch.no_grad():
        ref_logits, _ = torch_mpd(x)

    params, spectral = convert_mpd_sn(torch_mpd.state_dict())
    logits, _ = MultiPeriodDiscriminator(use_spectral_norm=True).apply(
        {"params": params, "spectral": spectral}, jnp.asarray(x.numpy()))

    for ours, ref in zip(logits, ref_logits):
        np.testing.assert_allclose(
            np.asarray(ours), _to_channels_last(ref), rtol=1e-3, atol=1e-4)


def test_msd_mixed_norm_parity():
    """use_spectral_norm=True -> SN on scale 0 only, WN on scales 1-2
    (reference: discriminators.py:243-248)."""
    _, _, ref_disc, _ = import_reference()
    torch_msd = ref_disc.MultiScaleDiscriminator(
        use_spectral_norm=True).eval()

    B, T = 2, 3000
    x = torch.randn(B, T)
    with torch.no_grad():
        ref_logits, _ = torch_msd(x)

    params, spectral = convert_msd_sn(torch_msd.state_dict())
    logits, _ = MultiScaleDiscriminator(use_spectral_norm=True).apply(
        {"params": params, "spectral": spectral}, jnp.asarray(x.numpy()))

    for ours, ref in zip(logits, ref_logits):
        np.testing.assert_allclose(
            np.asarray(ours), _to_channels_last(ref), rtol=1e-3, atol=2e-4)


def test_sn_power_iteration_updates():
    """Training mode (mutable 'spectral') performs a power iteration and
    converges sigma toward the true top singular value."""
    import jax

    from lct_gan_tpu.models.norm import SNConv

    mod = SNConv(features=8, kernel_size=(3,), strides=(1,), padding=(1,))
    x = jnp.ones((2, 16, 4))
    variables = mod.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    spectral = variables["spectral"]

    w = np.asarray(params["kernel"])  # [k, in, out]
    mat = w.transpose(2, 0, 1).reshape(8, -1)
    true_sigma = np.linalg.svd(mat, compute_uv=False)[0]

    for _ in range(30):
        _, mut = mod.apply({"params": params, "spectral": spectral}, x,
                           mutable=["spectral"])
        spectral = mut["spectral"]

    u = np.asarray(spectral["u"])
    v = np.asarray(spectral["v"])
    sigma = u @ mat @ v
    np.testing.assert_allclose(sigma, true_sigma, rtol=1e-3)
