"""Reverse conversion: our param trees -> reference PyTorch checkpoints.

Pins the torch-export path (convert/torch_export.py):
  1. import -> export roundtrips every reference PARAMETER exactly (the
     synthesized stft.window buffer to float ULPs);
  2. the exported state_dict loads into the reference LCTEnhancer with
     strict=True (reference infer.py:126 contract) and reproduces our
     enhancer's output on a waveform;
  3. save_torch_enhancer_checkpoint writes a .pt that our own
     load_generator_params reads back bit-exact (full circle);
  4. MPD/MSD roundtrip exactly in both norm modes (weight-norm g/v,
     spectral-norm weight_orig/u/v with the matricization permutation)
     and a full {'enhancer','mpd','msd'} export strict-loads into all
     three reference modules.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests._reference import import_reference, reference_available

from lct_gan_tpu.convert.torch_export import (
    export_enhancer_state_dict,
    save_torch_enhancer_checkpoint,
)
from lct_gan_tpu.convert.torch_import import convert_enhancer
from lct_gan_tpu.models import LctEnhancer

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_enhancer():
    _, ref_gen_mod, _, _ = import_reference()
    torch.manual_seed(7)
    return ref_gen_mod.LCTEnhancer(
        gen_cfg=ref_gen_mod.LCTGeneratorConfig(), c=0.3).eval()


def test_import_export_roundtrip_exact(ref_enhancer):
    sd0 = {k: v.detach().cpu().numpy()
           for k, v in ref_enhancer.state_dict().items()}
    params = convert_enhancer(sd0)
    sd1 = export_enhancer_state_dict(params)
    assert sorted(sd1) == sorted(sd0)
    for k in sd0:
        if k == "stft.window":
            # Synthesized hann buffer: torch.hann_window evaluates the
            # same formula with different rounding -- ULP-level only.
            np.testing.assert_allclose(sd1[k], sd0[k], rtol=0, atol=5e-7,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)


def test_exported_state_dict_loads_strict_and_matches(ref_enhancer):
    """Export OUR (fresh Flax-init) weights, strict-load them into the
    reference module, and check the two stacks agree on a waveform --
    i.e. a model trained here is servable by the reference."""
    enhancer = LctEnhancer()
    wave = 0.1 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 8000), jnp.float32))
    params = enhancer.init(jax.random.PRNGKey(0), jnp.asarray(wave))["params"]

    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_enhancer_state_dict(params).items()}
    ref_enhancer.load_state_dict(sd, strict=True)

    ours, _ = enhancer.apply({"params": params}, jnp.asarray(wave))
    with torch.no_grad():
        theirs, _ = ref_enhancer(torch.from_numpy(wave))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-3, atol=5e-4)


def test_checkpoint_full_circle(tmp_path, monkeypatch, ref_enhancer):
    """save_torch_enhancer_checkpoint -> load_generator_params is the
    identity on the generator tree (and the .pt carries the reference
    infer.py args contract)."""
    monkeypatch.setenv("LCT_TORCH_INPROC", "1")
    from lct_gan_tpu.train import TrainConfig
    from lct_gan_tpu.train.checkpoint import load_generator_params

    enhancer = LctEnhancer()
    params = enhancer.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 4000), jnp.float32))["params"]
    path = str(tmp_path / "exported.pt")
    save_torch_enhancer_checkpoint(path, params, compress_c=0.3,
                                   max_time_context=None)
    assert os.path.exists(path)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["args"]["compress_c"] == 0.3
    assert ckpt["args"]["max_time_context"] is None

    loaded = load_generator_params(path, TrainConfig())

    def flat(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    a, b = flat(params), flat(loaded)
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_discriminator_export_roundtrip_weight_norm():
    """MPD/MSD weight-norm import -> export roundtrips every entry
    exactly (reference discriminators.py state_dict layout)."""
    from lct_gan_tpu.convert.torch_export import (
        export_mpd_state_dict,
        export_msd_state_dict,
    )
    from lct_gan_tpu.convert.torch_import import convert_mpd, convert_msd

    _, _, ref_disc_mod, _ = import_reference()
    torch.manual_seed(11)
    mpd = ref_disc_mod.MultiPeriodDiscriminator().eval()
    msd = ref_disc_mod.MultiScaleDiscriminator().eval()
    for mod, conv, exp in ((mpd, convert_mpd, export_mpd_state_dict),
                           (msd, convert_msd, export_msd_state_dict)):
        sd0 = {k: v.detach().cpu().numpy()
               for k, v in mod.state_dict().items()}
        sd1 = exp(conv(sd0))
        assert sorted(sd1) == sorted(sd0)
        for k in sd0:
            np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)


def test_discriminator_export_roundtrip_spectral_norm():
    """Spectral-norm variants: weight_orig/u/v (with the matricization
    column permutation) must roundtrip exactly; MSD mixes SN (scale 0)
    with WN (scales 1-2) per discriminators.py:243-248."""
    from lct_gan_tpu.convert.torch_export import (
        export_mpd_state_dict,
        export_msd_state_dict,
    )
    from lct_gan_tpu.convert.torch_import import (
        convert_mpd_sn,
        convert_msd_sn,
    )

    _, _, ref_disc_mod, _ = import_reference()
    torch.manual_seed(13)
    mpd = ref_disc_mod.MultiPeriodDiscriminator(use_spectral_norm=True)
    msd = ref_disc_mod.MultiScaleDiscriminator(use_spectral_norm=True)
    for mod, conv, exp in (
            (mpd, convert_mpd_sn, export_mpd_state_dict),
            (msd, convert_msd_sn, export_msd_state_dict)):
        sd0 = {k: v.detach().cpu().numpy()
               for k, v in mod.state_dict().items()}
        params, spectral = conv(sd0)
        sd1 = exp(params, spectral)
        assert sorted(sd1) == sorted(sd0)
        for k in sd0:
            np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)


def test_checkpoint_with_discriminators_loads_strict(tmp_path, monkeypatch):
    """A full model-state export ({'enhancer','mpd','msd','args'}) must
    strict-load into all three reference modules."""
    monkeypatch.setenv("LCT_TORCH_INPROC", "1")
    from lct_gan_tpu.convert.torch_export import (
        export_mpd_state_dict,
        export_msd_state_dict,
        save_torch_enhancer_checkpoint,
    )
    from lct_gan_tpu.train import TrainConfig, create_state

    _, ref_gen_mod, ref_disc_mod, _ = import_reference()
    state = create_state(
        TrainConfig(segment_seconds=0.25, batch_size=2),
        jax.random.PRNGKey(5))
    path = str(tmp_path / "full.pt")
    save_torch_enhancer_checkpoint(
        path, state.g_params,
        mpd_sd=export_mpd_state_dict(state.mpd_params),
        msd_sd=export_msd_state_dict(state.msd_params))

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    enh = ref_gen_mod.LCTEnhancer(
        gen_cfg=ref_gen_mod.LCTGeneratorConfig(), c=0.3)
    enh.load_state_dict(ckpt["enhancer"], strict=True)
    ref_disc_mod.MultiPeriodDiscriminator().load_state_dict(
        ckpt["mpd"], strict=True)
    ref_disc_mod.MultiScaleDiscriminator().load_state_dict(
        ckpt["msd"], strict=True)
