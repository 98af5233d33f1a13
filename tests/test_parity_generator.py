"""Numerical parity: our Flax generator vs the reference PyTorch generator
with converted weights (the notebook golden-model methodology from
SURVEY.md §4, as pytest).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests._reference import import_reference, reference_available

from lct_gan_tpu.convert.torch_import import (
    convert_enhancer,
    convert_generator,
)
from lct_gan_tpu.models import (
    GroupedGRU,
    LCTGeneratorConfig,
    LctEnhancer,
    LctGenerator,
    MultiHeadSelfAttention,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

torch.manual_seed(0)


def test_grouped_gru_matches_torch_bidirectional():
    H, G, B, S = 16, 4, 3, 11
    grus = [torch.nn.GRU(H, H, batch_first=True, bidirectional=True)
            for _ in range(G)]
    x = torch.randn(B, S, G * H)

    with torch.no_grad():
        outs = []
        for g, gru in enumerate(grus):
            y, _ = gru(x[..., g * H:(g + 1) * H])
            outs.append(y[..., :H] + y[..., H:])
        ref = torch.cat(outs, dim=-1).numpy()

    sd = {}
    for g, gru in enumerate(grus):
        for k, v in gru.state_dict().items():
            sd[f"gru{g + 1}.{k}"] = v
    from lct_gan_tpu.convert.torch_import import _grouped_gru
    params = _grouped_gru(sd, "", groups=G, bidirectional=True)

    mod = GroupedGRU(groups=G, hidden_size=H, bidirectional=True)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mha_matches_torch():
    E, B, S = 64, 2, 13
    attn = torch.nn.MultiheadAttention(E, 4, batch_first=True)
    x = torch.randn(B, S, E)
    with torch.no_grad():
        ref, _ = attn(x, x, x)
    params = {
        "in_proj_kernel": attn.in_proj_weight.detach().numpy().T,
        "in_proj_bias": attn.in_proj_bias.detach().numpy(),
        "out_proj_kernel": attn.out_proj.weight.detach().numpy().T,
        "out_proj_bias": attn.out_proj.bias.detach().numpy(),
    }
    mod = MultiHeadSelfAttention(embed_dim=E, num_heads=4)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_modules():
    return import_reference()


def test_generator_mask_parity(ref_modules):
    _, ref_gen_mod, _, _ = ref_modules
    cfg_t = ref_gen_mod.LCTGeneratorConfig()
    torch_gen = ref_gen_mod.LCTGenerator(cfg_t).eval()

    B, F, T = 2, 257, 18
    x = torch.rand(B, 1, F, T) * 2.0
    with torch.no_grad():
        ref = torch_gen(x).numpy()

    params = convert_generator(torch_gen.state_dict())
    ours = np.asarray(
        LctGenerator(LCTGeneratorConfig()).apply(
            {"params": params}, jnp.asarray(x.numpy())))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_enhancer_waveform_parity(ref_modules):
    _, ref_gen_mod, _, _ = ref_modules
    cfg_t = ref_gen_mod.LCTGeneratorConfig()
    torch_enh = ref_gen_mod.LCTEnhancer(gen_cfg=cfg_t, c=0.3).eval()

    B, T = 2, 8000
    wave = torch.randn(B, T) * 0.1
    with torch.no_grad():
        ref_wave, ref_mask = torch_enh(wave)

    params = convert_enhancer(torch_enh.state_dict())
    ours_wave, ours_mask = LctEnhancer().apply(
        {"params": params}, jnp.asarray(wave.numpy()))

    assert np.asarray(ours_mask).shape == tuple(ref_mask.shape)
    np.testing.assert_allclose(
        np.asarray(ours_mask), ref_mask.numpy(), rtol=1e-3, atol=2e-4)
    assert np.asarray(ours_wave).shape == tuple(ref_wave.shape)
    np.testing.assert_allclose(
        np.asarray(ours_wave), ref_wave.numpy(), rtol=1e-3, atol=5e-4)


def test_generator_param_count(ref_modules):
    """Generator must have exactly the reference's 135,425 params
    (BASELINE.md)."""
    import jax

    gen = LctGenerator(LCTGeneratorConfig())
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 257, 10)))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree.leaves(variables["params"]))
    assert n == 135425
