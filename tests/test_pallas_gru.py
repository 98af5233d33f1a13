"""Pallas fused grouped-GRU kernel correctness vs the lax.scan reference
path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lct_gan_tpu.models import GroupedGRU
from lct_gan_tpu.ops.gru import fused_grouped_gru, pack_dense_gru_weights


def test_pack_dense_weights_structure():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 16, 48)).astype(np.float32))
    dense = np.asarray(pack_dense_gru_weights(w))
    assert dense.shape == (64, 192)
    # Block for group 1, gate z (columns 64..128 are z, group 1 at 80..96)
    np.testing.assert_array_equal(dense[16:32, 80:96],
                                  np.asarray(w)[1, :, 16:32])
    # Off-diagonal zero
    assert np.all(dense[0:16, 80:96] == 0)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("N,L", [(12, 33), (5, 20)])
def test_fused_gru_matches_reference(bidirectional, N, L):
    mod = GroupedGRU(bidirectional=bidirectional, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, L, 64), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    ref = mod.apply({"params": params}, x)
    out = fused_grouped_gru(
        x, params["w_ih"], params["w_hh"], params["b_ih"], params["b_hh"],
        bidirectional=bidirectional, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.9999


def test_fused_gru_matches_torch():
    """End-to-end against torch.nn.GRU with converted weights."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    G, H, B, S = 4, 16, 6, 21
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

    p = _grouped_gru(sd, "", groups=G, bidirectional=True)
    out = fused_grouped_gru(
        jnp.asarray(x.numpy()), jnp.asarray(p["w_ih"]),
        jnp.asarray(p["w_hh"]), jnp.asarray(p["b_ih"]),
        jnp.asarray(p["b_hh"]), bidirectional=True, block_b=8,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)
