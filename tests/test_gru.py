"""Grouped-GRU numerics: dense gate-major weight packing (consumed by the
fused FTF kernel, ops/ftf.py) and torch.nn.GRU parity of the reference
scan formulation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lct_gan_tpu.models import GroupedGRU
from lct_gan_tpu.ops.gru import (
    grouped_gru_reference,
    pack_dense_gru_weights,
    pack_gate_major_bias,
)


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


def test_dense_packing_reproduces_grouped_math():
    """x @ dense(w_ih) with gate-major bias == the grouped einsum + gate
    slicing the FTF kernel relies on."""
    rng = np.random.default_rng(1)
    G, H, N = 4, 16, 10
    C = G * H
    w = jnp.asarray(rng.standard_normal((G, H, 3 * H)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((G, 3 * H)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))

    dense = pack_dense_gru_weights(w)
    bg = pack_gate_major_bias(b)
    out = np.asarray(x @ dense + bg)  # [N, 3C] gate-major

    xg = np.asarray(x).reshape(N, G, H)
    grouped = np.einsum("ngi,gio->ngo", xg, np.asarray(w)) + np.asarray(b)
    for gate in range(3):
        gate_cols = grouped[..., gate * H:(gate + 1) * H].reshape(N, C)
        np.testing.assert_allclose(out[:, gate * C:(gate + 1) * C],
                                   gate_cols, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_reference_matches_module(bidirectional):
    mod = GroupedGRU(bidirectional=bidirectional)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 20, 64), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = mod.apply({"params": params}, x)
    out = grouped_gru_reference(
        x, params["w_ih"], params["w_hh"], params["b_ih"], params["b_hh"],
        bidirectional=bidirectional)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_reference_matches_torch():
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
    out = grouped_gru_reference(
        jnp.asarray(x.numpy()), jnp.asarray(p["w_ih"]),
        jnp.asarray(p["w_hh"]), jnp.asarray(p["b_ih"]),
        jnp.asarray(p["b_hh"]), bidirectional=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
