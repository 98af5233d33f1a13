"""Fused FTF-block kernel (ops/ftf.py) correctness vs the composed jnp
path, in interpret mode on CPU: forward parity for both block variants,
banded-causal mask, no cross-sequence leak, gradient parity through the
custom VJP, and the production dispatch inside the generator blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lct_gan_tpu.models.generator import FreqGRUBlock, TimeGRUBlock
from lct_gan_tpu.ops.ftf import ftf_block_reference, fused_ftf_block


def _make_params(key, C=64, bidirectional=True, concat=True, G=4):
    """Random params in the kernel's layouts."""
    ks = jax.random.split(key, 8)
    D = 2 if bidirectional else 1
    H = C // G
    u = lambda k, s, b=0.25: jax.random.uniform(k, s, jnp.float32, -b, b)
    return dict(
        ln1_scale=1.0 + 0.1 * u(ks[0], (C,)),
        ln1_bias=0.1 * u(ks[0], (C,)),
        w_ih=u(ks[1], (D, G, H, 3 * H)),
        w_hh=u(ks[2], (D, G, H, 3 * H)),
        b_ih=u(ks[3], (D, G, 3 * H)),
        b_hh=u(ks[3], (D, G, 3 * H)),
        ln2_scale=1.0 + 0.1 * u(ks[4], (C,)),
        ln2_bias=0.1 * u(ks[4], (C,)),
        in_w=u(ks[5], (C, 3 * C)),
        in_b=0.1 * u(ks[5], (3 * C,)),
        out_w=u(ks[6], (C, C)),
        out_b=0.1 * u(ks[6], (C,)),
        lin_w=u(ks[7], ((2 * C if concat else C), C)),
        lin_b=0.1 * u(ks[7], (C,)),
    )


def _run(p, x, fused, **kw):
    args = (x, p["ln1_scale"], p["ln1_bias"], p["w_ih"], p["w_hh"],
            p["b_ih"], p["b_hh"], p["ln2_scale"], p["ln2_bias"],
            p["in_w"], p["in_b"], p["out_w"], p["out_b"],
            p["lin_w"], p["lin_b"])
    if fused:
        return fused_ftf_block(*args, interpret=True, **kw)
    return ftf_block_reference(*args, **kw)


@pytest.mark.parametrize("N,L,bidi,lookback", [
    (12, 17, True, None),    # freq-style: bidirectional + concat
    (5, 17, True, None),     # padding path (N % block_seqs != 0)
    (6, 40, False, None),    # time-style: unidirectional, attn-only lin
    (6, 40, False, 7),       # banded-causal time mask
])
def test_fused_ftf_matches_reference(N, L, bidi, lookback):
    p = _make_params(jax.random.PRNGKey(0), bidirectional=bidi, concat=bidi)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, L, 64), jnp.float32)
    ref = _run(p, x, False, bidirectional=bidi, num_heads=4,
               lookback=lookback)
    out = _run(p, x, True, bidirectional=bidi, num_heads=4,
               lookback=lookback, block_seqs=8, sub=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.9995


def test_fused_ftf_no_cross_sequence_leak():
    p = _make_params(jax.random.PRNGKey(2))
    N, L = 9, 12
    x = jax.random.normal(jax.random.PRNGKey(3), (N, L, 64), jnp.float32)
    out1 = _run(p, x, True, bidirectional=True, num_heads=4,
                block_seqs=4, sub=2)
    out2 = _run(p, x.at[0].add(2.0), True, bidirectional=True, num_heads=4,
                block_seqs=4, sub=2)
    np.testing.assert_array_equal(np.asarray(out1[1:]), np.asarray(out2[1:]))
    assert np.max(np.abs(np.asarray(out1[0] - out2[0]))) > 1e-3


@pytest.mark.parametrize("bidi", [True, False])
def test_fused_ftf_grad_parity(bidi):
    """Custom VJP (backward = jnp reference recompute) must match direct
    autodiff through the reference for x AND every parameter."""
    p = _make_params(jax.random.PRNGKey(4), bidirectional=bidi, concat=bidi)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 9, 64), jnp.float32)
    # Linear loss -> the cotangent entering the VJP is the same constant
    # on both paths, so this isolates the custom-VJP wiring itself (the
    # backward recompute runs the f32 reference in both cases) and the
    # comparison can be tight.
    w = jax.random.normal(jax.random.PRNGKey(6), x.shape, jnp.float32)

    def loss(fused, x, p):
        out = _run(p, x, fused, bidirectional=bidi, num_heads=4,
                   **({"block_seqs": 4, "sub": 2} if fused else {}))
        return jnp.sum(out * w)

    g_ref = jax.grad(loss, argnums=(1, 2))(False, x, p)
    g_fused = jax.grad(loss, argnums=(1, 2))(True, x, p)
    for ref_leaf, fused_leaf in zip(jax.tree.leaves(g_ref),
                                    jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(fused_leaf),
                                   np.asarray(ref_leaf),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("block_cls,kw", [
    (FreqGRUBlock, {}),
    (TimeGRUBlock, {}),
    (TimeGRUBlock, {"max_time_context": 5}),
])
def test_block_dispatch_matches_jnp_path(block_cls, kw, monkeypatch):
    """The generator blocks must produce the same output (and identical
    param trees) whether the fused kernel dispatch is on or off."""
    block = block_cls(channels=64, num_heads=4, groups=4, **kw)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 6, 10, 64), jnp.float32)

    monkeypatch.setenv("LCT_NO_PALLAS", "1")
    params = block.init(jax.random.PRNGKey(7), x)["params"]
    ref = block.apply({"params": params}, x)

    monkeypatch.delenv("LCT_NO_PALLAS")
    monkeypatch.setenv("LCT_PALLAS_INTERPRET", "1")
    params2 = block.init(jax.random.PRNGKey(7), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = block.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
