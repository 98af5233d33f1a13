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


@pytest.mark.parametrize("bidi", [True, False])
def test_fused_ftf_precise_mode_is_tight(bidi):
    """precise=True (all-f32 GEMMs, fwd AND fused bwd) must agree with
    the f32 reference to reduction-order noise -- the band the multichip
    witness (__graft_entry__.py third leg) relies on."""
    p = _make_params(jax.random.PRNGKey(7), bidirectional=bidi, concat=bidi)
    x = jax.random.normal(jax.random.PRNGKey(8), (8, 17, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)

    ref = _run(p, x, False, bidirectional=bidi, num_heads=4)
    out = _run(p, x, True, bidirectional=bidi, num_heads=4,
               block_seqs=8, sub=4, precise=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fused, x, p):
        out = _run(p, x, fused, bidirectional=bidi, num_heads=4,
                   **({"block_seqs": 8, "sub": 4, "precise": True}
                      if fused else {}))
        return jnp.sum(out * w)

    g_ref = jax.grad(loss, argnums=(1, 2))(False, x, p)
    g_fused = jax.grad(loss, argnums=(1, 2))(True, x, p)
    for ref_leaf, fused_leaf in zip(jax.tree.leaves(g_ref),
                                    jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(fused_leaf),
                                   np.asarray(ref_leaf),
                                   rtol=2e-4, atol=2e-5)


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


def _reference_hidden(x, p, bidi, G=4):
    """Per-direction GRU hidden states, exactly as the f32 reference
    computes them (the backward kernel's `hid` input)."""
    from lct_gan_tpu.ops.ftf import _layer_norm
    n1 = _layer_norm(x, p["ln1_scale"], p["ln1_bias"])
    N, L, C = n1.shape
    H = C // G
    D = 2 if bidi else 1
    xg = n1.reshape(N, L, G, H).transpose(1, 0, 2, 3)
    h0 = jnp.zeros((N, G, H), jnp.float32)
    outs = []
    for d in range(D):
        xp = jnp.einsum("sbgi,gio->sbgo", xg, p["w_ih"][d]) + p["b_ih"][d]

        def step(h, xpt, d=d):
            hp = jnp.einsum("bgh,gho->bgo", h, p["w_hh"][d]) + p["b_hh"][d]
            r = jax.nn.sigmoid(xpt[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xpt[..., H:2 * H] + hp[..., H:2 * H])
            n = jnp.tanh(xpt[..., 2 * H:] + r * hp[..., 2 * H:])
            hn = (1.0 - z) * n + z * h
            return hn, hn

        _, ys = jax.lax.scan(step, h0, xp, reverse=(d == 1))
        outs.append(ys.transpose(1, 0, 2, 3).reshape(N, L, C))
    return jnp.concatenate(outs, -1)


@pytest.mark.parametrize("bidi,lookback", [
    (True, None), (False, None), (False, 5),
])
def test_ftf_bwd_kernel_structurally_exact(bidi, lookback):
    """The fused backward kernel (ops/ftf_bwd.py) run in `precise` mode on
    the EXACT reference hidden states must reproduce jax.vjp through the
    f32 reference for x and every parameter -- this proves the backward
    wiring (gate VJP, BPTT chain, softmax VJP, LN backward, all the
    hoisted weight-grad GEMMs, cross-tile accumulation) with no
    reduced-precision noise in the comparison."""
    from lct_gan_tpu.ops.ftf_bwd import fused_ftf_bwd

    p = _make_params(jax.random.PRNGKey(4), bidirectional=bidi, concat=bidi)
    x = jax.random.normal(jax.random.PRNGKey(5), (6, 9, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), x.shape, jnp.float32)
    args = (x, p["ln1_scale"], p["ln1_bias"], p["w_ih"], p["w_hh"],
            p["b_ih"], p["b_hh"], p["ln2_scale"], p["ln2_bias"],
            p["in_w"], p["in_b"], p["out_w"], p["out_b"],
            p["lin_w"], p["lin_b"])
    _, vjp = jax.vjp(lambda *a: ftf_block_reference(
        *a, bidirectional=bidi, num_heads=4, lookback=lookback), *args)
    ref_grads = vjp(w)

    hid = _reference_hidden(x, p, bidi)
    grads = fused_ftf_bwd(*args, hid, w, bidirectional=bidi, num_heads=4,
                          lookback=lookback, block_seqs=4, sub=2,
                          interpret=True, precise=True)
    assert len(grads) == len(ref_grads)
    for got, want in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bidi", [True, False])
def test_fused_ftf_grad_parity(bidi):
    """End-to-end custom VJP (fused Pallas backward fed by the fused
    forward's saved hiddens) vs direct autodiff through the f32 reference.
    The comparison tolerance is a NOISE BAND, not exactness: the fused
    forward's bf16 recurrence GEMMs perturb the hidden states, and the
    backward is intentionally consistent with the kernel's own forward
    (see test_ftf_bwd_kernel_structurally_exact for the exact-wiring
    gate). Guards against sign flips, dropped terms, and mis-scaled
    gradients, which all produce O(1) relative error."""
    p = _make_params(jax.random.PRNGKey(4), bidirectional=bidi, concat=bidi)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 9, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), x.shape, jnp.float32)

    def loss(fused, x, p):
        out = _run(p, x, fused, bidirectional=bidi, num_heads=4,
                   **({"block_seqs": 4, "sub": 2} if fused else {}))
        return jnp.sum(out * w)

    g_ref = jax.grad(loss, argnums=(1, 2))(False, x, p)
    g_fused = jax.grad(loss, argnums=(1, 2))(True, x, p)
    for ref_leaf, fused_leaf in zip(jax.tree.leaves(g_ref),
                                    jax.tree.leaves(g_fused)):
        a, b = np.asarray(fused_leaf), np.asarray(ref_leaf)
        scale = np.max(np.abs(b)) + 1e-6
        assert np.max(np.abs(a - b)) / scale < 0.2, (a, b)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.995


@pytest.mark.parametrize("T,expect_path", [
    (520, "composed"),   # MAX_FTF_SEQ < T <= MAX_PALLAS_SEQ: jnp GRU +
                         # fused attention kernel
    (1100, "jnp"),       # T > MAX_PALLAS_SEQ: pure jnp fallback
])
def test_generator_dispatch_at_boundary_lengths(T, expect_path, monkeypatch):
    """Long bucketed val/infer utterances route the TIME block through
    three different code paths depending on frame count (ops/ftf.py
    MAX_FTF_SEQ=512, models/attention.py MAX_PALLAS_SEQ=1024). A full
    generator forward at each boundary must agree with the LCT_NO_PALLAS
    jnp reference -- this pins the composed-kernel fallback and the pure
    jnp fallback, which no training-shape test reaches (round-2 verdict
    weak #5). F is reduced to keep interpret-mode cost bounded; the
    dispatch decision depends only on sequence length."""
    from lct_gan_tpu.models.attention import MAX_PALLAS_SEQ
    from lct_gan_tpu.models.generator import (
        LctGenerator,
        LCTGeneratorConfig,
    )
    from lct_gan_tpu.ops.ftf import MAX_FTF_SEQ

    assert MAX_FTF_SEQ < 520 <= MAX_PALLAS_SEQ < 1100  # test premise

    gen = LctGenerator(LCTGeneratorConfig())
    rng = np.random.default_rng(T)
    mag = jnp.asarray(
        np.abs(rng.standard_normal((1, 1, 65, T))).astype(np.float32))

    monkeypatch.setenv("LCT_NO_PALLAS", "1")
    params = gen.init(jax.random.PRNGKey(0), mag)["params"]
    ref = jax.jit(lambda p, x: gen.apply({"params": p}, x))(params, mag)

    monkeypatch.delenv("LCT_NO_PALLAS")
    monkeypatch.setenv("LCT_PALLAS_INTERPRET", "1")
    out = jax.jit(lambda p, x: gen.apply({"params": p}, x))(params, mag)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=2e-2)
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.999


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


def test_inference_tile_halving_when_divisor(monkeypatch):
    """Inference (no save_hidden) halves an auto-picked tile when that
    removes the whole-array N-pad (ops/ftf.py divisor adaptation; the
    bench shapes hit N = B*(T+3) freq sequences, which the swept 256
    tile does not divide). Output must be identical either way."""
    import lct_gan_tpu.ops.ftf as ftf_mod

    p = _make_params(jax.random.PRNGKey(7), bidirectional=True, concat=True)
    # N = 24: auto tile would clamp to 24; force an auto pick of 16 so
    # 24 % 16 != 0 while 8 divides -> halving branch fires.
    monkeypatch.setattr(ftf_mod, "pick_ftf_tile",
                        lambda length, save_hidden=False: (16, 4))
    x = jax.random.normal(jax.random.PRNGKey(8), (24, 17, 64), jnp.float32)
    out = _run(p, x, True, bidirectional=True, num_heads=4)
    ref = _run(p, x, False, bidirectional=True, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
