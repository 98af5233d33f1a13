"""Banded-causal time attention properties (the honest implementation of
the reference's dead max_time_context flag, SURVEY.md §2.10)."""

import numpy as np

import jax
import jax.numpy as jnp

from lct_gan_tpu.models import MultiHeadSelfAttention, banded_causal_mask


def test_mask_shape_and_band():
    m = np.asarray(banded_causal_mask(6, 2))
    assert m.shape == (6, 6)
    # Row t attends to [t-2, t]
    expected = np.zeros((6, 6), dtype=bool)
    for t in range(6):
        for k in range(max(0, t - 2), t + 1):
            expected[t, k] = True
    np.testing.assert_array_equal(m, expected)


def test_banded_attention_ignores_out_of_window_past():
    """Changing a frame beyond the lookback window must not change the
    output at the query position."""
    E, S, W = 64, 12, 3
    mod = MultiHeadSelfAttention(embed_dim=E, num_heads=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, S, E)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    mask = banded_causal_mask(S, W)

    y1 = mod.apply({"params": params}, x, mask=mask)
    # Perturb frame 0; query at t=8 (0 < 8-3) must be unaffected.
    x2 = x.at[0, 0].add(10.0)
    y2 = mod.apply({"params": params}, x2, mask=mask)
    np.testing.assert_allclose(np.asarray(y1[0, 8]), np.asarray(y2[0, 8]),
                               rtol=1e-5, atol=1e-6)
    # ...but the output at t=0 itself changes.
    assert np.max(np.abs(np.asarray(y1[0, 0] - y2[0, 0]))) > 1e-3


def test_banded_attention_is_causal():
    """Future frames must not influence the present."""
    E, S, W = 64, 10, 4
    mod = MultiHeadSelfAttention(embed_dim=E, num_heads=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, S, E)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    mask = banded_causal_mask(S, W)

    y1 = mod.apply({"params": params}, x, mask=mask)
    x2 = x.at[0, 9].add(5.0)
    y2 = mod.apply({"params": params}, x2, mask=mask)
    np.testing.assert_allclose(np.asarray(y1[0, :9]), np.asarray(y2[0, :9]),
                               rtol=1e-5, atol=1e-6)


def test_generator_accepts_max_time_context():
    from lct_gan_tpu.models import LCTGeneratorConfig, LctGenerator

    cfg = LCTGeneratorConfig(max_time_context=8)
    gen = LctGenerator(cfg)
    x = jnp.zeros((1, 1, 257, 12), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)["params"]
    out = gen.apply({"params": params}, x)
    assert out.shape == (1, 1, 257, 12)
    # Same param tree as the unmasked model -> checkpoints interchangeable.
    cfg2 = LCTGeneratorConfig()
    params2 = LctGenerator(cfg2).init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params) ==
            jax.tree_util.tree_structure(params2))


def test_blocked_banded_matches_masked_path():
    """The O(S*W) blocked-banded path (used when S >= 3W) must equal the
    masked O(S^2) path exactly up to float reassociation, across W
    dividing and not dividing S, and with a key_bias."""
    from lct_gan_tpu.models.attention import _blocked_banded_attention

    E, nh = 64, 4
    mod = MultiHeadSelfAttention(embed_dim=E, num_heads=nh)
    rng = np.random.default_rng(2)
    for S, W, with_bias in ((96, 16, False), (100, 16, True), (37, 5, True),
                            (640, 64, False), (641, 64, True)):
        x = jnp.asarray(rng.standard_normal((2, S, E)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        key_bias = None
        if with_bias:
            kb = np.zeros((2, S), np.float32)
            kb[0, S - 7:] = -1e30  # hide a padded tail on row 0
            key_bias = jnp.asarray(kb)

        # Masked O(S^2) reference: force it by passing the mask explicitly.
        ref = mod.apply({"params": params}, x,
                        mask=banded_causal_mask(S, W), key_bias=key_bias)
        # Blocked path: lookback triggers it (S >= 3W holds for all cases).
        assert S >= 3 * W
        out = mod.apply({"params": params}, x, lookback=W,
                        key_bias=key_bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5,
                                   err_msg=f"S={S} W={W} bias={with_bias}")


def test_blocked_banded_short_seq_uses_masked_path():
    """Below 3W the masked path serves (no benefit from blocking); the
    lookback argument must still produce banded semantics."""
    E, S, W = 64, 20, 8
    mod = MultiHeadSelfAttention(embed_dim=E, num_heads=4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, S, E)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = mod.apply({"params": params}, x, mask=banded_causal_mask(S, W))
    out = mod.apply({"params": params}, x, lookback=W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_blocked_banded_grads_finite_with_padding():
    """S not a multiple of W pads query rows with no valid key; the
    blocked path must keep gradients finite through the discarded rows
    (an all-masked -inf softmax row would poison them with NaN)."""
    from lct_gan_tpu.models.attention import _blocked_banded_attention

    B, nh, S, hd, W = 1, 2, 37, 16, 5  # 37 pads to 40
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((B, nh, S, hd)).astype(np.float32))

    def loss(q):
        out = _blocked_banded_attention(q, q, q, W, None)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


def test_enhancer_banded_blocked_matches_kernel_band_bias():
    """Integration seam: a banded enhancer at frame counts >= 3W runs the
    blocked O(S*W) path on the jnp branch and the block-bias band inside
    the fused kernels -- the two productions must agree within the bf16
    kernel noise band (same band tests/test_pallas_ftf.py pins for full
    attention)."""
    from lct_gan_tpu.models import LCTGeneratorConfig, LctEnhancer
    from lct_gan_tpu.ops.dispatch import pallas_override

    W = 16
    L = int(3.3 * 16000)  # 207 frames >= 3W -> blocked path active
    enhancer = LctEnhancer(
        gen_cfg=LCTGeneratorConfig(max_time_context=W))
    wave = 0.1 * np.asarray(jax.random.normal(
        jax.random.PRNGKey(5), (1, L), jnp.float32))
    params = enhancer.init(jax.random.PRNGKey(0),
                           jnp.asarray(wave))["params"]

    with pallas_override(None):  # jnp branch -> blocked banded
        blocked, _ = jax.jit(enhancer.apply)(
            {"params": params}, jnp.asarray(wave))
    with pallas_override("interpret"):  # fused kernels -> band bias
        kernel, _ = jax.jit(enhancer.apply)(
            {"params": params}, jnp.asarray(wave))
    assert np.abs(np.asarray(blocked) - np.asarray(kernel)).max() < 2e-3
