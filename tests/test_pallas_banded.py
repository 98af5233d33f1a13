"""Block-skipping banded-attention Pallas kernel correctness
(lct_gan_tpu/ops/banded_attention.py) vs the jnp reference paths,
in interpret mode on CPU.

The kernel serves banded-causal time attention (max_time_context,
reference models/generator.py:194-198) on the composed path -- any S,
O(S*W) compute -- so these tests pin: numerical parity with the masked
reference, the linear-cost VJP, ragged-S/left-edge handling, key_bias
masking, and the MultiHeadSelfAttention dispatch seam.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lct_gan_tpu.models import MultiHeadSelfAttention, banded_causal_mask
from lct_gan_tpu.ops.attention import mhsa_reference
from lct_gan_tpu.ops.banded_attention import (
    banded_mhsa,
    banded_mhsa_reference,
    pick_block_rows,
)


def _params(seed=0, E=64):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((E, 3 * E)).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((3 * E,)).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((E, E)).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((E,)).astype(np.float32) * 0.1))


def _x(B, S, E=64, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, S, E)).astype(np.float32))


@pytest.mark.parametrize("B,S,W,with_bias", [
    (2, 200, 64, False),   # ragged S (200 -> 4 tiles of 64), left edge
    (2, 200, 64, True),    # + key_bias tail masking
    (1, 256, 64, False),   # exact multiple of the tile
    (1, 641, 64, True),    # the production long-bucket shape, ragged
    (2, 200, 32, False),   # W below the 64-row tile floor
    (1, 130, 100, True),   # W > 64 (tile rounds up to 104), S barely > W
])
def test_banded_kernel_matches_reference(B, S, W, with_bias):
    iw, ib, ow, ob = _params()
    x = _x(B, S)
    key_bias = None
    if with_bias:
        kb = np.zeros((B, S), np.float32)
        kb[0, S - 9:] = -1e30  # hide a padded tail on row 0
        key_bias = jnp.asarray(kb)

    ref = mhsa_reference(x, iw, ib, ow, ob, num_heads=4, lookback=W,
                         key_bias=key_bias)
    out = banded_mhsa(x, iw, ib, ow, ob, num_heads=4, lookback=W,
                      key_bias=key_bias, interpret=True)
    assert out.shape == ref.shape
    # bf16 matmuls inside the kernel -> same tolerance band as the fused
    # attention kernel tests (tests/test_pallas_attention.py).
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.9999


def test_banded_reference_matches_masked_exactly():
    """The O(S*W) jnp recompute the VJP differentiates through must equal
    the masked O(S^2) reference to float reassociation noise (it IS the
    blocked formulation already pinned by test_attention_banded)."""
    iw, ib, ow, ob = _params(2)
    for S, W in ((200, 64), (641, 64), (96, 16)):
        x = _x(1, S, seed=S)
        ref = mhsa_reference(x, iw, ib, ow, ob, num_heads=4, lookback=W)
        blk = banded_mhsa_reference(x, iw, ib, ow, ob, num_heads=4,
                                    lookback=W)
        np.testing.assert_allclose(np.asarray(blk), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5)


def test_banded_kernel_grads_match_reference():
    """Custom VJP (recompute through the blocked path) vs autodiff of the
    masked reference. The cotangent fed in differs by the kernel's bf16
    forward noise, so compare in that band."""
    iw, ib, ow, ob = _params(3)
    B, S, W = 1, 200, 64
    x = _x(B, S, seed=7)
    kb = np.zeros((B, S), np.float32)
    kb[:, -9:] = -1e30
    kb = jnp.asarray(kb)

    def loss_kernel(x, iw, ib, ow, ob):
        out = banded_mhsa(x, iw, ib, ow, ob, num_heads=4, lookback=W,
                          key_bias=kb, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(x, iw, ib, ow, ob):
        out = mhsa_reference(x, iw, ib, ow, ob, num_heads=4, lookback=W,
                             key_bias=kb)
        return jnp.sum(out ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(x, iw, ib, ow, ob)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, iw, ib, ow, ob)
    for a, b in zip(gk, gr):
        assert np.isfinite(np.asarray(a)).all()
        denom = np.abs(np.asarray(b)).max() + 1e-9
        assert np.abs(np.asarray(a - b)).max() / denom < 2e-2


def test_banded_kernel_grads_finite_with_ragged_tail():
    """S not a multiple of the tile pads query rows whose whole band is
    masked; gradients through the sliced-off rows must stay finite."""
    iw, ib, ow, ob = _params(4)
    x = _x(1, 137, seed=9)  # 137 -> 3 tiles of 64, 55 pad rows

    def loss(x):
        out = banded_mhsa(x, iw, ib, ow, ob, num_heads=4, lookback=64,
                          interpret=True)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_pick_block_rows():
    # No length -> largest efficient tile.
    assert pick_block_rows(64) == 128
    assert pick_block_rows(1) == 128
    assert pick_block_rows(200) == 200  # W > 128 forces the tile up
    # Padding-minimizing picks at the production bucket lengths (matches
    # the measured-fastest tile, tools/bench_banded_attention.py).
    assert pick_block_rows(64, 513) == 104   # 520 rows, not 640
    assert pick_block_rows(64, 641) == 112   # 672 rows
    assert pick_block_rows(64, 1025) == 104  # 1040 rows, not 1152
    assert pick_block_rows(64, 2048) == 128  # exact multiple -> no pad
    # Tile never drops below the band (two key tiles must cover W).
    assert pick_block_rows(120, 513) >= 120


def test_module_dispatch_routes_banded_kernel():
    """With the production Pallas dispatch on, a banded module call at
    S >= BANDED_KERNEL_MIN_SEQ must take the block-skipping kernel and
    agree with the jnp path; below the threshold the fused full kernel
    still serves banded mode."""
    from lct_gan_tpu.models.attention import BANDED_KERNEL_MIN_SEQ
    from lct_gan_tpu.ops.dispatch import pallas_override

    E, W = 64, 64
    mod = MultiHeadSelfAttention(embed_dim=E, num_heads=4)
    S = max(200, BANDED_KERNEL_MIN_SEQ)
    x = _x(1, S, seed=11)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    with pallas_override(None):
        ref = mod.apply({"params": params}, x, lookback=W)
    with pallas_override("interpret"):
        out = mod.apply({"params": params}, x, lookback=W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_enhancer_composed_path_uses_banded_kernel():
    """Integration seam: a banded enhancer ABOVE the fused-FTF block's
    length cap (L > 512 frames) composes LN/GRU/attention -- at
    S >= BANDED_KERNEL_MIN_SEQ its time attention runs the banded kernel.
    jnp production vs interpret production must agree within the bf16
    kernel noise band."""
    from lct_gan_tpu.models import LCTGeneratorConfig, LctEnhancer
    from lct_gan_tpu.models.attention import BANDED_KERNEL_MIN_SEQ
    from lct_gan_tpu.ops.dispatch import pallas_override

    W = 64
    # 782 frames: above both MAX_FTF_SEQ=512 (composed path) and the
    # banded-kernel dispatch threshold.
    L = int(12.5 * 16000)
    assert L // 256 + 1 >= BANDED_KERNEL_MIN_SEQ
    enhancer = LctEnhancer(gen_cfg=LCTGeneratorConfig(max_time_context=W))
    wave = 0.1 * np.asarray(jax.random.normal(
        jax.random.PRNGKey(5), (1, L), jnp.float32))
    params = enhancer.init(jax.random.PRNGKey(0),
                           jnp.asarray(wave))["params"]

    with pallas_override(None):
        blocked, _ = jax.jit(enhancer.apply)(
            {"params": params}, jnp.asarray(wave))
    with pallas_override("interpret"):
        kernel, _ = jax.jit(enhancer.apply)(
            {"params": params}, jnp.asarray(wave))
    assert np.abs(np.asarray(blocked) - np.asarray(kernel)).max() < 2e-3
