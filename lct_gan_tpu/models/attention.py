"""Multi-head self-attention, parameter-compatible with
torch.nn.MultiheadAttention (packed in-projection + out-projection).

Used by the FTF bottleneck blocks over the frequency axis
(reference: models/generator.py:78-82, 133-134) and the time axis
(reference: models/generator.py:194-198, 245-246).

Also implements the banded-causal time mask that the reference's
`max_time_context` flag was *meant* to enable but never did
(SURVEY.md §2.10: the scripted ground-truth uses a 64-frame look-back
band `triu(ones,-W) - triu(ones,1)`). Banded attention makes the time
axis linear-cost for long utterances -- the idiomatic TPU answer to
long-context enhancement.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MultiHeadSelfAttention", "banded_causal_mask"]


def banded_causal_mask(length: int, lookback: int) -> jax.Array:
    """Boolean [S, S] mask, True = attend. Position t attends to
    [t - lookback, t] (inclusive)."""
    q = jnp.arange(length)[:, None]
    k = jnp.arange(length)[None, :]
    return (k <= q) & (k >= q - lookback)


def _blocked_banded_attention(q, k, v, lookback: int,
                              key_bias: Optional[jax.Array]) -> jax.Array:
    """Banded-causal attention in O(S * lookback) instead of the masked
    path's O(S^2): queries are tiled into blocks of W = lookback rows;
    block i's key window [iW - W, iW + W) covers every key its rows may
    attend (qpos - kpos in [0, W]), so two key blocks suffice. Exact same
    key set and softmax as banded_causal_mask -- outputs match the masked
    path to float reassociation noise. q/k/v: [B, nh, S, hd];
    key_bias: optional [B, S] additive per-key bias (0/-1e30)."""
    B, nh, S, hd = q.shape
    W = max(int(lookback), 1)
    n = -(-S // W)  # ceil
    Sp = n * W
    pad = Sp - S

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qb = qp.reshape(B, nh, n, W, hd)
    kb = kp.reshape(B, nh, n, W, hd)
    vb = vp.reshape(B, nh, n, W, hd)

    # Key context for block i = [block i-1, block i] (zeros for i = 0;
    # masked below via the global-position validity term).
    def ctx(t):
        prev = jnp.pad(t[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
        return jnp.concatenate([prev, t], axis=3)  # [B, nh, n, 2W, hd]

    kc, vc = ctx(kb), ctx(vb)

    scores = jnp.einsum("bhnqd,bhnkd->bhnqk", qb, kc,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))

    # Local band: query row a (global iW + a) attends local key j (global
    # (i-1)W + j) iff a <= j <= a + W -- i-independent. Global validity:
    # 0 <= kpos < S (kills the i=0 zero block and the tail padding).
    a = jnp.arange(W)[:, None]
    j = jnp.arange(2 * W)[None, :]
    band = (j >= a) & (j <= a + W)  # [W, 2W]
    kpos = (jnp.arange(n)[:, None] - 1) * W + jnp.arange(2 * W)[None, :]
    valid = (kpos >= 0) & (kpos < S)  # [n, 2W]
    # The self key (j == a + W) stays structurally attendable even for the
    # Sp-padding query rows (whose outputs are sliced off below): an
    # all--inf score row softmaxes to NaN, which is harmless forward but
    # poisons gradients through the slice's zero cotangent.
    mask = (band[None, :, :] & valid[:, None, :]) | (j == a + W)[None]
    if key_bias is not None:
        kb_pad = jnp.pad(key_bias, ((0, 0), (0, pad)))
        prev = jnp.pad(kb_pad.reshape(B, n, W)[:, :-1],
                       ((0, 0), (1, 0), (0, 0)))
        bias_ctx = jnp.concatenate(
            [prev, kb_pad.reshape(B, n, W)], axis=2)  # [B, n, 2W]
        scores = scores + bias_ctx[:, None, :, None, :]
    # -inf out-of-band (same fill as the masked path, so even rows whose
    # whole band is key_bias-masked agree: both give uniform-over-band).
    scores = jnp.where(mask[None, None], scores, -jnp.inf)

    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnqk,bhnkd->bhnqd", attn, vc,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, nh, Sp, hd)[:, :, :S]


# Above this sequence length the fused kernel's [R, R] f32 scores scratch
# (R = block_seqs * S) no longer fits comfortably in ~16 MB VMEM
# (S=2048 -> 16 MB for the scratch alone); dispatch to the jnp path, which
# XLA tiles through HBM. Long bucketed utterances (~60 s audio) hit this.
MAX_PALLAS_SEQ = 1024

# Banded-causal calls at/above this length route to the block-skipping
# banded kernel (ops/banded_attention.py -- O(S*W) compute, constant VMEM,
# no upper S cap) instead of the full kernel, which pays O(S^2) scores
# with the band as bias. Threshold from the v5e-1 crossover sweep at the
# production bucket lengths (tools/bench_banded_attention.py, W=64,
# ~250 audio-sec load, 2026-08-19): the full kernel's packed tiling still
# wins at S=513/641 (8.4/8.7 ms vs banded 9.9/9.5), parity at 769
# (9.5 vs 9.3), banded from 897 up (10.5 vs 9.7) and 1.4-1.5x over the
# blocked jnp path beyond the full kernel's S=1024 VMEM cap (13.3-14.9 ->
# 9.3-9.9 ms).
BANDED_KERNEL_MIN_SEQ = 769


def _pallas_mode() -> Optional[str]:
    """Shared dispatch policy -- see lct_gan_tpu/ops/dispatch.py."""
    from lct_gan_tpu.ops.dispatch import pallas_mode

    return pallas_mode()


class MultiHeadSelfAttention(nn.Module):
    """Self-attention matching torch.nn.MultiheadAttention numerics.

    Parameters mirror torch's packed layout (so the PyTorch converter is a
    transpose): `in_proj` kernel [E, 3E], bias [3E]; `out_proj` kernel
    [E, E], bias [E]. Softmax and scaling (1/sqrt(head_dim)) follow torch.

    On TPU backends the forward dispatches to the fused Pallas kernel
    (lct_gan_tpu/ops/attention.py) -- same math, one VMEM-resident pass.
    `use_pallas=None` auto-detects; the jnp path remains the reference
    implementation and serves CPU/GPU. An arbitrary `mask` forces the jnp
    path; `lookback` (banded-causal) is supported by both.
    """

    embed_dim: int = 64
    num_heads: int = 4
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self,
                 x: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 lookback: Optional[int] = None, *,
                 key_bias: Optional[jax.Array] = None,
                 return_params: bool = False):
        """x: [B, S, E]; mask: optional [S, S] bool (True = attend);
        lookback: optional banded-causal window (overrides mask);
        key_bias: optional [B, S] additive score bias per KEY position
        (0/-1e30) hiding zero-padded frames of bucketed batches.
        return_params=True hands the raw param arrays to the caller (for
        the fused FTF-block kernel, ops/ftf.py) without computing."""
        nh = self.num_heads
        E = self.embed_dim
        hd = E // nh

        # torch initializes in_proj with xavier_uniform, out_proj kaiming-ish;
        # xavier is a fine default for both here.
        in_kernel = self.param("in_proj_kernel", nn.initializers.xavier_uniform(),
                               (E, 3 * E))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        out_kernel = self.param("out_proj_kernel",
                                nn.initializers.xavier_uniform(), (E, E))
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (E,))

        if return_params:
            return in_kernel, in_bias, out_kernel, out_bias

        B, S, E = x.shape
        if E != self.embed_dim:
            raise ValueError(f"Expected embed dim {self.embed_dim}, got {E}")

        mode = _pallas_mode()
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = mode is not None
        if (use_pallas and mask is None and lookback is not None
                and S >= BANDED_KERNEL_MIN_SEQ):
            from lct_gan_tpu.ops.banded_attention import banded_mhsa

            return banded_mhsa(x, in_kernel, in_bias, out_kernel, out_bias,
                               num_heads=nh, lookback=lookback,
                               key_bias=key_bias,
                               interpret=(mode == "interpret"))
        if use_pallas and mask is None and S <= MAX_PALLAS_SEQ:
            from lct_gan_tpu.ops.attention import fused_mhsa

            return fused_mhsa(x, in_kernel, in_bias, out_kernel, out_bias,
                              num_heads=nh, lookback=lookback,
                              key_bias=key_bias,
                              interpret=(mode == "interpret"))

        blocked_banded = (mask is None and lookback is not None
                          and S >= 3 * max(lookback, 1))
        if mask is None and lookback is not None and not blocked_banded:
            mask = banded_causal_mask(S, lookback)

        qkv = jnp.einsum("bse,ef->bsf", x, in_kernel,
                         preferred_element_type=jnp.float32) + in_bias
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [B, S, E] -> [B, nh, S, hd]
            return t.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if blocked_banded:
            # O(S * W) two-key-block tiling instead of masked O(S^2) --
            # same key set and softmax, so outputs match the masked path
            # to float reassociation noise (tests/test_attention_banded.py).
            out = _blocked_banded_attention(q, k, v, lookback, key_bias)
            out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
            return jnp.einsum("bse,ef->bsf", out, out_kernel,
                              preferred_element_type=jnp.float32) + out_bias
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
        if key_bias is not None:
            scores = scores + key_bias[:, None, None, :]
        if mask is not None:
            scores = jnp.where(mask[None, None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
        return jnp.einsum("bse,ef->bsf", out, out_kernel,
                          preferred_element_type=jnp.float32) + out_bias
