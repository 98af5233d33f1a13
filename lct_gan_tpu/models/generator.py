"""LCT generator ("FTFNet"): U-Net encoder/decoder over (time, freq) with a
grouped-GRU + self-attention FTF bottleneck, predicting a compressed TF mask.

Behavioral contract is the reference's models/generator.py (LCTGeneratorConfig
generator.py:19, GRUblockf :31, GRUblockt :148, LCTGenerator :440,
LCTEnhancer :635). Parameter trees are designed so a converter can map the
PyTorch state_dict 1:1 (see lct_gan_tpu/convert/torch_import.py).

TPU-first design decisions (not a transliteration):
  * NHWC ([B, T, F, C]) data layout throughout -- native for TPU convs and
    makes the per-channel LayerNorms/attention contiguous on the lane axis.
  * The 4 per-group GRUs per block run as ONE lax.scan with stacked [G, ...]
    params and a hoisted full-sequence input projection (models/gru.py).
  * All control flow is static; crop/pad arithmetic happens at trace time.
  * Optional banded-causal time attention (`max_time_context`) implements
    what the reference's dead flag was meant to do (SURVEY.md §2.10),
    making time-attention cost linear in utterance length.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lct_gan_tpu.models.attention import MultiHeadSelfAttention
from lct_gan_tpu.models.gru import GroupedGRU
from lct_gan_tpu.models.layers import Dense, LayerNorm
from lct_gan_tpu.sigproc import (
    STFTConfig,
    apply_mask,
    istft,
    magnitude,
    stft,
)

__all__ = [
    "LCTGeneratorConfig",
    "FreqGRUBlock",
    "TimeGRUBlock",
    "LctGenerator",
    "LctEnhancer",
]


@dataclasses.dataclass(frozen=True)
class LCTGeneratorConfig:
    """Mirrors reference models/generator.py:19-28.

    Unlike the reference -- where num_heads/gru_groups/max_time_context are
    dead flags (SURVEY.md §2.4) -- these are honored here. Defaults preserve
    reference behavior (max_time_context=None -> full unmasked attention).
    """

    in_channels: int = 1
    out_channels: int = 1
    enc_channels: Tuple[int, int, int] = (16, 32, 64)
    dec_channels: Tuple[int, int, int] = (64, 32, 16)
    num_heads: int = 4
    gru_groups: int = 4
    max_time_context: Optional[int] = None
    output_activation: str = "sigmoid"


def _leaky(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=0.2)


def _fused_ftf_dispatch(seq: jax.Array, ln1, gru, ln2, attn, lin, *,
                        bidirectional: bool, num_heads: int,
                        lookback: Optional[int],
                        key_bias: Optional[jax.Array] = None):
    """Route a whole FTF block through the fused Pallas kernel
    (lct_gan_tpu/ops/ftf.py) when the dispatch policy allows; returns None
    to take the composed jnp path. Collecting params via return_params
    keeps the parameter tree identical on both paths."""
    from lct_gan_tpu.ops.dispatch import ftf_precise, pallas_mode
    from lct_gan_tpu.ops.ftf import MAX_FTF_SEQ, fused_ftf_block

    mode = pallas_mode()
    N, L, C = seq.shape
    if mode is None or L > MAX_FTF_SEQ:
        return None
    # Testing mode: all-f32 kernel GEMMs (fwd + fused bwd) so witnesses
    # can assert tight numerical bands (see __graft_entry__.py).
    precise = ftf_precise()

    ln1_s, ln1_b = ln1(seq, return_params=True)
    w_ih, w_hh, b_ih, b_hh = gru(return_params=True)
    ln2_s, ln2_b = ln2(seq, return_params=True)
    in_w, in_b, out_w, out_b = attn(return_params=True)
    lin_in = 2 * C if bidirectional else C  # freq concats (gru, attn)
    lin_w, lin_b = lin(jnp.zeros((1, lin_in), seq.dtype), return_params=True)

    return fused_ftf_block(
        seq, ln1_s, ln1_b, w_ih, w_hh, b_ih, b_hh, ln2_s, ln2_b,
        in_w, in_b, out_w, out_b, lin_w, lin_b,
        bidirectional=bidirectional, num_heads=num_heads, lookback=lookback,
        key_bias=key_bias, interpret=(mode == "interpret"), precise=precise)


class TorchConvTranspose(nn.Module):
    """ConvTranspose with torch.nn.ConvTranspose2d geometry.

    Equivalent to conv_general_dilated with lhs_dilation=stride and padding
    (k-1-p, k-1-p+output_padding); the kernel is stored pre-flipped in HWIO
    so the forward pass is a single XLA conv.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    output_padding: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=-2, out_axis=-1),
            (kh, kw, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pads = tuple(
            (k - 1 - p, k - 1 - p + op)
            for k, p, op in zip(self.kernel_size, self.padding,
                                self.output_padding))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class FreqGRUBlock(nn.Module):
    """Frequency transformer block (reference GRUblockf, generator.py:31-145).

    Per time frame: pre-LN -> grouped bidirectional GRU over frequency
    (fwd+bwd summed) with residual; pre-LN -> self-attention over frequency;
    concat(gru, attn) -> Linear(2C -> C) -> LeakyReLU -> residual.

    Input/output: [B, T, F, C].
    """

    channels: int = 64
    num_heads: int = 4
    groups: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, F, C = x.shape
        ln1 = LayerNorm(name="layernorm1")
        gru = GroupedGRU(groups=self.groups, hidden_size=C // self.groups,
                         bidirectional=True, name="gru")
        ln2 = LayerNorm(name="layernorm2")
        attn = MultiHeadSelfAttention(embed_dim=C, num_heads=self.num_heads,
                                      name="attn")
        lin = Dense(C, name="lin")

        seq = x.reshape(B * T, F, C)

        fused = _fused_ftf_dispatch(
            seq, ln1, gru, ln2, attn, lin, bidirectional=True,
            num_heads=self.num_heads, lookback=None)
        if fused is not None:
            return fused.reshape(B, T, F, C)

        seq_norm = ln1(seq)
        seq_gru = gru(seq_norm)
        seq = seq + seq_gru

        seq_norm2 = ln2(seq)
        attn_out = attn(seq_norm2)

        combined = jnp.concatenate([seq_gru, attn_out], axis=-1)
        combined = lin(combined)
        combined = _leaky(combined)
        seq = seq + combined
        return seq.reshape(B, T, F, C)


class TimeGRUBlock(nn.Module):
    """Time transformer block (reference GRUblockt, generator.py:148-255).

    Per frequency bin: pre-LN -> grouped unidirectional (causal) GRU over
    time with residual; pre-LN -> self-attention over time (optionally
    banded-causal); Linear(C -> C) on the attention output -> LeakyReLU ->
    residual.

    Input/output: [B, T, F, C].
    """

    channels: int = 64
    num_heads: int = 4
    groups: int = 4
    max_time_context: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 frames_valid: Optional[jax.Array] = None) -> jax.Array:
        """frames_valid: optional [B] int count of valid time frames per
        batch row. When given, zero-padded frames of bucketed batches are
        hidden from the time attention's keys EXCEPT the 3 trailing
        receptive-field frames (see LctGenerator), whose padded-input
        contents differ from the exact-length run's. Those keys serve
        every query, so bucketed outputs diverge from exact-length
        inference GLOBALLY but weighted by their softmax mass: measured
        <= ~1e-5 for >= 2 s utterances, up to ~5e-3 below 2 s
        (docs/BUCKETED_VS_EXACT.md). The reference has no equivalent --
        its batched inference lets valid frames attend to raw padding
        (reference generator.py:245-246 over the zero-padded batch of
        infer.py), diverging strictly more."""
        B, T, F, C = x.shape
        ln1 = LayerNorm(name="layernorm1")
        gru = GroupedGRU(groups=self.groups, hidden_size=C // self.groups,
                         bidirectional=False, name="gru")
        ln2 = LayerNorm(name="layernorm2")
        attn = MultiHeadSelfAttention(embed_dim=C, num_heads=self.num_heads,
                                      name="attn")
        lin = Dense(C, name="lin")

        seq = x.transpose(0, 2, 1, 3).reshape(B * F, T, C)

        key_bias = None
        if frames_valid is not None:
            kb = jnp.where(
                jnp.arange(T)[None, :] < frames_valid[:, None], 0.0, -1e30)
            # Row layout is b*F + f: repeat each batch row F times.
            key_bias = jnp.repeat(kb.astype(jnp.float32), F, axis=0)

        fused = _fused_ftf_dispatch(
            seq, ln1, gru, ln2, attn, lin, bidirectional=False,
            num_heads=self.num_heads, lookback=self.max_time_context,
            key_bias=key_bias)
        if fused is not None:
            return fused.reshape(B, F, T, C).transpose(0, 2, 1, 3)

        seq_norm = ln1(seq)
        seq_gru = gru(seq_norm)
        seq = seq + seq_gru

        seq_norm2 = ln2(seq)
        attn_out = attn(seq_norm2, lookback=self.max_time_context,
                        key_bias=key_bias)

        combined = lin(attn_out)
        combined = _leaky(combined)
        seq = seq + combined
        return seq.reshape(B, F, T, C).transpose(0, 2, 1, 3)


def _align(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Crop two NHWC feature maps to the same (T, F)
    (reference generator.py:538-548)."""
    Tm = min(a.shape[1], b.shape[1])
    Fm = min(a.shape[2], b.shape[2])
    return a[:, :Tm, :Fm], b[:, :Tm, :Fm]


class LctGenerator(nn.Module):
    """FTFNet-style TF mask generator (reference LCTGenerator,
    generator.py:440-632).

    Input:  noisy_mag [B, 1, F, T] (reference layout)
    Output: mask_c    [B, 1, F, T] in [0, 1] if output_activation='sigmoid'.
    """

    cfg: LCTGeneratorConfig = LCTGeneratorConfig()

    @nn.compact
    def __call__(self, noisy_mag: jax.Array,
                 frames_valid: Optional[jax.Array] = None) -> jax.Array:
        # frames_valid [B]: valid INPUT frame count per row (bucketed
        # batches). Threaded to the time block's attention key mask. The
        # encoder convs are stride-1 in time and each level grows T by one
        # frame (kernel 2, pad (1,1)), so the last valid input frame's
        # receptive field extends to bottleneck frame frames_valid+3-1:
        # those trailing bottleneck frames carry real content and are what
        # exact-length inference attends to. Mask keys at frames_valid +
        # n_levels so bucketed rows track the exact-length run.
        cfg = self.cfg
        if noisy_mag.ndim != 4 or noisy_mag.shape[1] != 1:
            raise ValueError(
                f"Expected noisy_mag [B, 1, F, T], got {noisy_mag.shape}")
        e1, e2, e3 = cfg.enc_channels
        out_ch = cfg.out_channels

        # [B, 1, F, T] -> NHWC [B, T, F, 1]
        x = noisy_mag.transpose(0, 3, 2, 1)
        B, T_in, F_in, _ = x.shape

        # Global 1x1 skips from raw magnitude (generator.py:484-498, 565-567)
        skip2 = nn.Conv(e3, (1, 1), name="skip2")(x)
        skip3 = nn.Conv(e2, (1, 1), name="skip3")(x)
        skip4 = nn.Conv(e1, (1, 1), name="skip4")(x)

        # Encoder: kernel (2,3) over (T,F), stride (1,2), padding (1,1)
        conv_kw = dict(kernel_size=(2, 3), strides=(1, 2),
                       padding=((1, 1), (1, 1)))
        x1 = _leaky(nn.Conv(e1, name="conv1", **conv_kw)(x))
        x2 = _leaky(nn.Conv(e2, name="conv2", **conv_kw)(x1))
        x3 = _leaky(nn.Conv(e3, name="conv3", **conv_kw)(x2))

        # Bottleneck LayerNorm over channels (generator.py:574-578)
        x3 = nn.LayerNorm(name="layernorm")(x3)

        # FTF bottleneck: F -> T -> F (generator.py:581-583)
        h = FreqGRUBlock(channels=e3, num_heads=cfg.num_heads,
                         groups=cfg.gru_groups, name="GRUf1")(x3)
        bottleneck_valid = None
        if frames_valid is not None:
            bottleneck_valid = frames_valid + len(cfg.enc_channels)
        h = TimeGRUBlock(channels=e3, num_heads=cfg.num_heads,
                         groups=cfg.gru_groups,
                         max_time_context=cfg.max_time_context,
                         name="GRUt1")(h, frames_valid=bottleneck_valid)
        h = FreqGRUBlock(channels=e3, num_heads=cfg.num_heads,
                         groups=cfg.gru_groups, name="GRUf2")(h)

        # Decoder: additive skip fusion + ConvTranspose (generator.py:586-599)
        d3, d2, d1 = cfg.dec_channels
        deconv_kw = dict(kernel_size=(2, 3), strides=(1, 2), padding=(1, 1),
                         output_padding=(0, 1))
        skip2_a, h_a = _align(skip2, h)
        y2 = _leaky(TorchConvTranspose(d2, name="deconv2", **deconv_kw)(
            h_a + skip2_a))
        skip3_a, y2_a = _align(skip3, y2)
        y3 = _leaky(TorchConvTranspose(d1, name="deconv3", **deconv_kw)(
            y2_a + skip3_a))
        skip4_a, y3_a = _align(skip4, y3)
        y4 = nn.relu(TorchConvTranspose(out_ch, name="deconv4", **deconv_kw)(
            y3_a + skip4_a))

        # Crop / zero-pad back to [T_in, F_in] (generator.py:601-621).
        T_out, F_out = y4.shape[1], y4.shape[2]
        y4 = y4[:, :T_in, :F_in]
        pad_t = max(0, T_in - T_out)
        pad_f = max(0, F_in - F_out)
        if pad_t or pad_f:
            y4 = jnp.pad(y4, ((0, 0), (0, pad_t), (0, pad_f), (0, 0)))

        out = y4.transpose(0, 3, 2, 1)  # [B, 1, F, T]
        if cfg.output_activation == "sigmoid":
            # NOTE: applied after zero-padding, like the reference -- padded
            # frames get sigmoid(0)=0.5. Preserved for checkpoint parity.
            out = jax.nn.sigmoid(out)
        return out


class LctEnhancer(nn.Module):
    """Waveform-to-waveform enhancer wrapping LctGenerator with STFT/iSTFT
    and compressed-mask application (reference LCTEnhancer,
    generator.py:635-697).

    Input:  noisy waveform [B, T]
    Output: (enhanced waveform [B, T], mask_c [B, 1, F, N_frames])
    """

    gen_cfg: LCTGeneratorConfig = LCTGeneratorConfig()
    c: float = 0.3
    stft_cfg: STFTConfig = STFTConfig(n_fft=512)

    @nn.compact
    def __call__(self, noisy_wave: jax.Array,
                 lengths: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        """lengths: optional [B] valid sample count per row. When given,
        the zero-padded tail frames of bucketed batches are masked out of
        the time attention (see LctGenerator), so each row's enhancement
        matches its exact-length result instead of degrading with the
        amount of batch padding (which the reference's batched infer.py
        accepts silently)."""
        if noisy_wave.ndim != 2:
            raise ValueError(
                f"Expected noisy_wave [B, T], got {noisy_wave.shape}")
        cfg = self.stft_cfg.finalize()
        if lengths is not None and cfg.center and cfg.pad_mode == "reflect":
            # Continue each row past its valid end with the REFLECTION the
            # exact-length STFT would see from its own end padding, so the
            # boundary-straddling frames (the only valid frames whose
            # content differs between a bucketed row and its exact-length
            # run) become identical. Combined with the attention key mask
            # below, a bucketed row's enhancement matches its exact-length
            # result up to local conv-edge effects -- and is invariant to
            # the bucket size.
            # Only n_fft//2 samples past each row's end are ever read (the
            # deepest boundary-straddling frame), so build the reflected
            # tail from a per-row W-sample window instead of a full-width
            # [B, T] take_along_axis -- the wide gather costs 42.9 ms at
            # B=128 x 2 s on v5e (vs 2.0 ms for this form; TPU-measured
            # 2026-08-18) and was doubling bucketed-inference step time.
            T = noisy_wave.shape[-1]
            W = cfg.n_fft // 2
            if T >= W:
                k = jnp.arange(W)

                def _row_tail(row, L):
                    # tail[k] = row[clip(L - 2 - k, 0, T-1)]; for L >= W+1
                    # this is flip(row[L-1-W : L-1]), and the in-window
                    # clip reproduces the index-0 clamp for tiny L.
                    start = jnp.clip(L - 1 - W, 0, T - W)
                    seg = jax.lax.dynamic_slice(row, (start,), (W,))
                    return jnp.take(seg, jnp.clip(L - 2 - k - start,
                                                  0, W - 1))

                tails = jax.vmap(_row_tail)(noisy_wave, lengths)
                padded = jnp.pad(noisy_wave, ((0, 0), (0, W)))
                upd = jax.vmap(
                    lambda r, t, L: jax.lax.dynamic_update_slice(
                        r, t, (L,)))(padded, tails, lengths)
                noisy_wave = upd[:, :T]
        noisy_stft = stft(noisy_wave, cfg)            # [B, F, N]
        noisy_mag = magnitude(noisy_stft)[:, None]    # [B, 1, F, N]
        frames_valid = None
        if lengths is not None:
            # Centered torch-semantics frame count (STFTConfig.num_frames)
            # as a traced formula over per-row lengths.
            pad = cfg.n_fft // 2 if cfg.center else 0
            frames_valid = 1 + (lengths + 2 * pad - cfg.n_fft) // cfg.hop_length
        mask_c = LctGenerator(self.gen_cfg, name="gen")(
            noisy_mag, frames_valid=frames_valid)
        if frames_valid is not None:
            # Invalid frames' mask values are garbage (their attention
            # queries are fed masked keys); zero them so the OLA tail of
            # each row is silence instead of garbage-scaled signal. (The
            # reference's padded batches keep sigmoid(0)=0.5 there and
            # save the result, infer.py:150-155.)
            n_frames = mask_c.shape[-1]
            valid = (jnp.arange(n_frames)[None, :] <
                     frames_valid[:, None]).astype(mask_c.dtype)
            mask_c = mask_c * valid[:, None, None, :]
        enhanced_stft = apply_mask(noisy_stft, mask_c, compressed=True,
                                   c=self.c)
        enhanced = istft(enhanced_stft, cfg, length=noisy_wave.shape[-1])
        return enhanced, mask_c
