"""Pallas TPU kernel: ONE fused pass for an entire FTF transformer block.

The generator's hot loop is three FTF blocks (reference
models/generator.py:581-583); each block is

    pre-LN -> grouped GRU (+residual) -> pre-LN -> self-attention
    -> Linear -> LeakyReLU (+residual)

over thousands of short sequences ([B*T, F=33, 64] on the frequency axis,
[B*F, T~126, 64] on the time axis). Round-1 ran the GRU as an XLA scan and
the attention as its own Pallas kernel: every stage round-tripped HBM and
each scan step / attention tile paid its own dispatch, leaving the block
memory- and overhead-bound (~76 of the 85 ms forward at B=128 x 2 s).

This kernel keeps a tile of BLOCK_SEQS sequences resident in VMEM for the
WHOLE block:

  * LayerNorms, residuals and the LeakyReLU are VPU passes on live data.
  * The grouped GRU's input projection is ONE big MXU GEMM covering both
    directions (grouped weights packed into dense gate-major
    block-diagonal matrices, reusing ops/gru.py's packers); the
    recurrence is a lax.fori_loop whose carry never leaves VMEM and whose
    per-step GEMM computes forward AND backward gates together
    (block-diagonal [D*C, D*3C] hidden weights) -- L sequential steps for
    a bidirectional GRU, not 2L.
  * Attention packs `sub` sequences per scores GEMM with a host-precomputed
    block-diagonal additive bias (same scheme as ops/attention.py, which
    this kernel subsumes for the FTF blocks), including the optional
    banded-causal time mask.
  * Matmuls run bf16 with f32 accumulation; carries/outputs stay f32.

Differentiable: custom VJP. The backward is its own fused Pallas kernel
(ops/ftf_bwd.py) fed by per-direction hidden states this kernel saves
under grad; LCT_FTF_JNP_BWD=1 falls back to an exact jnp recompute
through `ftf_block_reference` below (pallas_call has no autodiff rule;
CPU tests use the jnp path, so any new kernel MUST carry its own VJP --
see CLAUDE.md).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lct_gan_tpu.ops.attention import _block_mask_bias, mhsa_reference
from lct_gan_tpu.ops.gru import (
    grouped_gru_reference,
    pack_dense_gru_weights,
    pack_gate_major_bias,
)

__all__ = ["fused_ftf_block", "ftf_block_reference", "pick_ftf_tile"]

# Above this sequence length the per-tile VMEM working set (input-projection
# and qkv scratch scale with L) stops fitting; callers fall back to the
# composed per-op path (models/generator.py), where the standalone fused
# attention kernel (ops/attention.py) still covers lengths up to 1024.
MAX_FTF_SEQ = 512


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float = 1e-6) -> jax.Array:
    """flax.linen.LayerNorm math (fast-variance form), rows = last axis."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu))
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def ftf_block_reference(x: jax.Array,
                        ln1_scale, ln1_bias,
                        w_ih, w_hh, b_ih, b_hh,
                        ln2_scale, ln2_bias,
                        in_w, in_b, out_w, out_b,
                        lin_w, lin_b,
                        *,
                        bidirectional: bool,
                        num_heads: int,
                        lookback: Optional[int] = None,
                        key_bias: Optional[jax.Array] = None) -> jax.Array:
    """Pure-jnp FTF block over x [N, L, C]; the kernel's numerical contract
    and backward path. lin_w [2C, C] means concat([gru, attn]) input
    (frequency block); [C, C] means attention-only (time block).
    key_bias: optional [N, L] per-key additive attention bias (0/-1e30),
    hiding zero-padded frames of bucketed batches from every query."""
    N, L, C = x.shape
    n1 = _layer_norm(x, ln1_scale, ln1_bias)
    g = grouped_gru_reference(n1, w_ih, w_hh, b_ih, b_hh,
                              bidirectional=bidirectional)
    s = x + g
    n2 = _layer_norm(s, ln2_scale, ln2_bias)
    a = mhsa_reference(n2, in_w, in_b, out_w, out_b, num_heads=num_heads,
                       lookback=lookback, key_bias=key_bias)
    if lin_w.shape[0] == 2 * C:
        comb = (jnp.einsum("nlc,cf->nlf", g, lin_w[:C],
                           preferred_element_type=jnp.float32) +
                jnp.einsum("nlc,cf->nlf", a, lin_w[C:],
                           preferred_element_type=jnp.float32) + lin_b)
    else:
        comb = jnp.einsum("nlc,cf->nlf", a, lin_w,
                          preferred_element_type=jnp.float32) + lin_b
    comb = jnp.where(comb >= 0, comb, 0.2 * comb)
    return s + comb


def pick_ftf_tile(length: int, save_hidden: bool = False) -> Tuple[int, int]:
    """(block_seqs, attn_sub) per-tile shape, from the v5e sweep
    (tools/sweep_ftf.py). Sized so the whole tile -- double-buffered io,
    f32 xp scratch, f32 GRU carry, packed [R, R] attention bias -- fits
    VMEM. Under save_hidden (training forward) the tile also carries the
    double-buffered per-direction hidden-state output, so the long
    time-axis tile halves."""
    if length <= 48:
        return 256, 8     # freq axis (L=33): 13.4 ms/block
    if length <= 160:
        # Equal to (128,2) at the train-segment L=126 (11.3 vs 11.0 ms)
        # but 1.4x faster at Lp=136-class lengths that bucketed eval
        # hits (12.4 vs 17.9 ms, v5e re-sweep after the f32 xp scratch);
        # training halves for the hid output.
        return (64, 2) if save_hidden else (96, 2)   # time axis (L~129)
    if length <= 320:
        return (16, 2) if save_hidden else (32, 2)
    return (8, 1) if save_hidden else (16, 1)


def _ftf_kernel(x_ref, wih_ref, whh_ref, bih_ref, bhh_ref,
                ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                inw_ref, inb_ref, outw_ref, outb_ref,
                linw_ref, linb_ref, bias_ref, keyb_ref,
                o_ref, hid_ref,
                xp_scr, gru_scr, bwdg_scr, qkv_scr, ctx_scr, h_scr,
                *, directions: int, num_heads: int, sub: int,
                valid_len: int, pad_len: int, precise: bool = False):
    # Shapes carry Lp (sequence length padded to the f32 sublane tile, so
    # every in-kernel reshape merges/splits 8-aligned dims -- Mosaic rejects
    # unaligned shape casts); `valid_len` is the true L. Padded positions:
    # zeroed in the GRU output, key-masked in the attention bias, sliced
    # off by the caller.
    #
    # Both GRU directions run in ONE recurrence chain: the wrapper packs
    # forward+backward weights into [C, D*3C] (input proj) and a
    # block-diagonal [D*C, D*3C] (hidden proj), so each step is a single
    # GEMM computing both directions' gates -- L sequential steps instead
    # of 2L. Forward writes gru_scr[t], backward writes bwdg_scr[L-1-t]
    # (separate scratch: the two visit each t at different loop steps).
    BS, L, C = x_ref.shape
    D = directions
    hd = C // num_heads
    # `precise` keeps every GEMM in f32 (testing mode: isolates wiring
    # errors from bf16 noise so witnesses can assert tight bands).
    bf16 = jnp.float32 if precise else jnp.bfloat16
    Lp = pad_len
    assert L == valid_len

    # The block arrives at the TRUE length L; padding to the aligned Lp
    # happens here on the VMEM-resident value instead of as a host-side
    # XLA pad of the whole [N, L, C] array (measured ~1 ms/block of pure
    # HBM copy at inference shapes, plus the matching slice after).
    x = x_ref[...]                                   # [BS, L, C]
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
    xt = jnp.transpose(x, (1, 0, 2))                 # [Lp, BS, C] time-major
    n1 = _layer_norm(xt.reshape(Lp * BS, C), ln1s_ref[...], ln1b_ref[...])

    # ---- grouped GRU: one input-projection GEMM + VMEM-resident scan ----
    xp = jnp.dot(n1.astype(bf16), wih_ref[...].astype(bf16),
                 preferred_element_type=jnp.float32) + bih_ref[...]
    # f32 storage: the gate nonlinearities amplify xp rounding, and the
    # backward kernel (ops/ftf_bwd.py) recomputes gates from an f32 xp --
    # keeping both in f32 makes forward and backward see identical gates.
    xp_scr[...] = xp.reshape(Lp, BS, D * 3 * C)
    whh_bf = whh_ref[...].astype(bf16)               # [D*C, D*3C] blockdiag
    bhh = bhh_ref[...]
    h_scr[...] = jnp.zeros((BS, D * C), jnp.float32)

    def gates(xpt, hp, h_prev, base):
        r = jax.nn.sigmoid(xpt[:, base:base + C] + hp[:, base:base + C])
        z = jax.nn.sigmoid(xpt[:, base + C:base + 2 * C] +
                           hp[:, base + C:base + 2 * C])
        n = jnp.tanh(xpt[:, base + 2 * C:base + 3 * C] +
                     r * hp[:, base + 2 * C:base + 3 * C])
        return (1.0 - z) * n + z * h_prev

    def step(i, _):
        h = h_scr[...]                               # [BS, D*C]
        hp = jnp.dot(h.astype(bf16), whh_bf,
                     preferred_element_type=jnp.float32) + bhh
        xf = xp_scr[i]                               # [BS, D*3C]
        hf = gates(xf, hp, h[:, :C], 0)
        gru_scr[i] = hf
        if D == 2:
            tb = L - 1 - i
            xb = xp_scr[tb]
            hb = gates(xb, hp, h[:, C:], 3 * C)
            bwdg_scr[tb] = hb
            h_scr[...] = jnp.concatenate([hf, hb], axis=-1)
        else:
            h_scr[...] = hf
        return 0

    jax.lax.fori_loop(0, L, step, 0)
    for t in range(L, Lp):  # keep padded rows finite (uninitialized VMEM)
        gru_scr[t] = jnp.zeros((BS, C), jnp.float32)
        if D == 2:
            bwdg_scr[t] = jnp.zeros((BS, C), jnp.float32)

    g_tm = gru_scr[...]
    if D == 2:
        g_tm = g_tm + bwdg_scr[...]
    g = jnp.transpose(g_tm, (1, 0, 2))               # [BS, Lp, C] seq-major
    s = x + g

    # ---- attention: qkv GEMM + packed block-diagonal scores ----
    n2 = _layer_norm(s.reshape(BS * Lp, C), ln2s_ref[...], ln2b_ref[...])
    qkv = jnp.dot(n2.astype(bf16), inw_ref[...].astype(bf16),
                  preferred_element_type=jnp.float32) + inb_ref[...]
    n_sub = BS // sub
    R = sub * Lp
    qkv_scr[...] = qkv.astype(bf16).reshape(n_sub, R, 3 * C)

    scale = 1.0 / float(np.sqrt(hd))
    bias = bias_ref[...]

    def attn_chunk(c, _):
        qm = qkv_scr[c]                              # [R, 3C]
        cb = bias
        if keyb_ref is not None:
            # Per-key additive bias for this chunk's packed rows (host-
            # flattened [1, n_sub, R]: the leading size-1 dim is the tile
            # axis, so the BlockSpec's last-two dims equal the array dims
            # -- Mosaic rejects blocks whose second-to-last dim is
            # neither 8-divisible nor full, which small n_sub configs
            # hit); broadcast over query rows.
            cb = cb + keyb_ref[0, c][None, :]
        parts = []
        for h in range(num_heads):
            q = qm[:, h * hd:(h + 1) * hd]
            k = qm[:, C + h * hd:C + (h + 1) * hd]
            v = qm[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            sc = jnp.dot(q, k.T,
                         preferred_element_type=jnp.float32) * scale + cb
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - m)
            # Padded query rows (pos % Lp >= L) still attend to their
            # sequence's VALID keys (_block_mask_bias masks key positions
            # only), so their outputs are garbage-but-finite; they are
            # sliced off after the kernel. +tiny is a pure safety guard.
            denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-20
            ctx = jnp.dot(p.astype(bf16), v,
                          preferred_element_type=jnp.float32) / denom
            parts.append(ctx.astype(bf16))
        ctx_scr[c] = jnp.concatenate(parts, axis=-1)
        return 0

    jax.lax.fori_loop(0, n_sub, attn_chunk, 0)

    a = jnp.dot(ctx_scr[...].reshape(BS * Lp, C),
                outw_ref[...].astype(bf16),
                preferred_element_type=jnp.float32) + outb_ref[...]

    # ---- combine: Linear (+concat'd GRU for the freq block) + LeakyReLU ----
    linw = linw_ref[...]
    if linw.shape[0] == 2 * C:
        comb = (jnp.dot(g.reshape(BS * Lp, C).astype(bf16),
                        linw[:C].astype(bf16),
                        preferred_element_type=jnp.float32) +
                jnp.dot(a.astype(bf16), linw[C:].astype(bf16),
                        preferred_element_type=jnp.float32) + linb_ref[...])
    else:
        comb = jnp.dot(a.astype(bf16), linw.astype(bf16),
                       preferred_element_type=jnp.float32) + linb_ref[...]
    comb = jnp.where(comb >= 0, comb, 0.2 * comb)
    out = (s.reshape(BS * Lp, C) + comb).reshape(BS, Lp, C)
    o_ref[...] = out[:, :L]
    if hid_ref is not None:
        # Per-direction hidden states for the fused backward kernel
        # (ops/ftf_bwd.py): with every h_t saved, the backward's hp
        # recompute and weight grads hoist into single GEMMs.
        if D == 2:
            hid_tm = jnp.concatenate([gru_scr[...], bwdg_scr[...]], axis=-1)
        else:
            hid_tm = gru_scr[...]
        hid_ref[...] = jnp.transpose(hid_tm, (1, 0, 2))[:, :L]


def _fused_ftf_pallas(x, ln1s, ln1b, w_ih, w_hh, b_ih, b_hh, ln2s, ln2b,
                      in_w, in_b, out_w, out_b, lin_w, lin_b,
                      bidirectional, num_heads, lookback, block_seqs, sub,
                      interpret, save_hidden=False, key_bias=None,
                      precise=False):
    N, L, C = x.shape
    D = 2 if bidirectional else 1
    auto = block_seqs is None
    if block_seqs is None or sub is None:
        auto_bs, auto_sub = pick_ftf_tile(L, save_hidden)
        block_seqs = block_seqs or auto_bs
        sub = sub or auto_sub
    block_seqs = min(block_seqs, max(sub, ((N + 7) // 8) * 8))
    if (auto and not save_hidden and N % block_seqs
            and block_seqs // 2 >= sub and (block_seqs // 2) % sub == 0
            and N % (block_seqs // 2) == 0):
        # Inference: when the swept tile doesn't divide the sequence
        # count but its half does, take the half -- the N-pad would copy
        # the whole array through HBM twice (pad + slice, ~2 ms at
        # B=128: the freq blocks run N = B*(T+3) = 128*129 sequences,
        # which 256 doesn't divide). Measured net win on v5e (bench.py).
        block_seqs //= 2
    if block_seqs % sub:
        raise ValueError(f"sub={sub} must divide block_seqs={block_seqs}")

    # The kernel pads the sequence axis to the sublane tile IN VMEM (f32
    # tile 8; the bf16 qkv scratch further needs the packed R = sub * Lp
    # to be 16-aligned) -- blocks arrive at the true L, so no host-side
    # whole-array pad/slice round-trips HBM. Only the sequence-count
    # axis still pads to the tile multiple.
    Lp = -(-L // 8) * 8
    if (sub * Lp) % 16:
        Lp = -(-L // 16) * 16
    pad = (-N) % block_seqs
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    n_tiles = (N + pad) // block_seqs

    # Pack both directions for the single-chain recurrence: input proj
    # [C, D*3C] (fwd gate columns then bwd), hidden proj block-diagonal
    # [D*C, D*3C] so one GEMM yields both directions' gate pre-activations.
    wih_p = jnp.concatenate(
        [pack_dense_gru_weights(w_ih[d]) for d in range(D)], axis=1)
    whh_p = jnp.zeros((D * C, D * 3 * C), w_hh.dtype)
    for d in range(D):
        whh_p = whh_p.at[d * C:(d + 1) * C,
                         d * 3 * C:(d + 1) * 3 * C].set(
                             pack_dense_gru_weights(w_hh[d]))
    bih_p = jnp.concatenate(
        [pack_gate_major_bias(b_ih[d]) for d in range(D)])
    bhh_p = jnp.concatenate(
        [pack_gate_major_bias(b_hh[d]) for d in range(D)])

    R = sub * Lp
    bias = jnp.asarray(_block_mask_bias(sub, Lp, lookback, valid_len=L))

    base = functools.partial(_ftf_kernel, directions=D,
                             num_heads=num_heads, sub=sub, valid_len=L,
                             pad_len=Lp, precise=precise)
    # Splice None for the optional refs absent from the call signature
    # (16 fixed inputs, then keyb_ref if key_bias is given, then o_ref,
    # then hid_ref if save_hidden) so the impl skips their use.
    if key_bias is not None:
        if save_hidden:
            kernel = base
        else:
            kernel = lambda *a: base(*a[:18], None, *a[18:])  # noqa: E731
    elif save_hidden:
        kernel = lambda *a: base(*a[:16], None, *a[16:])  # noqa: E731
    else:
        kernel = lambda *a: base(*a[:16], None, a[16], None,
                                 *a[17:])  # noqa: E731

    def _full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((block_seqs, L, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        _full((C, D * 3 * C)), _full((D * C, D * 3 * C)),
        _full((D * 3 * C,)), _full((D * 3 * C,)),
        _full((C,)), _full((C,)), _full((C,)), _full((C,)),
        _full((C, 3 * C)), _full((3 * C,)),
        _full((C, C)), _full((C,)),
        _full(tuple(lin_w.shape)), _full((C,)),
        _full((R, R)),
    ]
    inputs = [x.astype(jnp.float32), wih_p, whh_p, bih_p, bhh_p,
              ln1s, ln1b, ln2s, ln2b, in_w, in_b, out_w, out_b,
              lin_w, lin_b, bias]
    if key_bias is not None:
        # [N, L] per-key additive bias -> [n_tiles, n_sub, R] host-side
        # reshape (row-major: tile i, chunk c covers sequences
        # i*block_seqs + c*sub ..+sub, each flattened over Lp). Padded
        # positions get 0 -- the block bias already masks keys >= L.
        kb = jnp.pad(key_bias.astype(jnp.float32),
                     ((0, pad), (0, Lp - L)))
        inputs.append(kb.reshape(n_tiles, block_seqs // sub, R))
        in_specs.append(
            pl.BlockSpec((1, block_seqs // sub, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))

    gru_flops = 2 * D * (N + pad) * Lp * C * 3 * C * 2  # in-proj + recur
    attn_flops = n_tiles * (block_seqs // sub) * num_heads * 2 * R * R * (
        C // num_heads) * 2
    if save_hidden:
        out_specs = (
            pl.BlockSpec((block_seqs, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_seqs, L, D * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape = (
            jax.ShapeDtypeStruct((N + pad, L, C), jnp.float32),
            jax.ShapeDtypeStruct((N + pad, L, D * C), jnp.float32))
    else:
        out_specs = pl.BlockSpec((block_seqs, L, C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((N + pad, L, C), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Lp, block_seqs, D * 3 * C), jnp.float32),  # xp
            pltpu.VMEM((Lp, block_seqs, C), jnp.float32),       # gru fwd out
            pltpu.VMEM((Lp, block_seqs, C) if D == 2 else (8, 8, C),
                       jnp.float32),                            # gru bwd out
            pltpu.VMEM((block_seqs // sub, R, 3 * C),
                       jnp.float32 if precise else jnp.bfloat16),  # qkv
            pltpu.VMEM((block_seqs // sub, R, C),
                       jnp.float32 if precise else jnp.bfloat16),  # attn ctx
            pltpu.VMEM((block_seqs, D * C), jnp.float32),       # carry
        ],
        cost_estimate=pl.CostEstimate(
            flops=gru_flops + attn_flops + 2 * (N + pad) * Lp * C * 8 * C,
            bytes_accessed=2 * (N + pad) * Lp * C * 4,
            transcendentals=(N + pad) * Lp * (3 * C * D + num_heads * R),
        ),
        # The default 16 MB scoped-vmem budget rejects productive tile
        # sizes (the f32 GEMM intermediates are transient but count);
        # v5e has headroom above it (~128 MB total). save_hidden adds the
        # hid output buffer + f32 xp, so training needs the higher cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(110 if save_hidden else 104) * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if save_hidden:
        out, hid = out
        if pad:
            out, hid = out[:N], hid[:N]
        return out, hid
    return out[:N] if pad else out


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(16, 17, 18, 19, 20, 21, 22))
def _fused_ftf(x, ln1s, ln1b, w_ih, w_hh, b_ih, b_hh, ln2s, ln2b,
               in_w, in_b, out_w, out_b, lin_w, lin_b, key_bias,
               bidirectional, num_heads, lookback, block_seqs, sub,
               interpret, precise):
    return _fused_ftf_pallas(x, ln1s, ln1b, w_ih, w_hh, b_ih, b_hh,
                             ln2s, ln2b, in_w, in_b, out_w, out_b,
                             lin_w, lin_b, bidirectional, num_heads,
                             lookback, block_seqs, sub, interpret,
                             key_bias=key_bias, precise=precise)


def _fused_ftf_fwd(x, ln1s, ln1b, w_ih, w_hh, b_ih, b_hh, ln2s, ln2b,
                   in_w, in_b, out_w, out_b, lin_w, lin_b, key_bias,
                   bidirectional, num_heads, lookback, block_seqs, sub,
                   interpret, precise):
    import os
    # The fused backward kernel (ops/ftf_bwd.py) has no key-bias input;
    # key_bias only occurs on bucketed val/infer batches, which never
    # differentiate, so routing it to the exact jnp-recompute VJP costs
    # nothing in training and keeps grads correct if anyone does.
    jnp_bwd = bool(os.environ.get("LCT_FTF_JNP_BWD")) or key_bias is not None
    out = _fused_ftf_pallas(x, ln1s, ln1b, w_ih, w_hh, b_ih, b_hh,
                            ln2s, ln2b, in_w, in_b, out_w, out_b,
                            lin_w, lin_b, bidirectional, num_heads,
                            lookback, block_seqs, sub, interpret,
                            save_hidden=not jnp_bwd, key_bias=key_bias,
                            precise=precise)
    if jnp_bwd:
        hid = None
    else:
        out, hid = out
    return out, (x, ln1s, ln1b, w_ih, w_hh, b_ih, b_hh, ln2s, ln2b,
                 in_w, in_b, out_w, out_b, lin_w, lin_b, key_bias, hid)


def _fused_ftf_bwd(bidirectional, num_heads, lookback, block_seqs, sub,
                   interpret, precise, res, g):
    *primals, key_bias, hid = res
    if hid is None:  # LCT_FTF_JNP_BWD escape hatch: jnp recompute VJP
        _, vjp = jax.vjp(
            lambda *args: ftf_block_reference(
                *args, bidirectional=bidirectional, num_heads=num_heads,
                lookback=lookback, key_bias=key_bias),
            *primals)
        dkb = None if key_bias is None else jnp.zeros_like(key_bias)
        return vjp(g) + (dkb,)
    from lct_gan_tpu.ops.ftf_bwd import fused_ftf_bwd
    return fused_ftf_bwd(*primals, hid, g, bidirectional=bidirectional,
                         num_heads=num_heads, lookback=lookback,
                         interpret=interpret, precise=precise) + (None,)


_fused_ftf.defvjp(_fused_ftf_fwd, _fused_ftf_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("bidirectional", "num_heads", "lookback", "block_seqs",
                     "sub", "interpret", "precise"))
def fused_ftf_block(x: jax.Array,
                    ln1_scale, ln1_bias,
                    w_ih, w_hh, b_ih, b_hh,
                    ln2_scale, ln2_bias,
                    in_w, in_b, out_w, out_b,
                    lin_w, lin_b,
                    *,
                    bidirectional: bool,
                    num_heads: int = 4,
                    lookback: Optional[int] = None,
                    key_bias: Optional[jax.Array] = None,
                    block_seqs: Optional[int] = None,
                    sub: Optional[int] = None,
                    interpret: bool = False,
                    precise: bool = False) -> jax.Array:
    """Fused FTF block over x [N, L, C] -> [N, L, C] f32.

    GRU params in GroupedGRU layout ([D, G, H, 3H] / [D, G, 3H]); attention
    params in torch packed layout; lin_w [2C, C] = freq block
    (concat(gru, attn)), [C, C] = time block (attention only).
    key_bias: optional [N, L] per-key additive attention bias (0/-1e30)
    hiding zero-padded frames of bucketed batches from every query.
    Differentiable (custom VJP -> ftf_block_reference); key_bias is
    treated as a NON-differentiable constant (its cotangent is zeros) —
    it only occurs on bucketed val/infer batches, never under grad.
    precise=True keeps every GEMM (fwd + fused bwd) in f32: a TESTING
    mode (used by the multichip witness, LCT_FTF_PRECISE=1) that isolates
    kernel wiring from bf16 noise; larger tiles may not fit VMEM."""
    return _fused_ftf(x, ln1_scale, ln1_bias, w_ih, w_hh, b_ih, b_hh,
                      ln2_scale, ln2_bias, in_w, in_b, out_w, out_b,
                      lin_w, lin_b, key_bias, bidirectional, num_heads,
                      lookback, block_seqs, sub, interpret, precise)
