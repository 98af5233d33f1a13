"""Pallas TPU kernel: fused multi-head self-attention for MANY TINY
sequences.

The FTF bottleneck runs attention over thousands of short sequences
(frequency axis: B*T seqs of length ~33; time axis: B*F seqs of length
~129; embed 64, 4 heads of 16). At these shapes the XLA path is
memory-bound: qkv, per-head scores, softmax and context each round-trip
HBM, and the batched 33x16x33 GEMMs leave the MXU mostly idle (measured
~17 ms for the freq attention at batch 128 -- ~1.6 TFLOP/s).

This kernel packs BLOCK_SEQS sequences into one tile and fuses the whole
attention into a single VMEM-resident pass:

  qkv projection -> per-head block-diagonal scores -> masked softmax ->
  context -> output projection

The scores matrix for the packed tile is computed as ONE [R, R] GEMM per
head (R = BLOCK_SEQS * L) and masked block-diagonally so sequences don't
attend across each other; the redundant off-block FLOPs are trivia
compared to the HBM traffic they eliminate. Matmuls run in bf16 with f32
accumulation.

Supports the banded-causal time mask (max_time_context) natively: the
band condition composes with the block-diagonal mask.

Parameter layout matches models/attention.py (torch packed in_proj), so
the kernel is a drop-in numerical replacement for the jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mhsa", "mhsa_reference", "pick_block_seqs"]


def mhsa_reference(x: jax.Array,
                   in_proj_kernel: jax.Array,
                   in_proj_bias: jax.Array,
                   out_proj_kernel: jax.Array,
                   out_proj_bias: jax.Array,
                   num_heads: int = 4,
                   lookback: Optional[int] = None,
                   key_bias: Optional[jax.Array] = None) -> jax.Array:
    """Pure-jnp MHSA (torch.nn.MultiheadAttention math). Shared by the
    flax module's non-TPU path and the Pallas kernel's backward pass.
    key_bias: optional [B, S] additive score bias per KEY position
    (0 = attend, -1e30 = masked) -- used to hide zero-padded frames of
    bucketed batches from every query (models/generator.py)."""
    B, S, E = x.shape
    nh = num_heads
    hd = E // nh
    qkv = jnp.einsum("bse,ef->bsf", x, in_proj_kernel,
                     preferred_element_type=jnp.float32) + in_proj_bias
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
    if lookback is not None:
        qpos = jnp.arange(S)[:, None]
        kpos = jnp.arange(S)[None, :]
        mask = (kpos <= qpos) & (kpos >= qpos - lookback)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    if key_bias is not None:
        scores = scores + key_bias[:, None, None, :]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
    return jnp.einsum("bse,ef->bsf", out, out_proj_kernel,
                      preferred_element_type=jnp.float32) + out_proj_bias


def pick_block_seqs(length: int) -> int:
    """Sequences per tile. Measured on v5e (chained-in-jit, so free of the
    ~4 ms/call tunnel dispatch overhead): L=33 best at 8 (10.4 ms for
    N=16128), L=126 best at 4 (12.5 ms for N=4224); larger tiles lose
    because total packed-scores FLOPs grow linearly with block_seqs while
    the per-tile pipeline overhead is already amortized."""
    if length <= 64:
        return 8
    if length <= 256:
        return 4
    if length <= 512:
        return 2
    return 1


def _block_mask_bias(block_seqs: int, length: int,
                     lookback: Optional[int],
                     valid_len: Optional[int] = None) -> np.ndarray:
    """[R, R] f32 additive bias: 0 where packed row/col are in the same
    sequence (and within the optional causal band), -1e30 elsewhere.
    `valid_len` < length additionally masks KEY positions >= valid_len
    (sequences padded to a tile-aligned length, ops/ftf.py).

    Precomputed ON THE HOST at trace time: computing it in-kernel needs
    two [R, R] integer divisions by L per tile (L=33 is not a power of
    two), which measured as a dominant VPU cost. As a kernel input with a
    constant index_map it loads into VMEM once and stays resident."""
    R = block_seqs * length
    pos = np.arange(R)
    same = (pos[:, None] // length) == (pos[None, :] // length)
    if valid_len is not None and valid_len < length:
        same &= (pos[None, :] % length) < valid_len
    if lookback is not None:
        rl = pos[:, None] % length
        cl = pos[None, :] % length
        same &= (cl <= rl) & (cl >= rl - lookback)
    return np.where(same, 0.0, -1e30).astype(np.float32)


def _mhsa_kernel(x_ref, in_w_ref, in_b_ref, out_w_ref, out_b_ref, bias_ref,
                 keyb_ref, o_ref, *, num_heads: int, length: int,
                 block_seqs: int, lookback: Optional[int]):
    S, L, E = x_ref.shape
    R = S * L
    hd = E // num_heads

    x = x_ref[...].reshape(R, E)
    in_w = in_w_ref[...]
    out_w = out_w_ref[...]
    bias = bias_ref[...]
    if keyb_ref is not None:
        # Per-key additive bias for this tile's packed rows ([1, 1, R]
        # f32, flattened on the host so no in-kernel unaligned reshape is
        # needed); broadcast over query rows below. The explicit size-1
        # middle dim keeps the BlockSpec's last-two dims EQUAL to the
        # array dims -- Mosaic rejects a (1, R) block over an
        # [n_tiles, R] array (second-to-last dim must be 8-divisible or
        # full; bit on real TPU at L=644 bucketed inference, 2026-08-18).
        bias = bias + keyb_ref[0, 0][None, :]

    qkv = jnp.dot(x.astype(jnp.bfloat16), in_w.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + in_b_ref[...]

    scale = 1.0 / float(np.sqrt(hd))
    outs = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, E + h * hd:E + (h + 1) * hd]
        v = qkv[:, 2 * E + h * hd:2 * E + (h + 1) * hd]
        # One big MXU GEMM for all packed sequences' scores; the additive
        # bias (block-diagonal + optional band, precomputed on host) makes
        # cross-sequence entries exp to 0, so the context GEMM runs
        # directly on the [R, R] probabilities -- no scratch, no per-
        # sequence softmax loop.
        s = jnp.dot(q.astype(jnp.bfloat16),
                    k.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32) * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(outs, axis=-1)  # [R, E]
    out = jnp.dot(ctx.astype(jnp.bfloat16), out_w.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + out_b_ref[...]
    o_ref[...] = out.reshape(S, L, E).astype(o_ref.dtype)


def _fused_mhsa_pallas(x, in_proj_kernel, in_proj_bias, out_proj_kernel,
                       out_proj_bias, num_heads, lookback, block_seqs,
                       interpret, key_bias=None):
    N, L, E = x.shape
    if block_seqs is None:
        block_seqs = pick_block_seqs(L)
    pad = (-N) % block_seqs
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    n_tiles = (N + pad) // block_seqs

    base = functools.partial(
        _mhsa_kernel, num_heads=num_heads, length=L,
        block_seqs=block_seqs, lookback=lookback)

    R = block_seqs * L
    bias = jnp.asarray(_block_mask_bias(block_seqs, L, lookback))
    in_specs = [
        pl.BlockSpec((block_seqs, L, E), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 3 * E), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * E,), lambda i: (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((E, E), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((R, R), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [x.astype(jnp.float32), in_proj_kernel, in_proj_bias,
              out_proj_kernel, out_proj_bias, bias]
    if key_bias is not None:
        # [N, L] per-key additive bias -> [n_tiles, 1, R] host-side
        # flatten (free XLA reshape; avoids an unaligned in-kernel
        # merge). 3D so the block's LAST TWO dims (1, R) equal the array
        # dims -- see the kernel comment.
        kb = jnp.pad(key_bias.astype(jnp.float32), ((0, pad), (0, 0)))
        inputs.append(kb.reshape(n_tiles, 1, R))
        in_specs.append(pl.BlockSpec((1, 1, R), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        kernel = base
    else:
        kernel = lambda *a: base(*a[:6], None, *a[6:])  # noqa: E731

    flops_tile = (2 * R * E * 3 * E + num_heads * 2 * R * R * (E // 4) * 2
                  + 2 * R * E * E)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_seqs, L, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, L, E), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * n_tiles,
            bytes_accessed=2 * (N + pad) * L * E * 4,
            transcendentals=n_tiles * num_heads * R * R,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:N] if pad else out


# pallas_call has no autodiff rule; training differentiates through the
# attention, so the kernel carries a custom VJP whose backward recomputes
# via the jnp reference implementation (standard fused-forward pattern --
# fwd runs the kernel, bwd is XLA). key_bias (None or [N, L]) rides along
# as a constant: its cotangent is None/zeros (masking is not trained).
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_mhsa(x, iw, ib, ow, ob, key_bias, num_heads, lookback,
                block_seqs, interpret):
    return _fused_mhsa_pallas(x, iw, ib, ow, ob, num_heads, lookback,
                              block_seqs, interpret, key_bias=key_bias)


def _fused_mhsa_fwd(x, iw, ib, ow, ob, key_bias, num_heads, lookback,
                    block_seqs, interpret):
    out = _fused_mhsa_pallas(x, iw, ib, ow, ob, num_heads, lookback,
                             block_seqs, interpret, key_bias=key_bias)
    return out, (x, iw, ib, ow, ob, key_bias)


def _fused_mhsa_bwd(num_heads, lookback, block_seqs, interpret, res, g):
    x, iw, ib, ow, ob, key_bias = res
    _, vjp = jax.vjp(
        lambda x, iw, ib, ow, ob: mhsa_reference(
            x, iw, ib, ow, ob, num_heads=num_heads, lookback=lookback,
            key_bias=key_bias),
        x, iw, ib, ow, ob)
    dkb = None if key_bias is None else jnp.zeros_like(key_bias)
    return vjp(g) + (dkb,)


_fused_mhsa.defvjp(_fused_mhsa_fwd, _fused_mhsa_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "lookback", "block_seqs", "interpret"))
def fused_mhsa(x: jax.Array,
               in_proj_kernel: jax.Array,
               in_proj_bias: jax.Array,
               out_proj_kernel: jax.Array,
               out_proj_bias: jax.Array,
               *,
               num_heads: int = 4,
               lookback: Optional[int] = None,
               key_bias: Optional[jax.Array] = None,
               block_seqs: Optional[int] = None,
               interpret: bool = False) -> jax.Array:
    """Fused MHSA over x [N, L, E]. Returns [N, L, E] (f32).
    Differentiable (custom VJP); kernel layout as models/attention.py.
    key_bias: optional [N, L] per-key additive score bias (0/-1e30)."""
    return _fused_mhsa(x, in_proj_kernel, in_proj_bias, out_proj_kernel,
                       out_proj_bias, key_bias, num_heads, lookback,
                       block_seqs, interpret)
