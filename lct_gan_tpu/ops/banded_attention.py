"""Pallas TPU kernel: block-skipping banded-causal multi-head attention.

The banded time attention (max_time_context, reference generator.py:194-198
-- the band its dead flag was meant to apply, SURVEY.md §2.10) is served
today by two paths that both pay full O(S^2) score FLOPs: the fused
attention kernel (ops/attention.py) rides the band in as an additive
score bias, and the masked jnp path materialises the [S, S] mask. The
exact O(S*W) formulation exists only as a jnp rewrite
(models/attention.py::_blocked_banded_attention), which XLA tiles through
HBM.

This kernel IS that two-key-block tiling, fused into one VMEM pass:
queries are tiled into T rows (T in [104, 128] chosen per (W, S) to
minimize tile padding -- see pick_block_rows; always >= W);
a query row at global position q attends keys [q - W, q], all of which
live in key tiles i-1 and i, so each grid step loads exactly two x tiles,
projects them once (the self tile's projection doubles as this tile's
queries), and computes one [T, 2T] score block per head:

  concat(prev, self) -> qkv GEMM -> per-head [T, 2T] banded scores ->
  softmax -> context -> output projection

Compute AND memory are linear in S with a constant per-tile VMEM
footprint, so unlike the full kernel (whose [R, R] scores scratch caps it
at S <= 1024) this serves any sequence length -- 60 s utterances included.
Matmuls run in bf16 with f32 accumulation (same as ops/attention.py).

Mask semantics match _blocked_banded_attention exactly: band AND global
key validity (kills the i=0 left pad and the ragged-S tail), with the
self key kept structurally attendable so fully key_bias-masked rows
degrade to uniform-over-band instead of NaN.

Parameter layout matches models/attention.py (torch packed in_proj);
the custom VJP recomputes through banded_mhsa_reference -- the O(S*W)
blocked jnp formulation (models/attention.py::_blocked_banded_attention),
so the backward is linear in S too (pallas_call has no autodiff rule;
same fused-fwd/jnp-bwd pattern as ops/attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_mhsa", "banded_mhsa_reference", "pick_block_rows"]


def banded_mhsa_reference(x: jax.Array,
                          in_proj_kernel: jax.Array,
                          in_proj_bias: jax.Array,
                          out_proj_kernel: jax.Array,
                          out_proj_bias: jax.Array,
                          *,
                          num_heads: int,
                          lookback: int,
                          key_bias: Optional[jax.Array] = None) -> jax.Array:
    """Pure-jnp banded MHSA in O(S * lookback): the projections of
    ops/attention.py::mhsa_reference around the two-key-block banded core
    (models/attention.py::_blocked_banded_attention). Matches the masked
    reference to float reassociation noise; serves as the kernel's VJP
    recompute so the backward stays linear in S."""
    from lct_gan_tpu.models.attention import _blocked_banded_attention

    B, S, E = x.shape
    hd = E // num_heads
    qkv = jnp.einsum("bse,ef->bsf", x, in_proj_kernel,
                     preferred_element_type=jnp.float32) + in_proj_bias
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3)

    out = _blocked_banded_attention(heads(q), heads(k), heads(v),
                                    lookback, key_bias)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, E)
    return jnp.einsum("bse,ef->bsf", out, out_proj_kernel,
                      preferred_element_type=jnp.float32) + out_proj_bias


def pick_block_rows(lookback: int, seq_len: Optional[int] = None) -> int:
    """Query rows per tile. Constraints: a multiple of 8 (f32 sublane) and
    >= lookback, so two key tiles cover the band (keys for rows [iT, iT+T)
    span [iT - W, iT + T)). Within [104, 128] -- the efficient range swept
    on v5e-1: per-row cost is ~flat across {104..128} but ~35% worse at 64,
    so raw row-minimizing would overshoot into slow small tiles -- the
    tile minimizing total padded rows wins: production bucket lengths are
    2^k+1-shaped (data/pipeline.py::bucket_length), so a fixed T=128 pays
    up to 25% pad where e.g. T=104 pads 1.4% at S=513. Ties prefer the
    larger tile. The heuristic's pick matched the measured-fastest tile at
    every production bucket (tools/bench_banded_attention.py, 2026-08-19)."""
    w8 = -(-max(int(lookback), 1) // 8) * 8
    lo, hi = max(104, w8), max(128, w8)
    if seq_len is None:
        return hi
    best, best_rows = hi, -(-int(seq_len) // hi) * hi
    for t in range(hi - 8, lo - 8, -8):
        rows = -(-int(seq_len) // t) * t
        if rows < best_rows:
            best, best_rows = t, rows
    return best


def _banded_kernel(xp_ref, xs_ref, in_w_ref, in_b_ref, out_w_ref,
                   out_b_ref, kbp_ref, kbs_ref, o_ref, *, num_heads: int,
                   lookback: int, seq_len: int, block_rows: int):
    T = block_rows
    E = xs_ref.shape[-1]
    hd = E // num_heads
    i = pl.program_id(1)

    # One projection serves both roles: rows [0, T) are the previous key
    # tile, rows [T, 2T) the self tile -- whose q columns are this tile's
    # queries. (The prev tile's k/v get re-projected by the next grid step;
    # at E=64 that duplicate GEMM is noise next to the skipped scores.)
    ctx_x = jnp.concatenate([xp_ref[0], xs_ref[0]], axis=0)  # [2T, E]
    qkv = jnp.dot(ctx_x.astype(jnp.bfloat16),
                  in_w_ref[...].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + in_b_ref[...]

    # Banded mask for this tile, computed on the fly (cheap [T, 2T]
    # compares -- no [S, S] materialisation, no integer division).
    a = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * T), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * T), 1)
    qpos = i * T + a
    kpos = (i - 1) * T + j
    band = (kpos <= qpos) & (kpos >= qpos - lookback)
    valid = (kpos >= 0) & (kpos < seq_len)
    # Self key stays attendable (j == a + T) so no row is all -inf: the
    # tail-padding query rows are sliced off by the caller, and fully
    # key_bias-masked real rows match the jnp paths' uniform-over-band.
    mask = (band & valid) | (j == a + T)

    bias = None
    if kbp_ref is not None:
        # Keep the reads 2D ([1, T]) -- Mosaic handles 2D concat/broadcast
        # where 1D vectors hit layout restrictions (see ops/attention.py's
        # keyb_ref handling).
        bias = jnp.concatenate(
            [kbp_ref[0, 0], kbs_ref[0, 0]], axis=-1)  # [1, 2T]

    scale = 1.0 / float(np.sqrt(hd))
    outs = []
    for h in range(num_heads):
        q = qkv[T:, h * hd:(h + 1) * hd]
        k = qkv[:, E + h * hd:E + (h + 1) * hd]
        v = qkv[:, 2 * E + h * hd:2 * E + (h + 1) * hd]
        s = jnp.dot(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32) * scale
        if bias is not None:
            s = s + bias
        s = jnp.where(mask, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(outs, axis=-1)  # [T, E]
    out = jnp.dot(ctx.astype(jnp.bfloat16),
                  out_w_ref[...].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + out_b_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)


def _banded_mhsa_pallas(x, in_proj_kernel, in_proj_bias, out_proj_kernel,
                        out_proj_bias, num_heads, lookback, block_rows,
                        interpret, key_bias=None):
    N, S, E = x.shape
    T = block_rows or pick_block_rows(lookback, S)
    if T < max(int(lookback), 1):
        raise ValueError(f"block_rows {T} < lookback {lookback}: two key "
                         "tiles no longer cover the band")
    n = -(-S // T)
    pad = n * T - S
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    kernel = functools.partial(
        _banded_kernel, num_heads=num_heads, lookback=int(lookback),
        seq_len=S, block_rows=T)

    def self_map(b, i):
        return (b, i, 0)

    def prev_map(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    in_specs = [
        pl.BlockSpec((1, T, E), prev_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, E), self_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((E, 3 * E), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * E,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, E), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((E,), lambda b, i: (0,), memory_space=pltpu.VMEM),
    ]
    inputs = [x.astype(jnp.float32), x.astype(jnp.float32),
              in_proj_kernel, in_proj_bias, out_proj_kernel, out_proj_bias]
    if key_bias is not None:
        # [N, S] -> [N, n, 1, T]: the explicit size-1 axis keeps the
        # block's last-two dims EQUAL to the array dims (Mosaic rejects a
        # second-to-last block dim that is neither 8-divisible nor full --
        # hardware-only rule, see CLAUDE.md). Pad value 0 is safe: the
        # validity mask already kills padded key positions.
        kb = jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, pad)))
        kb = kb.reshape(N, n, 1, T)
        inputs += [kb, kb]
        in_specs += [
            pl.BlockSpec((1, 1, 1, T), lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, T), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        body = kernel
    else:
        body = lambda *a: kernel(*a[:6], None, None, *a[6:])  # noqa: E731

    flops_tile = (2 * (2 * T) * E * 3 * E
                  + num_heads * 2 * (2 * T * T * (E // num_heads)) * 2
                  + 2 * T * E * E)
    out = pl.pallas_call(
        body,
        grid=(N, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, E), self_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, n * T, E), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * N * n,
            bytes_accessed=3 * N * n * T * E * 4,
            transcendentals=N * n * num_heads * T * 2 * T,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:, :S] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _banded_mhsa(x, iw, ib, ow, ob, key_bias, num_heads, lookback,
                 block_rows, interpret):
    return _banded_mhsa_pallas(x, iw, ib, ow, ob, num_heads, lookback,
                               block_rows, interpret, key_bias=key_bias)


def _banded_mhsa_fwd(x, iw, ib, ow, ob, key_bias, num_heads, lookback,
                     block_rows, interpret):
    out = _banded_mhsa_pallas(x, iw, ib, ow, ob, num_heads, lookback,
                              block_rows, interpret, key_bias=key_bias)
    return out, (x, iw, ib, ow, ob, key_bias)


def _banded_mhsa_bwd(num_heads, lookback, block_rows, interpret, res, g):
    x, iw, ib, ow, ob, key_bias = res
    _, vjp = jax.vjp(
        lambda x, iw, ib, ow, ob: banded_mhsa_reference(
            x, iw, ib, ow, ob, num_heads=num_heads, lookback=lookback,
            key_bias=key_bias),
        x, iw, ib, ow, ob)
    dkb = None if key_bias is None else jnp.zeros_like(key_bias)
    return vjp(g) + (dkb,)


_banded_mhsa.defvjp(_banded_mhsa_fwd, _banded_mhsa_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "lookback", "block_rows", "interpret"))
def banded_mhsa(x: jax.Array,
                in_proj_kernel: jax.Array,
                in_proj_bias: jax.Array,
                out_proj_kernel: jax.Array,
                out_proj_bias: jax.Array,
                *,
                num_heads: int = 4,
                lookback: int,
                key_bias: Optional[jax.Array] = None,
                block_rows: Optional[int] = None,
                interpret: bool = False) -> jax.Array:
    """Banded-causal MHSA over x [N, S, E] in O(S * lookback) compute and
    constant VMEM per tile (any S). Returns [N, S, E] (f32).
    Differentiable (custom VJP via the jnp reference); parameter layout as
    models/attention.py. key_bias: optional [N, S] per-key additive score
    bias (0/-1e30) hiding zero-padded frames of bucketed batches."""
    return _banded_mhsa(x, in_proj_kernel, in_proj_bias, out_proj_kernel,
                        out_proj_bias, key_bias, num_heads, lookback,
                        block_rows, interpret)
