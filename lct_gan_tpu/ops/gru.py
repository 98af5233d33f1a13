"""Pallas TPU kernel: fused grouped-GRU scan.

The FTF bottleneck's grouped GRUs are 16-wide per group -- under XLA the
recurrent step is a batch of tiny [., 16] x [16, 48] GEMMs inside a
lax.scan (poor MXU utilization, HBM round trips for the carry).

Kernel structure (v2 -- "time-outer grid, resident carry"):

  * The grid is (L, row_chunks) and TPU grid iterations execute
    sequentially, so time step t runs after t-1 by construction. The
    ENTIRE batch's hidden state ([N, C] f32, ~4 MB at our shapes) lives
    in a VMEM scratch that persists across grid steps -- the recurrence
    never touches HBM.
  * The input projection is ONE whole-sequence XLA GEMM outside the
    kernel, stored time-major in bf16; BlockSpec streams one (t, chunk)
    tile per grid step (double-buffered by the pipeline).
  * Group weights are packed into DENSE gate-major block-diagonal
    matrices [C, 3C] (zeros off-diagonal), so the per-step recurrent
    GEMM is [chunk_rows, C] x [C, 3C] -- full MXU tiles, one op.
  * Bidirectional blocks run a second pass with reversed index maps and
    the two direction outputs are summed (the model sums directions,
    reference: models/generator.py:105-107).

Gate math matches torch exactly (see models/gru.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_grouped_gru", "grouped_gru_reference",
           "pack_dense_gru_weights", "pack_gate_major_bias"]


def grouped_gru_reference(x, w_ih, w_hh, b_ih, b_hh,
                          bidirectional: bool = False) -> jax.Array:
    """Pure-jnp grouped GRU (the lax.scan formulation from models/gru.py),
    used for the Pallas kernel's backward pass."""
    N, L, C = x.shape
    D, G, H, _ = w_ih.shape

    xg = x.reshape(N, L, G, H).transpose(1, 0, 2, 3)  # [L, N, G, H]
    h0 = jnp.zeros((N, G, H), dtype=jnp.float32)

    def run(d, reverse):
        xp = jnp.einsum("sbgi,gio->sbgo", xg, w_ih[d],
                        preferred_element_type=jnp.float32) + b_ih[d]

        def step(h, xpt):
            hp = jnp.einsum("bgh,gho->bgo", h, w_hh[d],
                            preferred_element_type=jnp.float32) + b_hh[d]
            r = jax.nn.sigmoid(xpt[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xpt[..., H:2 * H] + hp[..., H:2 * H])
            n = jnp.tanh(xpt[..., 2 * H:] + r * hp[..., 2 * H:])
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        _, ys = jax.lax.scan(step, h0, xp, reverse=reverse)
        return ys

    y = run(0, False)
    if bidirectional:
        y = y + run(1, True)
    return y.transpose(1, 0, 2, 3).reshape(N, L, C)


def pack_dense_gru_weights(w: jax.Array) -> jax.Array:
    """[G, H, 3H] grouped weights -> dense gate-major block-diagonal
    [G*H, 3*G*H].

    Column layout: [r(all groups) | z(all groups) | n(all groups)], each
    G*H wide; block g occupies rows g*H..(g+1)*H and, within each gate
    section, columns g*H..(g+1)*H.
    """
    G, H, threeH = w.shape
    C = G * H
    dense = jnp.zeros((C, 3 * C), w.dtype)
    for g in range(G):
        for gate in range(3):
            dense = dense.at[g * H:(g + 1) * H,
                             gate * C + g * H:gate * C + (g + 1) * H].set(
                                 w[g, :, gate * H:(gate + 1) * H])
    return dense


def pack_gate_major_bias(b: jax.Array) -> jax.Array:
    """[G, 3H] grouped bias -> gate-major [3*G*H]."""
    G, threeH = b.shape
    H = threeH // 3
    return b.reshape(G, 3, H).transpose(1, 0, 2).reshape(3 * G * H)


def _gru_dir_kernel(xp_ref, whh_ref, bhh_ref, o_ref, h_ref,
                    *, chunk_rows: int, channels: int):
    """One direction. Grid (L, chunks); xp_ref block [1, chunk_rows, 3C]
    at (t, c); o_ref block [1, chunk_rows, C] at (t, c); h_ref scratch
    [chunks * chunk_rows, C] persists across the sequential grid."""
    t = pl.program_id(0)
    c = pl.program_id(1)
    C = channels
    lo = c * chunk_rows

    @pl.when(t == 0)
    def _():
        h_ref[pl.ds(lo, chunk_rows), :] = jnp.zeros(
            (chunk_rows, C), jnp.float32)

    h = h_ref[pl.ds(lo, chunk_rows), :]
    xpt = xp_ref[0].astype(jnp.float32)  # [chunk_rows, 3C]
    hp = jnp.dot(h.astype(jnp.bfloat16), whh_ref[...].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32) + bhh_ref[...]
    r = jax.nn.sigmoid(xpt[:, :C] + hp[:, :C])
    z = jax.nn.sigmoid(xpt[:, C:2 * C] + hp[:, C:2 * C])
    n = jnp.tanh(xpt[:, 2 * C:] + r * hp[:, 2 * C:])
    h_new = (1.0 - z) * n + z * h
    h_ref[pl.ds(lo, chunk_rows), :] = h_new
    o_ref[0] = h_new


def _run_direction(xp: jax.Array, whh: jax.Array, bhh: jax.Array,
                   reverse: bool, chunk_rows: int,
                   interpret: bool) -> jax.Array:
    """xp: [L, N, 3C] (bf16); returns hidden states [L, N, C] f32."""
    L, N, threeC = xp.shape
    C = threeC // 3
    chunks = N // chunk_rows

    if reverse:
        xp_map = lambda t, c: (L - 1 - t, c, 0)
        o_map = lambda t, c: (L - 1 - t, c, 0)
    else:
        xp_map = lambda t, c: (t, c, 0)
        o_map = lambda t, c: (t, c, 0)

    kernel = functools.partial(
        _gru_dir_kernel, chunk_rows=chunk_rows, channels=C)
    return pl.pallas_call(
        kernel,
        grid=(L, chunks),
        in_specs=[
            pl.BlockSpec((1, chunk_rows, 3 * C), xp_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda t, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda t, c: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk_rows, C), o_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, N, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * L * N * C * 3 * C,
            bytes_accessed=L * N * (3 * C * 2 + C * 4),
            transcendentals=L * N * 3 * C,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, whh, bhh)


def _fused_grouped_gru_pallas(x, w_ih, w_hh, b_ih, b_hh, bidirectional,
                              block_b, interpret):
    N, L, C = x.shape
    D = w_ih.shape[0]

    # Row chunks: keep the streamed xp tile (bf16) around ~1.5 MB so the
    # double-buffered pipeline + resident carry fit comfortably in VMEM.
    if block_b is None:
        block_b = min(4096, int(2 ** int(np.log2(max(
            8, 1_500_000 // (3 * C * 2))))))
    pad = (-N) % block_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    Np = N + pad

    out = None
    for d in range(D):
        wih_dense = pack_dense_gru_weights(w_ih[d])
        whh_dense = pack_dense_gru_weights(w_hh[d])
        bih = pack_gate_major_bias(b_ih[d])
        bhh = pack_gate_major_bias(b_hh[d])

        # Whole-sequence input projection: one large XLA GEMM, then
        # time-major bf16 for streaming.
        xp = (jnp.einsum("nlc,cf->nlf", x, wih_dense,
                         preferred_element_type=jnp.float32) + bih)
        xp = xp.transpose(1, 0, 2).astype(jnp.bfloat16)  # [L, Np, 3C]

        ys = _run_direction(xp, whh_dense, bhh, reverse=(d == 1),
                            chunk_rows=min(block_b, Np),
                            interpret=interpret)  # [L, Np, C]
        ys = ys.transpose(1, 0, 2)  # [Np, L, C]
        out = ys if out is None else out + ys

    return out[:N] if pad else out


# pallas_call has no autodiff rule; the backward recomputes through the
# jnp reference scan.
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_grouped_gru(x, w_ih, w_hh, b_ih, b_hh, bidirectional, block_b,
                       interpret):
    return _fused_grouped_gru_pallas(x, w_ih, w_hh, b_ih, b_hh,
                                     bidirectional, block_b, interpret)


def _fgg_fwd(x, w_ih, w_hh, b_ih, b_hh, bidirectional, block_b, interpret):
    out = _fused_grouped_gru_pallas(x, w_ih, w_hh, b_ih, b_hh,
                                    bidirectional, block_b, interpret)
    return out, (x, w_ih, w_hh, b_ih, b_hh)


def _fgg_bwd(bidirectional, block_b, interpret, res, g):
    x, w_ih, w_hh, b_ih, b_hh = res
    _, vjp = jax.vjp(
        lambda x, a, b, c, d: grouped_gru_reference(
            x, a, b, c, d, bidirectional=bidirectional),
        x, w_ih, w_hh, b_ih, b_hh)
    return vjp(g)


_fused_grouped_gru.defvjp(_fgg_fwd, _fgg_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("bidirectional", "block_b", "interpret"))
def fused_grouped_gru(x: jax.Array,
                      w_ih: jax.Array,
                      w_hh: jax.Array,
                      b_ih: jax.Array,
                      b_hh: jax.Array,
                      *,
                      bidirectional: bool = False,
                      block_b: Optional[int] = None,
                      interpret: bool = False) -> jax.Array:
    """Fused grouped GRU over x [N, L, C] (C = groups * hidden).

    w_ih/w_hh: [D, G, H, 3H], b_ih/b_hh: [D, G, 3H] -- the GroupedGRU
    param layout (models/gru.py). Returns [N, L, C] f32 (directions
    summed when bidirectional). Differentiable (custom VJP).
    """
    return _fused_grouped_gru(x, w_ih, w_hh, b_ih, b_hh, bidirectional,
                              block_b, interpret)
