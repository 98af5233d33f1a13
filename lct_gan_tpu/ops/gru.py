"""Grouped-GRU reference math + dense weight packing for the fused
FTF-block kernel (lct_gan_tpu/ops/ftf.py).

The grouped GRU runs inside the fused FTF kernel as a VMEM-resident
lax.fori_loop whose per-step recurrent GEMM uses DENSE gate-major
block-diagonal weight matrices built here (zeros off the group diagonal:
a [chunk_rows, C] x [C, 3C] GEMM is full MXU tiles, one op, where the
grouped form would be G tiny K=16 matmuls).

A standalone Pallas GRU kernel lived here in round 1 ("time-outer grid,
resident carry") but measured only ~1.1x/0.8x vs the XLA scan at our
shapes -- each grid step was one small GEMM + gates, overhead-bound. The
round-2 FTF kernel absorbed the recurrence (same packing, same gate math)
and the standalone kernel was deleted rather than carried as dead weight.

Gate math matches torch.nn.GRU exactly (see models/gru.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grouped_gru_reference", "pack_dense_gru_weights",
           "pack_gate_major_bias"]


def grouped_gru_reference(x, w_ih, w_hh, b_ih, b_hh,
                          bidirectional: bool = False) -> jax.Array:
    """Pure-jnp grouped GRU (the lax.scan formulation from models/gru.py),
    used for the fused FTF kernel's backward pass."""
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
