"""Grouped GRU scans for the FTF bottleneck blocks.

The reference runs 4 independent 16-wide torch.nn.GRU modules per block,
one per channel group (reference: models/generator.py:89-111, 205-223).
On TPU that shape is hostile: 4 sequential Python-level RNNs with 16-dim
hidden states leave the MXU idle.

TPU-first redesign:
  * the 4 groups are a single stacked parameter tensor [G, ...] and run as
    ONE `lax.scan` with a group-batched cell (einsum over the group axis);
  * the input projection (which does not depend on the recurrent state) is
    hoisted out of the scan and computed for all timesteps in one large
    matmul that XLA tiles onto the MXU;
  * only the small hidden-to-hidden matmul stays inside the scan, batched
    over (batch x groups) so the systolic array still sees a wide GEMM.

Gate math matches torch.nn.GRU exactly (gate order r, z, n; the reset gate
multiplies the *projected* hidden state) so converted PyTorch weights are
bit-compatible:

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh  (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) n + z h
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["GroupedGRU"]


def _gru_scan(x_proj: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
              h0: jax.Array, reverse: bool) -> jax.Array:
    """Run the recurrent part of a grouped GRU.

    Args:
      x_proj: [S, B, G, 3H] precomputed input projection (+ input bias).
      w_hh:   [G, H, 3H] hidden-to-hidden weights (gate order r,z,n).
      b_hh:   [G, 3H] hidden bias.
      h0:     [B, G, H] initial hidden state.
      reverse: scan the sequence back-to-front (output stays time-aligned).

    Returns:
      ys: [S, B, G, H] hidden states.
    """
    H = w_hh.shape[1]

    def step(h, xp):
        hp = jnp.einsum("bgh,gho->bgo", h, w_hh,
                        preferred_element_type=jnp.float32) + b_hh
        r = jax.nn.sigmoid(xp[..., :H] + hp[..., :H])
        z = jax.nn.sigmoid(xp[..., H:2 * H] + hp[..., H:2 * H])
        n = jnp.tanh(xp[..., 2 * H:] + r * hp[..., 2 * H:])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, x_proj, reverse=reverse)
    return ys


class GroupedGRU(nn.Module):
    """G parallel GRUs over channel groups, fused into one scan.

    Input:  [B, S, G*H] (channel groups concatenated on the last axis,
            matching the reference's torch.chunk split).
    Output: [B, S, G*H]; for bidirectional, forward and backward hidden
            states are SUMMED per group (reference: models/generator.py:105-107).

    On TPU this module's compute almost always runs inside the fused
    FTF-block Pallas kernel (ops/ftf.py), which consumes the raw params
    via return_params=True. The lax.scan path below is the reference
    implementation and serves CPU/GPU and the long-sequence fallback.
    """

    groups: int = 4
    hidden_size: int = 16
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 return_params: bool = False):
        G, H = self.groups, self.hidden_size
        directions = 2 if self.bidirectional else 1

        def init_uniform(key, shape, dtype=jnp.float32):
            # torch.nn.GRU default: U(-1/sqrt(H), 1/sqrt(H))
            bound = 1.0 / (H ** 0.5)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w_ih = self.param("w_ih", init_uniform, (directions, G, H, 3 * H))
        w_hh = self.param("w_hh", init_uniform, (directions, G, H, 3 * H))
        b_ih = self.param("b_ih", init_uniform, (directions, G, 3 * H))
        b_hh = self.param("b_hh", init_uniform, (directions, G, 3 * H))

        if return_params:
            # For the fused FTF-block kernel (ops/ftf.py), which consumes
            # the raw GRU params instead of calling this module.
            return w_ih, w_hh, b_ih, b_hh

        B, S, C = x.shape
        if C != G * H:
            raise ValueError(f"Expected {G * H} channels, got {C}")

        xg = x.reshape(B, S, G, H).transpose(1, 0, 2, 3)  # [S, B, G, H]
        h0 = jnp.zeros((B, G, H), dtype=x.dtype)

        # Hoisted input projection: one big MXU matmul over all timesteps.
        x_proj = jnp.einsum("sbgi,dgio->dsbgo", xg, w_ih,
                            preferred_element_type=jnp.float32)
        x_proj = x_proj + b_ih[:, None, None]

        y = _gru_scan(x_proj[0], w_hh[0], b_hh[0], h0, reverse=False)
        if self.bidirectional:
            y_bwd = _gru_scan(x_proj[1], w_hh[1], b_hh[1], h0, reverse=True)
            y = y + y_bwd

        return y.transpose(1, 0, 2, 3).reshape(B, S, G * H)
