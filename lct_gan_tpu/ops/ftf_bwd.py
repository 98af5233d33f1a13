"""Pallas TPU kernel: fused BACKWARD pass for the FTF transformer block.

Round-2's forward kernel (ops/ftf.py) left the backward as a pure-jnp
recompute through `ftf_block_reference` -- measured at ~134 ms of the
395 ms GAN train step (B=64, bf16, v5e-1): the recompute re-runs the GRU
as an XLA scan and the attention unfused, then differentiates through
both, all via HBM. This kernel does the whole backward in one
VMEM-resident pass per tile instead.

Key structure (what makes the backward chain as cheap as the forward's):

  * The forward saves the per-direction GRU hidden states (`hid`), so the
    backward never re-runs the forward recurrence. With all h_t known,
    the recurrent-gate pre-activations hp_t = h_{t-1} @ W_hh are ONE big
    MXU GEMM over a time-shifted copy of `hid` (not L small ones), and
    the weight gradients dW_hh = sum_t h_{t-1}^T dhp_t and
    dW_ih = n1^T dxp hoist into single GEMMs after the loop.
  * ALL gate algebra hoists out of the BPTT loop too: with xp/hp known,
    every per-step gradient is dh_t times a per-t constant --
    dhp_t = tile3(dh_t) * K123_t, carry += dh_t * z_t -- where the K
    factors (products of sigmoid/tanh gate values) are computed for every
    t in one vectorized pass before the loop. The sequential chain is
    then just one [BS,3C] multiply + one [BS,3C]x[3C,C] GEMM + one axpy
    per direction per step; no transcendentals on the critical path.
  * Both directions run in the same loop (forward direction walks t
    descending while backward walks ascending), mirroring the forward
    kernel's packed single-chain recurrence.
  * Attention backward is the standard softmax VJP per packed chunk:
    the forward attention is recomputed once (scores GEMM + softmax,
    storing normalized p), then dv = p^T dctx, dp = dctx v^T,
    ds = p*(dp - rowsum(dp*p)), dq = ds k, dk = ds^T q.
  * Parameter gradients accumulate across grid tiles directly in the
    output refs (TPU grid iterations run sequentially on the core).

Gradients match jax.vjp(ftf_block_reference) to bf16-matmul tolerance;
tests/test_pallas_ftf.py gates this in interpret mode. Reference
counterpart: torch autograd through the GRU/MHA modules
(models/generator.py:99-140) -- no hand-written backward exists there.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lct_gan_tpu.ops.attention import _block_mask_bias
from lct_gan_tpu.ops.gru import pack_dense_gru_weights, pack_gate_major_bias

__all__ = ["fused_ftf_bwd", "pick_ftf_bwd_tile",
           "unpack_dense_gru_grads", "unpack_gate_major_bias"]


def pick_ftf_bwd_tile(length: int) -> Tuple[int, int]:
    """(block_seqs, attn_sub) for the backward kernel. Smaller than the
    forward's tiles: the backward holds ~3x the live scratch (saved
    hiddens, per-head softmax weights, gate-gradient buffers)."""
    if length <= 48:
        return 64, 8      # freq axis (L=33): 128 spills past VMEM
    if length <= 160:
        return 32, 2      # time axis (L~129): 64 spills past VMEM
    if length <= 320:
        return 16, 2
    return 8, 1


def unpack_dense_gru_grads(dense: jax.Array, groups: int,
                           hidden: int) -> jax.Array:
    """Inverse of ops.gru.pack_dense_gru_weights for GRADIENTS: extract the
    block-diagonal entries of a dense gate-major [C, 3C] gradient back to
    grouped [G, H, 3H] (off-block entries correspond to structural zeros
    of the packed weight and are discarded)."""
    G, H = groups, hidden
    C = G * H
    rows = []
    for g in range(G):
        gates = [dense[g * H:(g + 1) * H,
                       gate * C + g * H:gate * C + (g + 1) * H]
                 for gate in range(3)]
        rows.append(jnp.concatenate(gates, axis=1))
    return jnp.stack(rows)


def unpack_gate_major_bias(packed: jax.Array, groups: int,
                           hidden: int) -> jax.Array:
    """Inverse of ops.gru.pack_gate_major_bias: [3*G*H] -> [G, 3H]."""
    G, H = groups, hidden
    C = G * H
    rows = []
    for g in range(G):
        gates = [packed[gate * C + g * H:gate * C + (g + 1) * H]
                 for gate in range(3)]
        rows.append(jnp.concatenate(gates))
    return jnp.stack(rows)


def _ln_fwd(x, scale, bias, eps=1e-6):
    """Returns (y, xhat, rstd) for the fast-variance LayerNorm."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu))
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(dy, xhat, rstd, scale):
    """dx for y = xhat*scale + bias (means over the feature axis)."""
    dxh = dy * scale
    return rstd * (dxh - jnp.mean(dxh, axis=-1, keepdims=True) -
                   xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True))


def _ftf_bwd_kernel(x_ref, do_ref, hid_ref,
                    wih_ref, whht_ref, bih_ref, bhh_ref,
                    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                    inw_ref, inwt_ref, inb_ref, outw_ref, outwt_ref,
                    outb_ref, linwt_ref, linb_ref, bias_ref,
                    dx_ref, dln1s_ref, dln1b_ref,
                    dwih_ref, dwhh_ref, dbih_ref, dbhh_ref,
                    dln2s_ref, dln2b_ref,
                    dinw_ref, dinb_ref, doutw_ref, doutb_ref,
                    dlinw_ref, dlinb_ref,
                    xp_scr, hidprev_scr, hp_scr, dg_scr,
                    k123f_scr, k123b_scr, k4f_scr, k4b_scr,
                    k5f_scr, k5b_scr, dhf_scr, dhb_scr,
                    qkv_scr, p_scr, ctx_scr, dctx_scr, dqkv_scr,
                    *, directions: int, num_heads: int, sub: int,
                    valid_len: int, pad_len: int, freq_concat: bool,
                    precise: bool):
    BS, L, C = x_ref.shape
    assert L == valid_len
    Lp = pad_len
    D = directions
    hd = C // num_heads
    n_sub = BS // sub
    R = sub * Lp
    f32 = jnp.float32
    # cd: MXU input dtype. bf16 keeps GEMMs fast (f32 accumulation); the
    # `precise` mode (all-f32, used by the structural grad-parity test)
    # proves the wiring exact. Recurrence scratches (xp/hp/dxp/dhp) are
    # f32 either way: gate nonlinearities amplify storage rounding.
    cd = f32 if precise else jnp.bfloat16
    i = pl.program_id(0)

    def acc(ref, val):
        @pl.when(i == 0)
        def _():
            ref[...] = val

        @pl.when(i > 0)
        def _():
            ref[...] = ref[...] + val

    def rowsumk(v):  # [rows, X] -> [1, X] f32
        return jnp.sum(v.astype(f32), axis=0, keepdims=True)

    # Blocks arrive at the true L; pad to the aligned Lp on the
    # VMEM-resident values (ragged-L, like the forward kernel) instead of
    # three host-side whole-array pads (x, dout, hid -- measured ~1.5 ms
    # of HBM copies per block in the train step).
    def lpad(v):
        if Lp == L:
            return v
        return jnp.pad(v, ((0, 0), (0, Lp - L), (0, 0)))

    x = lpad(x_ref[...])                              # [BS, Lp, C] f32
    do = lpad(do_ref[...])
    hid = lpad(hid_ref[...])                          # [BS, Lp, D*C]

    g = hid[..., :C]
    if D == 2:
        g = g + hid[..., C:]
    s = x + g
    s_flat = s.reshape(BS * Lp, C)
    do_flat = do.reshape(BS * Lp, C)
    g_flat = g.reshape(BS * Lp, C)

    # ---- recompute through LN2 -> qkv -> attention (store p, ctx) ----
    n2, xhat2, rstd2 = _ln_fwd(s_flat, ln2s_ref[...], ln2b_ref[...])
    qkv = jnp.dot(n2.astype(cd), inw_ref[...].astype(cd),
                  preferred_element_type=f32) + inb_ref[...]
    qkv_scr[...] = qkv.astype(qkv_scr.dtype).reshape(n_sub, R, 3 * C)

    scale = 1.0 / float(np.sqrt(hd))
    bias = bias_ref[...]

    def fwd_chunk(c, _):
        qm = qkv_scr[c]
        parts = []
        for h in range(num_heads):
            q = qm[:, h * hd:(h + 1) * hd]
            k = qm[:, C + h * hd:C + (h + 1) * hd]
            v = qm[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            sc = jnp.dot(q, k.T, preferred_element_type=f32) * scale + bias
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp(sc - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-20
            pn = p / denom
            p_scr[c, h] = pn.astype(p_scr.dtype)
            ctx = jnp.dot(pn.astype(cd), v, preferred_element_type=f32)
            parts.append(ctx)
        ctx_scr[c] = jnp.concatenate(parts, axis=-1).astype(ctx_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n_sub, fwd_chunk, 0)

    ctx_flat = ctx_scr[...].reshape(BS * Lp, C)
    a = jnp.dot(ctx_flat, outw_ref[...].astype(cd),
                preferred_element_type=f32) + outb_ref[...]

    # ---- combine layer recompute + LeakyReLU backward ----
    linwt = linwt_ref[...]                            # [C, lin_in]
    if freq_concat:
        comb_pre = (jnp.dot(g_flat.astype(cd), linwt[:, :C].T.astype(cd),
                            preferred_element_type=f32) +
                    jnp.dot(a.astype(cd), linwt[:, C:].T.astype(cd),
                            preferred_element_type=f32) + linb_ref[...])
    else:
        comb_pre = jnp.dot(a.astype(cd), linwt.T.astype(cd),
                           preferred_element_type=f32) + linb_ref[...]
    dcomb = do_flat * jnp.where(comb_pre >= 0, 1.0, 0.2)

    acc(dlinb_ref, rowsumk(dcomb))
    dcomb_bf = dcomb.astype(cd)
    dga = jnp.dot(dcomb_bf, linwt_ref[...].astype(cd),
                  preferred_element_type=f32)          # [rows, lin_in]
    if freq_concat:
        dg_lin = dga[:, :C]
        da = dga[:, C:]
        acc(dlinw_ref, jnp.concatenate([
            jax.lax.dot_general(g_flat.astype(cd), dcomb_bf,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32),
            jax.lax.dot_general(a.astype(cd), dcomb_bf,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)], axis=0))
    else:
        dg_lin = None
        da = dga
        acc(dlinw_ref,
            jax.lax.dot_general(a.astype(cd), dcomb_bf,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32))

    # ---- attention output projection backward ----
    acc(doutb_ref, rowsumk(da))
    da_bf = da.astype(cd)
    acc(doutw_ref,
        jax.lax.dot_general(ctx_flat, da_bf, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32))
    dctx = jnp.dot(da_bf, outwt_ref[...].astype(cd),
                   preferred_element_type=f32)
    dctx_scr[...] = dctx.astype(dctx_scr.dtype).reshape(n_sub, R, C)

    # ---- attention core backward per chunk ----
    def bwd_chunk(c, _):
        qm = qkv_scr[c]
        dcm = dctx_scr[c]
        dqs, dks, dvs = [], [], []
        for h in range(num_heads):
            q = qm[:, h * hd:(h + 1) * hd]
            k = qm[:, C + h * hd:C + (h + 1) * hd]
            v = qm[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            pn = p_scr[c, h]
            dctx_h = dcm[:, h * hd:(h + 1) * hd]
            dv = jax.lax.dot_general(pn, dctx_h, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dp = jax.lax.dot_general(dctx_h, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
            pf = pn.astype(f32)
            dsoft = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
            dsoft_bf = dsoft.astype(cd)
            dq = jnp.dot(dsoft_bf, k, preferred_element_type=f32) * scale
            dk = jax.lax.dot_general(dsoft_bf, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32) * scale
            dqs.append(dq)
            dks.append(dk)
            dvs.append(dv)
        dqkv_scr[c] = jnp.concatenate(
            dqs + dks + dvs, axis=-1).astype(dqkv_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n_sub, bwd_chunk, 0)

    dqkv_flat = dqkv_scr[...].reshape(BS * Lp, 3 * C)
    acc(dinb_ref, rowsumk(dqkv_flat))
    acc(dinw_ref,
        jax.lax.dot_general(n2.astype(cd), dqkv_flat,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=f32))
    dn2 = jnp.dot(dqkv_flat, inwt_ref[...].astype(cd),
                  preferred_element_type=f32)

    # ---- LN2 backward; assemble ds and the GRU output cotangent ----
    acc(dln2s_ref, rowsumk(dn2 * xhat2))
    acc(dln2b_ref, rowsumk(dn2))
    ds = do_flat + _ln_bwd(dn2, xhat2, rstd2, ln2s_ref[...])
    dg_total = ds + dg_lin if freq_concat else ds
    dg_scr[...] = jnp.transpose(dg_total.reshape(BS, Lp, C), (1, 0, 2))

    # ---- GRU recompute: n1, xp, shifted hiddens, hp (all big GEMMs) ----
    xt = jnp.transpose(x, (1, 0, 2))                  # [Lp, BS, C]
    n1, xhat1, rstd1 = _ln_fwd(xt.reshape(Lp * BS, C),
                               ln1s_ref[...], ln1b_ref[...])
    xp = jnp.dot(n1.astype(cd), wih_ref[...].astype(cd),
                 preferred_element_type=f32) + bih_ref[...]
    xp_scr[...] = xp.reshape(Lp, BS, D * 3 * C)

    htm = jnp.transpose(hid, (1, 0, 2))               # [Lp, BS, D*C]
    zrow = jnp.zeros((1, BS, C), f32)
    fwdprev = jnp.concatenate([zrow, htm[:Lp - 1, :, :C]], axis=0)
    if D == 2:
        bwdprev = jnp.concatenate([htm[1:Lp, :, C:], zrow], axis=0)
        hidprev = jnp.concatenate([fwdprev, bwdprev], axis=-1)
    else:
        hidprev = fwdprev
    hidprev_scr[...] = hidprev
    # hp_t = h_prev @ W_hh + b_hh for every t at once (whht_ref holds the
    # per-direction W_hh stacked [D, C, 3C]; block-diag against hidprev).
    hp_parts = [jnp.dot(hidprev.reshape(Lp * BS, D * C)[:, d * C:(d + 1) * C]
                        .astype(cd), whht_ref[d].astype(cd),
                        preferred_element_type=f32)
                for d in range(D)]
    hp = jnp.concatenate(hp_parts, axis=-1) + bhh_ref[...]
    hp_scr[...] = hp.reshape(Lp, BS, D * 3 * C)

    # ---- hoisted gate algebra (one vectorized pass, no loop) ----
    # With xp/hp/hprev known for every t, each per-step gradient is dh_t
    # times a per-t constant:
    #   drp  = dh * K1,  K1 = P * hp_n * r(1-r)      (P = (1-z)(1-n^2))
    #   dzp  = dh * K2,  K2 = (hprev - n) * z(1-z)
    #   dhp_n= dh * K3,  K3 = P * r
    #   dxp_n= dh * K4,  K4 = P
    #   dhprev direct term = dh * z
    # so the BPTT loop below carries only multiplies + the carry GEMM; all
    # sigmoid/tanh evaluation happens here, off the sequential chain.
    xp_full = xp_scr[...]                             # [Lp, BS, D*3C]
    hp_full = hp_scr[...]
    for d in range(D):
        xpd = xp_full[..., d * 3 * C:(d + 1) * 3 * C]
        hpd = hp_full[..., d * 3 * C:(d + 1) * 3 * C]
        hprev_d = hidprev_scr[...][..., d * C:(d + 1) * C]
        r = jax.nn.sigmoid(xpd[..., :C] + hpd[..., :C])
        z = jax.nn.sigmoid(xpd[..., C:2 * C] + hpd[..., C:2 * C])
        n = jnp.tanh(xpd[..., 2 * C:] + r * hpd[..., 2 * C:])
        p_fac = (1.0 - z) * (1.0 - jnp.square(n))
        k1 = p_fac * hpd[..., 2 * C:] * r * (1.0 - r)
        k2 = (hprev_d - n) * z * (1.0 - z)
        k123 = jnp.concatenate([k1, k2, p_fac * r], axis=-1)
        if d == 0:
            k123f_scr[...] = k123
            k4f_scr[...] = p_fac
            k5f_scr[...] = z
        else:
            k123b_scr[...] = k123
            k4b_scr[...] = p_fac
            k5b_scr[...] = z

    # ---- BPTT: one chain, both directions; per dir/step just one
    # [BS,3C] multiply + one [BS,3C]x[3C,C] GEMM + one axpy ----
    whht = whht_ref[...]

    def step(j, carry):
        tf = L - 1 - j
        dhf = carry[:, :C] + dg_scr[tf]
        dhf_scr[tf] = dhf
        dhp_f = jnp.concatenate([dhf, dhf, dhf], axis=-1) * k123f_scr[tf]
        cf = dhf * k5f_scr[tf] + jax.lax.dot_general(
            dhp_f.astype(cd), whht[0].astype(cd),
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        if D == 2:
            tb = j
            dhb = carry[:, C:] + dg_scr[tb]
            dhb_scr[tb] = dhb
            dhp_b = jnp.concatenate([dhb, dhb, dhb], axis=-1) * k123b_scr[tb]
            cb = dhb * k5b_scr[tb] + jax.lax.dot_general(
                dhp_b.astype(cd), whht[1].astype(cd),
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            return jnp.concatenate([cf, cb], axis=-1)
        return cf

    jax.lax.fori_loop(0, L, step, jnp.zeros((BS, D * C), f32))
    for t in range(L, Lp):  # padded rows: keep accumulation GEMMs finite
        dhf_scr[t] = jnp.zeros((BS, C), f32)
        if D == 2:
            dhb_scr[t] = jnp.zeros((BS, C), f32)

    # ---- hoisted GRU weight/bias/input grads ----
    # dhp/dxp for all t reconstruct vectorized from the stored dh chain.
    dhf3 = jnp.concatenate([dhf_scr[...]] * 3, axis=-1)
    dhps = [(dhf3 * k123f_scr[...]).reshape(Lp * BS, 3 * C)]
    dxps = [jnp.concatenate(
        [dhf3[..., :2 * C] * k123f_scr[...][..., :2 * C],
         dhf_scr[...] * k4f_scr[...]], axis=-1).reshape(Lp * BS, 3 * C)]
    if D == 2:
        dhb3 = jnp.concatenate([dhb_scr[...]] * 3, axis=-1)
        dhps.append((dhb3 * k123b_scr[...]).reshape(Lp * BS, 3 * C))
        dxps.append(jnp.concatenate(
            [dhb3[..., :2 * C] * k123b_scr[...][..., :2 * C],
             dhb_scr[...] * k4b_scr[...]], axis=-1).reshape(Lp * BS, 3 * C))
    n1_cd = n1.astype(cd)
    hidprev_flat = hidprev_scr[...].reshape(Lp * BS, D * C)
    acc(dwih_ref, jnp.stack([
        jax.lax.dot_general(n1_cd, dxps[d].astype(cd), (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        for d in range(D)]))
    acc(dwhh_ref, jnp.stack([
        jax.lax.dot_general(hidprev_flat[:, d * C:(d + 1) * C].astype(cd),
                            dhps[d].astype(cd),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        for d in range(D)]))
    acc(dbih_ref, jnp.concatenate([rowsumk(dxps[d])
                                   for d in range(D)], axis=-1))
    acc(dbhh_ref, jnp.concatenate([rowsumk(dhps[d])
                                   for d in range(D)], axis=-1))

    dn1 = jnp.dot(dxps[0].astype(cd), wih_ref[...][:, :3 * C].T.astype(cd),
                  preferred_element_type=f32)
    if D == 2:
        dn1 = dn1 + jnp.dot(dxps[1].astype(cd),
                            wih_ref[...][:, 3 * C:].T.astype(cd),
                            preferred_element_type=f32)

    # ---- LN1 backward + final dx ----
    acc(dln1s_ref, rowsumk(dn1 * xhat1))
    acc(dln1b_ref, rowsumk(dn1))
    dx_tm = _ln_bwd(dn1, xhat1, rstd1, ln1s_ref[...])
    dx = ds.reshape(BS, Lp, C) + jnp.transpose(
        dx_tm.reshape(Lp, BS, C), (1, 0, 2))
    dx_ref[...] = dx[:, :L]


def fused_ftf_bwd(x, ln1s, ln1b, w_ih, w_hh, b_ih, b_hh, ln2s, ln2b,
                  in_w, in_b, out_w, out_b, lin_w, lin_b, hid, dout,
                  *, bidirectional: bool, num_heads: int,
                  lookback: Optional[int], block_seqs: Optional[int] = None,
                  sub: Optional[int] = None, interpret: bool = False,
                  precise: bool = False):
    """Backward for the fused FTF block. Inputs are the forward's primal
    args + the saved per-direction hidden states `hid` [N, L, D*C] and the
    output cotangent `dout` [N, L, C]. Returns grads in the same order/
    layouts as the primal args (w_ih etc. back in GroupedGRU layout)."""
    N, L, C = x.shape
    D = 2 if bidirectional else 1
    _, G, H, _ = w_ih.shape
    if block_seqs is None or sub is None:
        auto_bs, auto_sub = pick_ftf_bwd_tile(L)
        block_seqs = block_seqs or auto_bs
        sub = sub or auto_sub
    block_seqs = min(block_seqs, max(sub, ((N + 7) // 8) * 8))
    if block_seqs % sub:
        raise ValueError(f"sub={sub} must divide block_seqs={block_seqs}")

    Lp = -(-L // 8) * 8
    if (sub * Lp) % 16:
        Lp = -(-L // 16) * 16
    pad = (-N) % block_seqs
    if pad:
        padder = ((0, pad), (0, 0), (0, 0))
        x = jnp.pad(x, padder)
        dout = jnp.pad(dout, padder)
        hid = jnp.pad(hid, padder)
    n_tiles = (N + pad) // block_seqs

    wih_p = jnp.concatenate(
        [pack_dense_gru_weights(w_ih[d]) for d in range(D)], axis=1)
    whh_t = jnp.stack([pack_dense_gru_weights(w_hh[d]) for d in range(D)])
    bih_p = jnp.concatenate(
        [pack_gate_major_bias(b_ih[d]) for d in range(D)])
    bhh_p = jnp.concatenate(
        [pack_gate_major_bias(b_hh[d]) for d in range(D)])

    R = sub * Lp
    bias = jnp.asarray(_block_mask_bias(sub, Lp, lookback, valid_len=L))
    freq_concat = lin_w.shape[0] == 2 * C
    lin_in = lin_w.shape[0]

    kernel = functools.partial(
        _ftf_bwd_kernel, directions=D, num_heads=num_heads, sub=sub,
        valid_len=L, pad_len=Lp, freq_concat=freq_concat, precise=precise)

    def _full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    tile = pl.BlockSpec((block_seqs, L, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tile_h = pl.BlockSpec((block_seqs, L, D * C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((N + pad, L, C), jnp.float32),       # dx
        jax.ShapeDtypeStruct((1, C), jnp.float32),                # dln1s
        jax.ShapeDtypeStruct((1, C), jnp.float32),                # dln1b
        jax.ShapeDtypeStruct((D, C, 3 * C), jnp.float32),         # dwih
        jax.ShapeDtypeStruct((D, C, 3 * C), jnp.float32),         # dwhh
        jax.ShapeDtypeStruct((1, D * 3 * C), jnp.float32),        # dbih
        jax.ShapeDtypeStruct((1, D * 3 * C), jnp.float32),        # dbhh
        jax.ShapeDtypeStruct((1, C), jnp.float32),                # dln2s
        jax.ShapeDtypeStruct((1, C), jnp.float32),                # dln2b
        jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),            # dinw
        jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),            # dinb
        jax.ShapeDtypeStruct((C, C), jnp.float32),                # doutw
        jax.ShapeDtypeStruct((1, C), jnp.float32),                # doutb
        jax.ShapeDtypeStruct((lin_in, C), jnp.float32),           # dlinw
        jax.ShapeDtypeStruct((1, C), jnp.float32),                # dlinb
    )
    out_specs = (tile,) + tuple(
        _full(tuple(s.shape)) for s in out_shapes[1:])

    n_sub = block_seqs // sub
    sdt = jnp.float32 if precise else jnp.bfloat16
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile, tile, tile_h,
            _full((C, D * 3 * C)),            # wih packed
            _full((D, C, 3 * C)),             # whh per-dir dense
            _full((D * 3 * C,)), _full((D * 3 * C,)),
            _full((C,)), _full((C,)), _full((C,)), _full((C,)),
            _full((C, 3 * C)),                # in_w
            _full((3 * C, C)),                # in_w^T
            _full((3 * C,)),
            _full((C, C)), _full((C, C)),     # out_w, out_w^T
            _full((C,)),                      # out_b
            _full((C, lin_in)),               # lin_w^T
            _full((C,)),                      # lin_b
            _full((R, R)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((Lp, block_seqs, D * 3 * C), jnp.float32),  # xp
            pltpu.VMEM((Lp, block_seqs, D * C), jnp.float32),   # hid prev
            pltpu.VMEM((Lp, block_seqs, D * 3 * C), jnp.float32),  # hp
            pltpu.VMEM((Lp, block_seqs, C), jnp.float32),       # dg
            pltpu.VMEM((Lp, block_seqs, 3 * C), jnp.float32),   # K123 fwd
            pltpu.VMEM((Lp, block_seqs, 3 * C) if D == 2 else (8, 8, 3 * C),
                       jnp.float32),                            # K123 bwd
            pltpu.VMEM((Lp, block_seqs, C), jnp.float32),       # K4 fwd
            pltpu.VMEM((Lp, block_seqs, C) if D == 2 else (8, 8, C),
                       jnp.float32),                            # K4 bwd
            pltpu.VMEM((Lp, block_seqs, C), jnp.float32),       # K5 fwd
            pltpu.VMEM((Lp, block_seqs, C) if D == 2 else (8, 8, C),
                       jnp.float32),                            # K5 bwd
            pltpu.VMEM((Lp, block_seqs, C), jnp.float32),       # dh fwd
            pltpu.VMEM((Lp, block_seqs, C) if D == 2 else (8, 8, C),
                       jnp.float32),                            # dh bwd
            pltpu.VMEM((n_sub, R, 3 * C), sdt),                 # qkv
            pltpu.VMEM((n_sub, num_heads, R, R), sdt),          # softmax p
            pltpu.VMEM((n_sub, R, C), sdt),                     # ctx
            pltpu.VMEM((n_sub, R, C), sdt),                     # dctx
            pltpu.VMEM((n_sub, R, 3 * C), sdt),                 # dqkv
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(jnp.float32), dout.astype(jnp.float32),
      hid.astype(jnp.float32),
      wih_p, whh_t, bih_p, bhh_p, ln1s, ln1b, ln2s, ln2b,
      in_w, in_w.T, in_b, out_w, out_w.T, out_b, lin_w.T, lin_b, bias)

    (dx, dln1s, dln1b, dwih_d, dwhh_d, dbih_p, dbhh_p, dln2s, dln2b,
     dinw, dinb, doutw, doutb, dlinw, dlinb) = outs

    dx = dx[:N] if pad else dx
    dw_ih = jnp.stack([unpack_dense_gru_grads(dwih_d[d], G, H)
                       for d in range(D)])
    dw_hh = jnp.stack([unpack_dense_gru_grads(dwhh_d[d], G, H)
                       for d in range(D)])
    db_ih = jnp.stack([unpack_gate_major_bias(dbih_p[0, d * 3 * C:
                                                     (d + 1) * 3 * C], G, H)
                       for d in range(D)])
    db_hh = jnp.stack([unpack_gate_major_bias(dbhh_p[0, d * 3 * C:
                                                     (d + 1) * 3 * C], G, H)
                       for d in range(D)])
    return (dx, dln1s[0], dln1b[0], dw_ih, dw_hh, db_ih, db_hh,
            dln2s[0], dln2b[0], dinw, dinb[0], doutw, doutb[0],
            dlinw, dlinb[0])
