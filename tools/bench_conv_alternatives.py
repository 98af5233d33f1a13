"""Micro-bench: each discriminator conv layer config, XLA conv vs a
tap-unrolled GEMM formulation, fwd / wgrad / igrad, on the real TPU.

The MSD backward measured 5.3x its forward (bf16, B=64) -- this locates
which layer configs are slow and whether expressing the conv as
sum_k x[:, k::s] @ W_k (K clean MXU GEMMs; grads are also clean GEMMs
under autodiff) beats XLA's conv lowering for them.

Run: python tools/bench_conv_alternatives.py

POSTSCRIPT (r3, 2026-08-17): the last untried road -- a hand-written
Pallas kernel packing co across merged groups onto the 128 MXU lanes
(phase-view input [n_rows, C*s], Q=ceil(k/s) shift-GEMMs, custom VJP
with dgrad/wgrad kernels of the transposed structure) -- was built,
parity-tested, and benched: fwd 5.8-8.7 ms vs XLA 4.0-4.7 standalone
(XLA in-step is ~1.5 via better inter-op layouts). Its GEMMs sustained
~96 TF/s issued; the merge x block-diagonal waste divides that to the
same ~6 TF/s useful ceiling every other formulation hits, and sublane
shifts measured only ~10% overhead. Conclusion: the wall is intrinsic
to 16-out-channel groups, closed in all three directions (XLA rewrite,
dense-ification, hand kernel). See CLAUDE.md perf ledger.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from lct_gan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

B = 64
DT = jnp.bfloat16

# (name, T_in, K, stride, Cin, Cout, groups, pad)
MSD_LAYERS = [
    ("msd.L1", 32000, 15, 1, 1, 16, 1, 7),
    ("msd.L2", 32000, 41, 4, 16, 64, 4, 20),
    ("msd.L3", 8000, 41, 4, 64, 256, 16, 20),
    ("msd.L4", 2000, 41, 4, 256, 1024, 64, 20),
    ("msd.L5", 500, 41, 4, 1024, 1024, 256, 20),
    ("msd.L6", 125, 5, 1, 1024, 1024, 1, 2),
    ("msd.post", 125, 3, 1, 1024, 1, 1, 1),
]


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.time() - t0) / iters * 1000


def conv_xla(x, w, stride, pad, groups):
    return jax.lax.conv_general_dilated(
        x.astype(DT), w.astype(DT), (stride,), ((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups, preferred_element_type=DT)


def conv_taps(x, w, stride, pad, groups):
    """sum_k x[:, k::s] @ W_k as grouped einsum per tap."""
    K = w.shape[0]
    T = x.shape[1]
    Tp = T + 2 * pad
    Tout = (Tp - K) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0))).astype(DT)
    Cin_g = w.shape[1]
    Cout = w.shape[2]
    g = groups
    wg = w.reshape(K, Cin_g, g, Cout // g).astype(DT)
    acc = None
    for k in range(K):
        xk = jax.lax.slice(xp, (0, k, 0), (B, k + (Tout - 1) * stride + 1,
                                           g * Cin_g), (1, stride, 1))
        xkg = xk.reshape(B, Tout, g, Cin_g)
        yk = jnp.einsum("btgi,igo->btgo", xkg, wg[k],
                        preferred_element_type=DT)
        acc = yk if acc is None else acc + yk
    return acc.reshape(B, Tout, Cout)


rng = np.random.default_rng(0)
print(f"B={B} dtype=bf16; times in ms (fwd / +wgrad / +igrad)")
for name, T, K, s, Ci, Co, g, pad in MSD_LAYERS:
    x = jnp.asarray(rng.standard_normal((B, T, Ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, Ci // g, Co)).astype(np.float32)
                    * 0.05)
    for label, conv in (("xla ", conv_xla), ("taps", conv_taps)):
        f = jax.jit(lambda x, w, conv=conv: jnp.sum(
            conv(x, w, s, pad, g).astype(jnp.float32) ** 2))
        wg_ = jax.jit(jax.grad(lambda w, x, conv=conv: jnp.sum(
            conv(x, w, s, pad, g).astype(jnp.float32) ** 2)))
        ig = jax.jit(jax.grad(lambda x, w, conv=conv: jnp.sum(
            conv(x, w, s, pad, g).astype(jnp.float32) ** 2)))
        try:
            tf_ = timeit(f, x, w)
            tw = timeit(wg_, w, x)
            ti = timeit(ig, x, w)
            print(f"{name:9s} {label}: {tf_:7.2f} / {tw:7.2f} / {ti:7.2f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:9s} {label}: FAILED {type(e).__name__}", flush=True)


def conv_phase(x, w, stride, pad, groups):
    """Stride-s conv as s stride-1 convs over phase-split input: the
    gradients of stride-1 convs avoid XLA's dilated lowering."""
    if stride == 1:
        return conv_xla(x, w, stride, pad, groups)
    K = w.shape[0]
    s = stride
    B_, T, C = x.shape
    Tp = T + 2 * pad
    Tout = (Tp - K) // s + 1
    U = -(-Tp // s)
    xp = jnp.pad(x, ((0, 0), (pad, pad + U * s - Tp), (0, 0))).astype(DT)
    xs = xp.reshape(B_, U, s, C)
    acc = None
    for p in range(K % s, -1, -1) if False else range(s):
        wp = w[p::s].astype(DT)                    # [taps_p, Cin_g, Co]
        lhs = xs[:, :, p, :]
        yk = jax.lax.conv_general_dilated(
            lhs, wp, (1,), ((0, 0),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups, preferred_element_type=DT)
        yk = yk[:, :Tout]
        acc = yk if acc is None else acc + yk
    return acc


def conv_2d(x, w, stride, pad, groups):
    """Stride-s conv as a single 2D conv over [U, s] phase layout."""
    if stride == 1:
        return conv_xla(x, w, stride, pad, groups)
    K = w.shape[0]
    s = stride
    B_, T, C = x.shape
    Tp = T + 2 * pad
    Tout = (Tp - K) // s + 1
    taps = -(-K // s)
    U = -(-Tp // s)
    xp = jnp.pad(x, ((0, 0), (pad, pad + U * s - Tp), (0, 0))).astype(DT)
    xs = xp.reshape(B_, U, s, C)
    w2 = jnp.zeros((taps, s) + w.shape[1:], w.dtype)
    for k in range(K):
        w2 = w2.at[k // s, k % s].set(w[k])
    y = jax.lax.conv_general_dilated(
        xs, w2.astype(DT), (1, s), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=DT)
    return y[:, :Tout, 0, :]


if __name__ == "__main__" and "--phase" in sys.argv:
    print("\nphase/2d variants:")
    for name, T, K, s, Ci, Co, g, pad in MSD_LAYERS[1:5]:
        x = jnp.asarray(rng.standard_normal((B, T, Ci)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((K, Ci // g, Co)).astype(np.float32) * 0.05)
        ref = conv_xla(x, w, s, pad, g)
        for label, conv in (("phase", conv_phase), ("2d   ", conv_2d)):
            got = conv(x, w, s, pad, g)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                        ref.astype(jnp.float32))))
            f = jax.jit(lambda x, w, conv=conv: jnp.sum(
                conv(x, w, s, pad, g).astype(jnp.float32) ** 2))
            wg_ = jax.jit(jax.grad(lambda w, x, conv=conv: jnp.sum(
                conv(x, w, s, pad, g).astype(jnp.float32) ** 2)))
            ig = jax.jit(jax.grad(lambda x, w, conv=conv: jnp.sum(
                conv(x, w, s, pad, g).astype(jnp.float32) ** 2)))
            tf_ = timeit(f, x, w); tw = timeit(wg_, w, x); ti = timeit(ig, x, w)
            print(f"{name:9s} {label}: {tf_:7.2f} / {tw:7.2f} / {ti:7.2f}"
                  f"  maxerr={err:.3f}", flush=True)


def conv_fold(x, w, stride, pad, groups):
    """Stride-s conv1d as ONE stride-1 conv over phase-folded channels:
    x [B,T,C] -> [B,T/s,s*C] (per-group channel order (p, ci)), kernel
    [K,Ci,Co] -> [ceil(K/s), s*Ci, Co] zero-padded. No strided or dilated
    conv appears in the forward OR its gradients."""
    if stride == 1:
        return conv_xla(x, w, stride, pad, groups)
    K, cin_g, Co = w.shape
    s = stride
    B_, T, C = x.shape
    Tp = T + 2 * pad
    Tout = (Tp - K) // s + 1
    K2 = -(-K // s)
    U = max(-(-Tp // s), Tout + K2 - 1)
    xp = jnp.pad(x, ((0, 0), (pad, pad + U * s - Tp), (0, 0))).astype(DT)
    g = groups
    xs = xp.reshape(B_, U, s, g, cin_g)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4)).reshape(B_, U, s * C)
    w2 = jnp.zeros((K2, s, cin_g, Co), w.dtype)
    for k in range(K):
        w2 = w2.at[k // s, k % s].set(w[k])
    w2 = w2.reshape(K2, s * cin_g, Co)
    y = jax.lax.conv_general_dilated(
        xs, w2.astype(DT), (1,), ((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g, preferred_element_type=DT)
    return y[:, :Tout]


if __name__ == "__main__" and "--fold" in sys.argv:
    print("\nfold variant:")
    for name, T, K, s, Ci, Co, g, pad in MSD_LAYERS[1:5]:
        x = jnp.asarray(rng.standard_normal((B, T, Ci)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((K, Ci // g, Co)).astype(np.float32) * 0.05)
        ref = conv_xla(x, w, s, pad, g)
        got = conv_fold(x, w, s, pad, g)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                    ref.astype(jnp.float32))))
        f = jax.jit(lambda x, w: jnp.sum(
            conv_fold(x, w, s, pad, g).astype(jnp.float32) ** 2))
        wg_ = jax.jit(jax.grad(lambda w, x: jnp.sum(
            conv_fold(x, w, s, pad, g).astype(jnp.float32) ** 2)))
        ig = jax.jit(jax.grad(lambda x, w: jnp.sum(
            conv_fold(x, w, s, pad, g).astype(jnp.float32) ** 2)))
        tf_ = timeit(f, x, w); tw = timeit(wg_, w, x); ti = timeit(ig, x, w)
        print(f"{name:9s} fold : {tf_:7.2f} / {tw:7.2f} / {ti:7.2f}"
              f"  maxerr={err:.3f}", flush=True)
