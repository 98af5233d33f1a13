"""Inference-forward breakdown on the real TPU.

Times the bench.py headline workload's pieces (B=128 x 2 s f32, no
lengths): full enhance, STFT+magnitude front-end, the generator trunk
(mask prediction, where the convs + fused FTF kernels live), and the
apply_mask+iSTFT back-end -- so inference perf work targets the real
bottleneck. Also probes a bf16-cast generator (params + input cast to
bf16) purely for a POTENTIAL-speedup timing signal; quality would need
separate validation before productizing.

Run: python tools/profile_inference.py [batch] [--seconds 2.0]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from lct_gan_tpu.models.generator import (  # noqa: E402
    LCTGeneratorConfig,
    LctEnhancer,
    LctGenerator,
)
from lct_gan_tpu.sigproc import (  # noqa: E402
    STFTConfig,
    apply_mask,
    istft,
    magnitude,
    stft,
)
from lct_gan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

batch = (int(sys.argv[1]) if len(sys.argv) > 1
         and not sys.argv[1].startswith("-") else 128)
seconds = 2.0
if "--seconds" in sys.argv:
    seconds = float(sys.argv[sys.argv.index("--seconds") + 1])
T = int(16000 * seconds)

enhancer = LctEnhancer()
cfg = STFTConfig(n_fft=512).finalize()
rng = np.random.default_rng(0)
wave = jnp.asarray(rng.standard_normal((batch, T)).astype(np.float32) * .1)
params = jax.jit(enhancer.init)(jax.random.PRNGKey(0), wave)["params"]


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0].astype(jnp.float32))))
    except Exception as e:  # report and continue (probe legs may fail)
        print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0].astype(jnp.float32))))
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:36s} {dt:8.2f} ms  "
          f"({batch * seconds / dt * 1000:7.0f} audio-sec/s)", flush=True)
    return dt


@jax.jit
def full(p, x):
    out, _ = enhancer.apply({"params": p}, x)
    return out


@jax.jit
def front(x):
    s = stft(x, cfg)
    return magnitude(s)[:, None]


@jax.jit
def gen_only(p, mag):
    return LctGenerator(LCTGeneratorConfig(), name="gen").apply(
        {"params": p["gen"]}, mag)


@jax.jit
def back(x, mask_c):
    s = stft(x, cfg)
    return istft(apply_mask(s, mask_c, compressed=True, c=0.3), cfg,
                 length=x.shape[-1])


@jax.jit
def gen_bf16(p, mag):
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p["gen"])
    return LctGenerator(LCTGeneratorConfig(), name="gen").apply(
        {"params": pb}, mag.astype(jnp.bfloat16))


# ---- trunk split: conv encoder/decoder vs the three FTF blocks ----
import flax.linen as nn  # noqa: E402

from lct_gan_tpu.models.generator import (  # noqa: E402
    FreqGRUBlock,
    TimeGRUBlock,
    TorchConvTranspose,
    _align,
    _leaky,
)

_GCFG = LCTGeneratorConfig()


class _ConvTrunk(nn.Module):
    """LctGenerator's conv path with the FTF bottleneck removed --
    timing-only twin, same shapes/channels (models/generator.py:294-346)."""

    @nn.compact
    def __call__(self, x):  # [B, T, F, 1]
        e1, e2, e3 = _GCFG.enc_channels
        B, T_in, F_in, _ = x.shape
        skip2 = nn.Conv(e3, (1, 1), name="skip2")(x)
        skip3 = nn.Conv(e2, (1, 1), name="skip3")(x)
        skip4 = nn.Conv(e1, (1, 1), name="skip4")(x)
        conv_kw = dict(kernel_size=(2, 3), strides=(1, 2),
                       padding=((1, 1), (1, 1)))
        x1 = _leaky(nn.Conv(e1, name="conv1", **conv_kw)(x))
        x2 = _leaky(nn.Conv(e2, name="conv2", **conv_kw)(x1))
        x3 = _leaky(nn.Conv(e3, name="conv3", **conv_kw)(x2))
        h = nn.LayerNorm(name="layernorm")(x3)
        d3, d2, d1 = _GCFG.dec_channels
        deconv_kw = dict(kernel_size=(2, 3), strides=(1, 2), padding=(1, 1),
                         output_padding=(0, 1))
        skip2_a, h_a = _align(skip2, h)
        y2 = _leaky(TorchConvTranspose(d2, name="deconv2", **deconv_kw)(
            h_a + skip2_a))
        skip3_a, y2_a = _align(skip3, y2)
        y3 = _leaky(TorchConvTranspose(d1, name="deconv3", **deconv_kw)(
            y2_a + skip3_a))
        skip4_a, y3_a = _align(skip4, y3)
        y4 = nn.relu(TorchConvTranspose(
            _GCFG.out_channels, name="deconv4", **deconv_kw)(y3_a + skip4_a))
        return y4[:, :T_in, :F_in]


class _FtfTrunk(nn.Module):
    """The three bottleneck FTF blocks alone (models/generator.py:313-324)."""

    @nn.compact
    def __call__(self, x3):  # [B, T_b, F_b, C]
        e3 = _GCFG.enc_channels[-1]
        h = FreqGRUBlock(channels=e3, num_heads=_GCFG.num_heads,
                         groups=_GCFG.gru_groups, name="GRUf1")(x3)
        h = TimeGRUBlock(channels=e3, num_heads=_GCFG.num_heads,
                         groups=_GCFG.gru_groups,
                         max_time_context=_GCFG.max_time_context,
                         name="GRUt1")(h)
        h = FreqGRUBlock(channels=e3, num_heads=_GCFG.num_heads,
                         groups=_GCFG.gru_groups, name="GRUf2")(h)
        return h


print(f"batch={batch} seconds={seconds} T={T}", flush=True)
mag = front(wave)
print("front compiled", flush=True)
mask_c = gen_only(params, mag)
print("gen compiled", flush=True)
t_full = timeit("full enhance (f32)", full, params, wave)
t_front = timeit("stft + magnitude", front, wave)
t_gen = timeit("generator trunk (mask)", gen_only, params, mag)
t_back = timeit("apply_mask + istft (incl stft)", back, wave, mask_c)
t_bf16 = timeit("generator trunk bf16-cast PROBE", gen_bf16, params, mag)

# Conv-vs-FTF split at the exact production shapes.
x_nhwc = mag.transpose(0, 3, 2, 1)  # [B, T, F, 1]
conv_trunk = _ConvTrunk()
conv_params = jax.jit(conv_trunk.init)(jax.random.PRNGKey(1), x_nhwc)
conv_apply = jax.jit(conv_trunk.apply)
print("conv trunk compiled" if conv_apply(conv_params, x_nhwc) is not None
      else "?", flush=True)
# bottleneck shape: T + n_levels, ceil-halved F per level, C = e3
B_, T_, F_, _ = x_nhwc.shape
Fb = F_
for _ in _GCFG.enc_channels:
    Fb = (Fb + 1) // 2
x3 = jnp.asarray(rng.standard_normal(
    (B_, T_ + len(_GCFG.enc_channels), Fb, _GCFG.enc_channels[-1])
).astype(np.float32))
ftf_trunk = _FtfTrunk()
ftf_params = jax.jit(ftf_trunk.init)(jax.random.PRNGKey(2), x3)
ftf_apply = jax.jit(ftf_trunk.apply)
t_conv = timeit("conv encoder+decoder only", conv_apply, conv_params,
                x_nhwc)
t_ftf = timeit(f"3 FTF blocks only (bottleneck {x3.shape})", ftf_apply,
               ftf_params, x3)
if t_full and t_gen and t_front and t_back:
    print(f"\naccounted: front {t_front:.1f} + gen {t_gen:.1f} + "
          f"back-minus-stft ~{t_back - t_front:.1f} vs full {t_full:.1f}; "
          f"gen split: convs {t_conv:.1f} + FTF {t_ftf:.1f} "
          f"vs gen {t_gen:.1f}")
