import time, sys, itertools
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from lct_gan_tpu.utils import enable_compile_cache
from lct_gan_tpu.ops.ftf import fused_ftf_block
enable_compile_cache()

C, G, H = 64, 4, 16

def params(key, bidi, concat):
    D = 2 if bidi else 1
    ks = jax.random.split(key, 8)
    u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.25, 0.25)
    return (1.0 + 0.1*u(ks[0], (C,)), 0.1*u(ks[0], (C,)),
            u(ks[1], (D,G,H,3*H)), u(ks[2], (D,G,H,3*H)),
            u(ks[3], (D,G,3*H)), u(ks[3], (D,G,3*H)),
            1.0 + 0.1*u(ks[4], (C,)), 0.1*u(ks[4], (C,)),
            u(ks[5], (C,3*C)), 0.1*u(ks[5], (3*C,)),
            u(ks[6], (C,C)), 0.1*u(ks[6], (C,)),
            u(ks[7], ((2*C if concat else C), C)), 0.1*u(ks[7], (C,)))

def bench(name, N, L, bidi, combos):
    p = params(jax.random.PRNGKey(0), bidi, bidi)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, L, C), jnp.float32)
    for bs, sub in combos:
        try:
            f = jax.jit(lambda x: fused_ftf_block(
                x, *p, bidirectional=bidi, num_heads=4,
                block_seqs=bs, sub=sub))
            float(jnp.sum(f(x)))  # compile
            float(jnp.sum(f(x)))
            t0 = time.time()
            outs = [f(x) for _ in range(10)]
            float(jnp.sum(outs[-1]))
            dt = (time.time() - t0) / 10 * 1000
            print(f"{name} bs={bs:3d} sub={sub} : {dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{name} bs={bs:3d} sub={sub} : FAIL {str(e)[:100]}",
                  flush=True)

# freq shape: B=128 x 2s -> B*T=16128 seqs of L=33
bench("freq", 16128, 33, True,
      [(256, 8), (512, 8), (256, 4), (512, 4), (1024, 8)])
# time shape: B*F=4224 seqs of L=126
bench("time", 4224, 129, False,
      [(96, 2), (128, 2), (192, 2), (96, 1), (128, 1), (256, 2)])
