"""On-device smoke test for the COMPILED Pallas kernels.

The pytest suite runs on the CPU mesh (compiled kernels can't execute
there; interpret mode covers the dispatch path). This script is the
real-chip counterpart: it runs the fused FTF forward and backward
kernels compiled on the TPU at production shapes and checks them against
the f32 jnp reference within the documented bf16 noise band. Run after
any kernel change, before benching:

    python tools/tpu_kernel_smoke.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lct_gan_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from lct_gan_tpu.ops.ftf import (  # noqa: E402
    ftf_block_reference,
    fused_ftf_block,
)

C, G, H = 64, 4, 16


def params(key, bidi):
    D = 2 if bidi else 1
    ks = jax.random.split(key, 8)
    u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.25, 0.25)
    return (1.0 + 0.1 * u(ks[0], (C,)), 0.1 * u(ks[0], (C,)),
            u(ks[1], (D, G, H, 3 * H)), u(ks[2], (D, G, H, 3 * H)),
            u(ks[3], (D, G, 3 * H)), u(ks[3], (D, G, 3 * H)),
            1.0 + 0.1 * u(ks[4], (C,)), 0.1 * u(ks[4], (C,)),
            u(ks[5], (C, 3 * C)), 0.1 * u(ks[5], (3 * C,)),
            u(ks[6], (C, C)), 0.1 * u(ks[6], (C,)),
            u(ks[7], ((2 * C if bidi else C), C)), 0.1 * u(ks[7], (C,)))


FWD_TOL = 5e-2      # bf16-GEMM noise band on O(1..10) activations
GRAD_REL_TOL = 0.25  # worst-leaf max-err / max-|ref|, see test_pallas_ftf

failures = 0
for name, N, L, bidi, lb in (
        ("freq", 2048, 33, True, None),
        ("time", 512, 126, False, None),
        ("time-banded", 512, 126, False, 64),
        ("time-long", 36, 330, False, None)):  # bucketed-eval tile path
    p = params(jax.random.PRNGKey(0), bidi)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, L, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)

    f = jax.jit(lambda x, p=p: fused_ftf_block(
        x, *p, bidirectional=bidi, num_heads=4, lookback=lb))
    out = f(x)
    ref = ftf_block_reference(x, *p, bidirectional=bidi, num_heads=4,
                              lookback=lb)
    ferr = float(jnp.max(jnp.abs(out - ref)))

    gf = jax.jit(jax.grad(lambda x, p: jnp.sum(fused_ftf_block(
        x, *p, bidirectional=bidi, num_heads=4, lookback=lb) * w),
        argnums=(0, 1)))
    gx, gp = gf(x, p)
    rx, rp = jax.grad(lambda x, p: jnp.sum(ftf_block_reference(
        x, *p, bidirectional=bidi, num_heads=4, lookback=lb) * w),
        argnums=(0, 1))(x, p)
    worst = 0.0
    for a, b in zip(jax.tree.leaves((gx, gp)), jax.tree.leaves((rx, rp))):
        rel = float(jnp.max(jnp.abs(a - b))) / (
            float(jnp.max(jnp.abs(b))) + 1e-6)
        worst = max(worst, rel)

    ok = ferr < FWD_TOL and worst < GRAD_REL_TOL
    failures += not ok
    print(f"{name:12s} fwd maxerr {ferr:.4f} (<{FWD_TOL}), "
          f"grad worst-rel {worst:.4f} (<{GRAD_REL_TOL}) "
          f"{'OK' if ok else 'FAIL'}", flush=True)

print("ALL OK" if not failures else f"{failures} FAILURES")
sys.exit(1 if failures else 0)
