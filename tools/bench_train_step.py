import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from lct_gan_tpu.utils import enable_compile_cache
from lct_gan_tpu.train.state import TrainConfig, create_state
from lct_gan_tpu.train.step import make_train_step
enable_compile_cache()

def run(batch, bf16):
    cfg = TrainConfig(batch_size=batch, bf16=bf16)
    state = create_state(cfg, jax.random.PRNGKey(0))
    seg = cfg.segment_length
    rng = np.random.default_rng(0)
    clean = jnp.asarray((rng.standard_normal((batch, seg)) * 0.1
                         ).astype(np.float32))
    noisy = clean + jnp.asarray((rng.standard_normal((batch, seg)) * 0.05
                                 ).astype(np.float32))
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    t0 = time.time()
    state, m = step(state, noisy, clean)
    float(m["g_loss"])
    print(f"  compile: {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        state, m = step(state, noisy, clean)
        float(m["g_loss"])
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, noisy, clean)
    float(m["g_loss"])
    dt = (time.time() - t0) / iters
    thr = batch * 2.0 / dt
    print(f"train batch={batch:3d} bf16={bf16}: {dt*1000:7.1f} ms/step "
          f"-> {thr:7.1f} train audio-sec/s", flush=True)

for bf16 in (False, True):
    for batch in (8, 32, 64):
        run(batch, bf16)
