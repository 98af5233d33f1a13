"""Baked-params live serving (lct_gan_tpu/eval/serve.py): closing the
weights over the jitted enhancer must be a pure compilation-strategy
change -- outputs equal to the params-as-argument jit on every path the
serving entrypoints use (plain, lengths-masked), to program-
recompilation tolerance (constant folding re-associates a few f32 prep
ops; observed max diff 6e-9 -- same band test_export.py allows)."""

import numpy as np

import jax
import jax.numpy as jnp

from lct_gan_tpu.eval.serve import bake_enhance
from lct_gan_tpu.train.state import TrainConfig, build_models, create_state


def test_baked_matches_arg_jit():
    cfg = TrainConfig(segment_seconds=0.25, batch_size=2)
    state = create_state(cfg, jax.random.PRNGKey(0))
    enhancer, _, _ = build_models(cfg)
    T = cfg.segment_length
    wave = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2, T),
                                   jnp.float32)

    @jax.jit
    def enhance_arg(p, x, lengths=None):
        out, _ = enhancer.apply({"params": p}, x, lengths)
        return out

    enhance_baked = bake_enhance(enhancer, state.g_params)

    ref = np.asarray(enhance_arg(state.g_params, wave))
    got = np.asarray(enhance_baked(wave))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)

    lengths = jnp.asarray([T, T // 2], jnp.int32)
    ref_l = np.asarray(enhance_arg(state.g_params, wave, lengths))
    got_l = np.asarray(enhance_baked(wave, lengths))
    np.testing.assert_allclose(got_l, ref_l, rtol=2e-4, atol=1e-6)
    # and the mask actually engaged (row 1 differs from the no-lengths run)
    assert not np.array_equal(ref_l[1], ref[1])
