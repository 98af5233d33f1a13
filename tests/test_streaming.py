"""Chunked streaming enhancement: seams must be inaudible (streamed output
close to whole-utterance output) and lengths exact."""

import numpy as np

import jax
import jax.numpy as jnp

from lct_gan_tpu.eval.streaming import enhance_in_chunks
from lct_gan_tpu.metrics import si_sdr
from lct_gan_tpu.train import TrainConfig, build_models

SR = 16000


def _make_enhance_fn():
    cfg = TrainConfig()
    enhancer, _, _ = build_models(cfg)
    wave0 = jnp.zeros((1, int(0.5 * SR)), jnp.float32)
    params = enhancer.init(jax.random.PRNGKey(0), wave0)["params"]

    @jax.jit
    def run(x):
        out, _ = enhancer.apply({"params": params}, x)
        return out

    def full(x_np):
        return np.asarray(run(jnp.asarray(x_np)))

    return full


def test_streamed_matches_full():
    enhance = _make_enhance_fn()
    rng = np.random.default_rng(0)
    T = int(2.0 * SR)
    t = np.arange(T) / SR
    wave = (0.2 * np.sin(2 * np.pi * 300 * t) *
            (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)) +
            0.05 * rng.standard_normal(T)).astype(np.float32)

    full = enhance(wave[None])[0]
    streamed = enhance_in_chunks(enhance, wave, SR,
                                 chunk_seconds=0.5, overlap_seconds=0.1)
    assert streamed.shape == (T,)
    # Interiors agree well; the chunk boundaries are crossfaded.
    assert si_sdr(full, streamed) > 15.0
    # Global energy comparable (no doubled or dropped overlap regions)
    assert abs(np.linalg.norm(streamed) / np.linalg.norm(full) - 1) < 0.1


def test_short_input_passthrough_shape():
    enhance = _make_enhance_fn()
    wave = np.random.default_rng(1).standard_normal(
        int(0.3 * SR)).astype(np.float32) * 0.1
    out = enhance_in_chunks(enhance, wave, SR, chunk_seconds=0.5,
                            overlap_seconds=0.1)
    assert out.shape == wave.shape


def test_many_chunks_fixed_batch():
    enhance = _make_enhance_fn()
    T = int(2.3 * SR)
    wave = (np.random.default_rng(2).standard_normal(T) * 0.05
            ).astype(np.float32)
    out = enhance_in_chunks(enhance, wave, SR, chunk_seconds=0.5,
                            overlap_seconds=0.1, max_batch=2)
    assert out.shape == (T,)
    assert np.all(np.isfinite(out))
