"""Serialized-model export (lct_gan_tpu/export_model.py): the artifact
must reproduce the live enhancer (to program-recompilation tolerance:
the artifact compiles separately, so fusion choices differ), select
covering buckets for smaller inputs, and carry the behavioral config.
Counterpart role: the reference's TorchScript `FTFNet_scripted.pt`
(Experiments/LCT-GAN model.ipynb loads it with weights baked in)."""

import numpy as np
import pytest

import jax

from lct_gan_tpu.export_model import export_enhancer, load_exported
from lct_gan_tpu.train.state import TrainConfig, build_models, create_state


@pytest.fixture(scope="module")
def small_setup():
    cfg = TrainConfig(segment_seconds=0.25, batch_size=2)
    state = create_state(cfg, jax.random.PRNGKey(0))
    enhancer, _, _ = build_models(cfg)
    return cfg, state.g_params, enhancer


def test_export_roundtrip(tmp_path, small_setup):
    cfg, g_params, enhancer = small_setup
    T = cfg.segment_length
    path = str(tmp_path / "model.lct.zip")
    export_enhancer(path, g_params, cfg, [(2, T)])

    loaded = load_exported(path)
    rng = np.random.default_rng(0)
    noisy = rng.standard_normal((2, T)).astype(np.float32) * 0.1

    want, _ = enhancer.apply({"params": g_params}, noisy)
    got = loaded(noisy)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=1e-6)
    assert loaded.meta["sample_rate"] == cfg.sample_rate
    assert loaded.meta["compress_c"] == cfg.compress_c


def test_export_bucket_selection_and_padding(tmp_path, small_setup):
    cfg, g_params, enhancer = small_setup
    T = cfg.segment_length
    path = str(tmp_path / "model.lct.zip")
    export_enhancer(path, g_params, cfg, [(2, T), (4, 2 * T)])
    loaded = load_exported(path)

    rng = np.random.default_rng(1)
    small = rng.standard_normal((1, T - 100)).astype(np.float32) * 0.1
    out = loaded(small)
    assert out.shape == small.shape

    # Must match running the padded input through the live model and
    # trimming (the artifact zero-pads to the bucket).
    padded = np.zeros((2, T), np.float32)
    padded[:1, :T - 100] = small
    want, _ = enhancer.apply({"params": g_params}, padded)
    np.testing.assert_allclose(out, np.asarray(want)[:1, :T - 100],
                               rtol=2e-4, atol=1e-6)

    with pytest.raises(ValueError):
        loaded(rng.standard_normal((8, 3 * T)).astype(np.float32))


def test_adaptive_export_shapes_table():
    """The export shape table mirrors infer.py's adaptive batching: one
    shape per geometric bucket, rows = clamp(target // bucket, 1, cap),
    covering the requested second range."""
    from lct_gan_tpu.data import bucket_length
    from lct_gan_tpu.export_model import adaptive_export_shapes

    sr = 16000
    shapes = adaptive_export_shapes(1.5, 10.0, sr)
    buckets = [t for _, t in shapes]
    # Exactly the geometric grid from the 1.5 s bucket to the first
    # bucket covering 10 s, each once, ascending.
    assert buckets[0] == bucket_length(int(1.5 * sr))
    assert buckets[-1] >= 10 * sr > buckets[-2]
    assert buckets == sorted(set(buckets))
    for i in range(len(buckets) - 1):
        assert bucket_length(buckets[i] + 1) == buckets[i + 1]
    target = int(256.0 * sr)
    for b, t in shapes:
        assert b == max(1, min(128, target // t))
    # Every utterance length in range has a covering shape whose padded
    # size stays within ~the target (the serve-memory bound).
    for L in range(int(1.5 * sr), 10 * sr + 1, 7919):
        fits = [(b, t) for b, t in shapes if t >= L]
        assert fits
        b, t = min(fits, key=lambda s: s[0] * s[1])
        assert b * t <= max(target, t)
