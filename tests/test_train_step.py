"""Train-step tests: single-device numerics/determinism and 8-fake-device
data-parallel execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lct_gan_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from lct_gan_tpu.train.state import TrainConfig, create_state
from lct_gan_tpu.train.step import make_eval_step, make_train_step

CFG = TrainConfig(segment_seconds=0.25, batch_size=2)  # 4000 samples


@pytest.fixture(scope="module")
def state():
    return create_state(CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    seg = CFG.segment_length
    clean = (rng.standard_normal((2, seg)) * 0.1).astype(np.float32)
    noise = (rng.standard_normal((2, seg)) * 0.05).astype(np.float32)
    return jnp.asarray(clean + noise), jnp.asarray(clean)


def test_train_step_runs_and_updates(state, batch):
    noisy, clean = batch
    step = jax.jit(make_train_step(CFG), donate_argnums=())
    new_state, metrics = step(state, noisy, clean)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["d_loss"]) > 0
    assert float(metrics["g_loss"]) > 0
    assert int(new_state.step) == 1

    # All three parameter sets actually moved.
    for old, new in (
        (state.g_params, new_state.g_params),
        (state.mpd_params, new_state.mpd_params),
        (state.msd_params, new_state.msd_params),
    ):
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), old, new)
        assert max(jax.tree.leaves(diffs)) > 0


def test_train_step_deterministic(state, batch):
    noisy, clean = batch
    step = jax.jit(make_train_step(CFG))
    _, m1 = step(state, noisy, clean)
    _, m2 = step(state, noisy, clean)
    for k in m1:
        assert float(m1[k]) == float(m2[k])


def test_eval_step(state, batch):
    noisy, clean = batch
    lengths = jnp.asarray([CFG.segment_length, CFG.segment_length - 123])
    eval_step = jax.jit(make_eval_step(CFG))
    enhanced, metrics = eval_step(state.g_params, noisy, clean, lengths)
    assert enhanced.shape == noisy.shape
    assert np.isfinite(float(metrics["mrstft"]))
    si = np.asarray(metrics["si_sdr"])
    assert si.shape == (2,)
    assert np.all(np.isfinite(si))


def test_masked_si_sdr_matches_reference_formula():
    """Our masked SI-SDR == the reference's per-utterance loop
    (train.py:261-282)."""
    from lct_gan_tpu.train.step import _masked_si_sdr

    rng = np.random.default_rng(1)
    T = 4000
    ref = (rng.standard_normal((3, T)) * 0.2).astype(np.float32)
    est = ref + (rng.standard_normal((3, T)) * 0.05).astype(np.float32)
    lengths = np.asarray([T, T - 1000, T - 2500])
    for b in range(3):
        est[b, lengths[b]:] = 0
        ref[b, lengths[b]:] = 0

    ours = np.asarray(
        _masked_si_sdr(jnp.asarray(ref), jnp.asarray(est),
                       jnp.asarray(lengths)))

    for b in range(3):
        r = ref[b, :lengths[b]].astype(np.float64)
        e = est[b, :lengths[b]].astype(np.float64)
        r = r - r.mean()
        e = e - e.mean()
        scale = (r * e).sum() / ((r * r).sum() + 1e-8)
        s = scale * r
        noise = e - s
        expected = 10 * np.log10(((s * s).sum() + 1e-8) /
                                 ((noise * noise).sum() + 1e-8))
        np.testing.assert_allclose(ours[b], expected, rtol=1e-3)


def test_data_parallel_train_step_8_devices():
    """Full train step over an 8-device mesh: params replicated, batch
    sharded; one step executes and produces finite scalars."""
    assert jax.device_count() >= 8
    mesh = make_mesh()
    cfg = TrainConfig(segment_seconds=0.25, batch_size=8)
    state = create_state(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(2)
    seg = cfg.segment_length
    clean = (rng.standard_normal((8, seg)) * 0.1).astype(np.float32)
    noisy = clean + (rng.standard_normal((8, seg)) * 0.05).astype(np.float32)

    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    state = jax.device_put(state, repl)
    noisy = jax.device_put(jnp.asarray(noisy), bsh)
    clean = jax.device_put(jnp.asarray(clean), bsh)

    step = jax.jit(
        make_train_step(cfg),
        in_shardings=(repl, bsh, bsh),
        out_shardings=(repl, repl),
    )
    new_state, metrics = step(state, noisy, clean)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(new_state.step) == 1
