"""Pallas fused-MHSA kernel correctness vs the jnp reference path
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lct_gan_tpu.models import MultiHeadSelfAttention
from lct_gan_tpu.ops.attention import fused_mhsa


def _params(key, E=64):
    mod = MultiHeadSelfAttention(embed_dim=E)
    x = jnp.zeros((1, 8, E))
    return mod.init(key, x)["params"], mod


@pytest.mark.parametrize("N,L", [(24, 33), (7, 33), (4, 129), (2, 257)])
def test_fused_mhsa_matches_reference(N, L):
    key = jax.random.PRNGKey(0)
    params, mod = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, L, 64), jnp.float32)

    ref = mod.apply({"params": params}, x)
    out = fused_mhsa(
        x, params["in_proj_kernel"], params["in_proj_bias"],
        params["out_proj_kernel"], params["out_proj_bias"],
        num_heads=4, interpret=True)
    # bf16 matmuls inside the kernel -> looser tolerance.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # and correlation essentially 1
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.9999


def test_fused_mhsa_banded_causal():
    key = jax.random.PRNGKey(0)
    params, mod = _params(key)
    N, L, W = 6, 40, 7
    x = jax.random.normal(jax.random.PRNGKey(2), (N, L, 64), jnp.float32)

    ref = mod.apply({"params": params}, x, lookback=W)
    out = fused_mhsa(
        x, params["in_proj_kernel"], params["in_proj_bias"],
        params["out_proj_kernel"], params["out_proj_bias"],
        num_heads=4, lookback=W, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_enhancer_pallas_path_under_sharded_mesh(monkeypatch):
    """The production Pallas dispatch (via LCT_PALLAS_INTERPRET) must run
    and agree with the jnp path when the enhancer batch is SHARDED over the
    8-device mesh -- the real v5e-8 data-parallel serving configuration.
    Catches resharding/miscompute of pallas_call under a sharded batch
    axis (round-1 untested gap, docs/STATUS.md)."""
    from lct_gan_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from lct_gan_tpu.train import TrainConfig, build_models

    assert jax.device_count() >= 8
    mesh = make_mesh()
    cfg = TrainConfig(segment_seconds=0.25)
    enhancer, _, _ = build_models(cfg)
    wave = jax.random.normal(
        jax.random.PRNGKey(0), (8, cfg.segment_length), jnp.float32) * 0.1

    monkeypatch.setenv("LCT_NO_PALLAS", "1")
    params = enhancer.init(jax.random.PRNGKey(1), wave)["params"]
    ref, _ = jax.jit(
        lambda p, x: enhancer.apply({"params": p}, x))(params, wave)

    monkeypatch.delenv("LCT_NO_PALLAS")
    monkeypatch.setenv("LCT_PALLAS_INTERPRET", "1")
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    out, _ = jax.jit(
        lambda p, x: enhancer.apply({"params": p}, x),
        in_shardings=(repl, bsh))(
            jax.device_put(params, repl), jax.device_put(wave, bsh))

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)
    a, b = np.asarray(out).ravel(), np.asarray(ref).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.999


def test_fused_mhsa_no_cross_sequence_leak():
    """Padding/packing must not let sequences attend to one another."""
    key = jax.random.PRNGKey(0)
    params, _ = _params(key)
    N, L = 9, 20
    x = jax.random.normal(jax.random.PRNGKey(3), (N, L, 64), jnp.float32)

    out_all = fused_mhsa(
        x, params["in_proj_kernel"], params["in_proj_bias"],
        params["out_proj_kernel"], params["out_proj_bias"],
        num_heads=4, interpret=True)
    # Change sequence 0 only; sequences 1.. must be bit-unchanged.
    x2 = x.at[0].add(3.0)
    out2 = fused_mhsa(
        x2, params["in_proj_kernel"], params["in_proj_bias"],
        params["out_proj_kernel"], params["out_proj_bias"],
        num_heads=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_all[1:]),
                                  np.asarray(out2[1:]))
    assert np.max(np.abs(np.asarray(out_all[0] - out2[0]))) > 1e-3
