"""End-to-end infer.py CLI (reference counterpart infer.py:12-195):
checkpoint dir in, scp in, enhanced wavs out. Exercises the baked-params
serving jit (eval/serve.py), adaptive bucketed batching with length
trimming, and the --exact_lengths parity mode against it."""

import os
import sys

import numpy as np

import jax

from lct_gan_tpu.data import read_wav, write_wav
from lct_gan_tpu.train.checkpoint import save_checkpoint
from lct_gan_tpu.train.state import TrainConfig, create_state
from lct_gan_tpu.utils.config import to_jsonable

import infer

SR = 16000


def _make_test_tree(root, lens):
    rng = np.random.default_rng(5)
    os.makedirs(os.path.join(root, "noisy_test"), exist_ok=True)
    os.makedirs(os.path.join(root, "clean_test"), exist_ok=True)
    ids = []
    for i, L in enumerate(lens):
        uid = f"utt{i:03d}"
        ids.append(uid)
        wav = (rng.standard_normal(L) * 0.1).astype(np.float32)
        write_wav(os.path.join(root, "noisy_test", f"{uid}.wav"), wav, SR)
        write_wav(os.path.join(root, "clean_test", f"{uid}.wav"), wav, SR)
    with open(os.path.join(root, "test.scp"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids


def _run_cli(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["infer.py"] + argv)
    infer.main()


def test_infer_cli_end_to_end(tmp_path, monkeypatch):
    lens = [4800, 4960, 5120]
    data_root = str(tmp_path / "data")
    ids = _make_test_tree(data_root, lens)

    cfg = TrainConfig(segment_seconds=0.25, batch_size=2)
    state = create_state(cfg, jax.random.PRNGKey(0))
    meta = {"epoch": 1, "train_cfg": to_jsonable(cfg)}
    ckpt = save_checkpoint(str(tmp_path / "ckpts"), "best", state, meta)

    out_dir = str(tmp_path / "enhanced")
    _run_cli(monkeypatch, [
        "--data_root", data_root, "--checkpoint", ckpt,
        "--output_dir", out_dir,
    ])
    for uid, L in zip(ids, lens):
        wav, sr = read_wav(os.path.join(out_dir, f"{uid}.wav"))
        assert sr == SR
        # read_wav returns [C, T] (data/audio_io.py:39); outputs are mono
        # and trimmed to true lengths (unlike the reference's padded-wav
        # quirk, infer.py:150-155)
        assert wav.shape == (1, L)
        assert np.isfinite(wav).all()
        assert float(np.abs(wav).max()) > 0

    # --exact_lengths enhances at the true shape. The bucketed default
    # masks padding out of the time attention EXCEPT the 3 trailing
    # conv-derived bottleneck frames (models/generator.py key mask cuts
    # at frames_valid+3): those frames are attention KEYS for every query
    # frame, so bucketed-vs-exact divergence is GLOBAL, weighted by those
    # keys' softmax mass (shrinks with length). Measured sweep
    # (tools/bucketed_vs_exact.py, docs/BUCKETED_VS_EXACT.md, identical
    # on CPU-f32 and TPU at short lengths): body max |diff| up to 5.2e-3
    # at 0.3 s, <= 1e-5 at >= 2 s. Band here = 1e-2 (~2x the measured
    # 0.3 s worst case) + PCM LSBs for the wav roundtrip on each side.
    # The final ~n_fft+hop samples additionally carry the local conv/OLA
    # edge effect (measured up to ~2.7e-2, NOT length-dependent) and get
    # a loose catastrophe-only band.
    exact_dir = str(tmp_path / "exact")
    _run_cli(monkeypatch, [
        "--data_root", data_root, "--checkpoint", ckpt,
        "--output_dir", exact_dir, "--exact_lengths",
    ])
    lsb = 1.0 / 32768.0
    n_edge = 512 + 256  # enhancer n_fft + hop
    for uid, L in zip(ids, lens):
        bucketed, _ = read_wav(os.path.join(out_dir, f"{uid}.wav"))
        exact, _ = read_wav(os.path.join(exact_dir, f"{uid}.wav"))
        assert exact.shape == (1, L)
        np.testing.assert_allclose(
            bucketed[0, : L - n_edge], exact[0, : L - n_edge],
            rtol=0, atol=1e-2 + 2 * lsb)
        np.testing.assert_allclose(
            bucketed[0, L - n_edge:], exact[0, L - n_edge:],
            rtol=0, atol=0.1)
