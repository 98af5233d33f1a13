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
        # outputs are trimmed to true lengths (unlike the reference's
        # padded-wav quirk, infer.py:150-155)
        assert wav.shape == (L,)
        assert np.isfinite(wav).all()
        assert float(np.abs(wav).max()) > 0

    # --exact_lengths enhances at the true shape; the bucketed default
    # masks padding out of the attention, so the two agree except for
    # local conv/OLA edge effects in the final ~n_fft+hop samples.
    exact_dir = str(tmp_path / "exact")
    _run_cli(monkeypatch, [
        "--data_root", data_root, "--checkpoint", ckpt,
        "--output_dir", exact_dir, "--exact_lengths",
    ])
    n_edge = 512 + 256  # enhancer n_fft + hop (models/generator.py:367)
    for uid, L in zip(ids, lens):
        bucketed, _ = read_wav(os.path.join(out_dir, f"{uid}.wav"))
        exact, _ = read_wav(os.path.join(exact_dir, f"{uid}.wav"))
        assert exact.shape == (L,)
        np.testing.assert_allclose(
            bucketed[: L - n_edge], exact[: L - n_edge],
            rtol=2e-4, atol=1e-5)
