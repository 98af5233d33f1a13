#!/usr/bin/env python
"""One-command BASELINE.md acceptance driver.

Runs the reference configs from BASELINE.md ("configs 1-5": reference
train.py:651-731 training contract, infer.py wav-in/wav-out contract,
metrics.py:162-285 evaluation) against a supplied --data_root, optionally
runs the converted-reference-checkpoint parity comparison against the
PyTorch reference executed as an oracle, and prints the acceptance gate
verdict:

  * PESQ-wb within 0.01 when the `pesq` wheel is importable
    (BASELINE.md north star), else
  * the documented waiver triple -- SI-SDR within 0.1 dB, STOI within
    0.001, fwSegSNR within 0.1 dB (BASELINE.md "PESQ-unavailable
    acceptance procedure").

Stages (each maps to a BASELINE.md config):
  2. feature pipeline on segment batches   (config 2)
  3. `train.py --gan_loss ls`              (config 3)
  4. `train.py --gan_loss hinge` + val     (config 4)
  1. `infer.py` over the test split        (config 1)
  5. DP dry run + batched streaming infer  (config 5)
  G. parity gate vs the torch reference    (needs --reference_pt; one is
     synthesized from the reference's own code when --synthetic is given)

With --synthetic the driver fabricates the test-suite's synthetic tree
(tests/test_train_loop.py::_make_tree layout) plus a reference .pt
(reference-code-initialized weights), so the whole driver -- gate
included -- runs green inside this image with no external data.

Exit code 0 iff no stage FAILed.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = os.environ.get("LCT_REFERENCE_ROOT", "/root/reference")
if REPO not in sys.path:  # allow `python tools/acceptance.py` from anywhere
    sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(description="BASELINE.md acceptance driver")
    p.add_argument("--data_root", type=str, default=None,
                   help="Dataset tree (train.py layout). Omit with "
                        "--synthetic to fabricate one.")
    p.add_argument("--synthetic", action="store_true",
                   help="Fabricate a synthetic dataset (and, unless "
                        "--reference_pt is given, a reference .pt) so the "
                        "full driver runs in-image.")
    p.add_argument("--reference_pt", type=str, default=None,
                   help="Reference PyTorch checkpoint (train.py:690-704 "
                        "payload) for the parity gate.")
    p.add_argument("--work_dir", type=str, default=None,
                   help="Where runs/outputs land (default: temp dir).")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--segment_seconds", type=float, default=None,
                   help="Default: 2.0 (reference), 0.25 under --synthetic.")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--skip_train", action="store_true",
                   help="Skip configs 3-4 (use with an existing checkpoint "
                        "via --checkpoint).")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Checkpoint for config 1/5 inference when "
                        "--skip_train (otherwise the config-3 best).")
    p.add_argument("--keep_work_dir", action="store_true")
    return p.parse_args()


# ---------------------------------------------------------------------------
# plumbing

class Stage:
    def __init__(self, config: str, desc: str):
        self.config = config
        self.desc = desc
        self.status = "SKIP"
        self.detail = ""

    def ok(self, detail=""):
        self.status, self.detail = "PASS", detail
        return self

    def fail(self, detail=""):
        self.status, self.detail = "FAIL", detail
        return self

    def skip(self, detail=""):
        self.status, self.detail = "SKIP", detail
        return self


def _run_cli(cmd, log_path, timeout=7200):
    """Run one of the repo CLIs as the user would, teeing output."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with open(log_path, "w") as log:
        proc = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                              stdout=log, stderr=subprocess.STDOUT,
                              timeout=timeout)
    return proc.returncode


def _tail(path, n=5):
    try:
        with open(path) as f:
            return "".join(f.readlines()[-n:])
    except OSError:
        return "<no log>"


# ---------------------------------------------------------------------------
# synthetic fixtures

def make_synthetic_tree(root: str, sr: int, n_train=16, n_test=4,
                        seconds=0.4):
    """tests/test_train_loop.py::_make_tree layout: tone+noise pairs."""
    import numpy as np

    from lct_gan_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("test", n_test)):
        cdir = os.path.join(root, f"clean_{split}")
        ndir = os.path.join(root, f"noisy_{split}")
        os.makedirs(cdir, exist_ok=True)
        os.makedirs(ndir, exist_ok=True)
        ids = []
        for i in range(n):
            uid = f"{split}{i:03d}"
            ids.append(uid)
            T = int(sr * seconds) + i * 160
            t = np.arange(T) / sr
            f0 = float(rng.uniform(150, 1500))
            clean = (0.3 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
            noisy = clean + (rng.standard_normal(T) * 0.1).astype(np.float32)
            write_wav(os.path.join(cdir, f"{uid}.wav"), clean, sr)
            write_wav(os.path.join(ndir, f"{uid}.wav"), noisy, sr)
        with open(os.path.join(root, f"{split}.scp"), "w") as f:
            f.write("\n".join(ids) + "\n")


_MAKE_REF_PT = r"""
import sys, types, importlib, torch
ref_root, out_path = sys.argv[1], sys.argv[2]
sys.path.insert(0, ref_root)
for mod in list(sys.modules):
    if mod == "datasets" or mod.startswith("datasets."):
        del sys.modules[mod]
if "torchaudio" not in sys.modules:
    ta = types.ModuleType("torchaudio")
    ta.functional = types.ModuleType("torchaudio.functional")
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = ta.functional
gen = importlib.import_module("models.generator")
torch.manual_seed(0)
enh = gen.LCTEnhancer(gen_cfg=gen.LCTGeneratorConfig(), c=0.3)
torch.save({"enhancer": enh.state_dict(),
            "args": {"compress_c": 0.3}}, out_path)
print("wrote", out_path)
"""

_REF_INFER = r"""
import sys, types, importlib, importlib.util
import numpy as np, torch
(ref_root, audio_io_path, ckpt_path, data_root, scp_path, out_dir,
 sr) = sys.argv[1:8]
sr = int(sr)
sys.path.insert(0, ref_root)
for mod in list(sys.modules):
    if mod == "datasets" or mod.startswith("datasets."):
        del sys.modules[mod]
if "torchaudio" not in sys.modules:
    ta = types.ModuleType("torchaudio")
    ta.functional = types.ModuleType("torchaudio.functional")
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = ta.functional
spec = importlib.util.spec_from_file_location("lct_audio_io", audio_io_path)
audio_io = importlib.util.module_from_spec(spec)
spec.loader.exec_module(audio_io)
gen_mod = importlib.import_module("models.generator")

# build_enhancer_from_checkpoint semantics (reference infer.py:98-128)
ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
args = ckpt.get("args", {})
cfg = gen_mod.LCTGeneratorConfig(
    max_time_context=args.get("max_time_context", 200))
enh = gen_mod.LCTEnhancer(gen_cfg=cfg, c=args.get("compress_c", 0.3))
enh.load_state_dict(ckpt["enhancer"])
enh.eval()

import os
os.makedirs(out_dir, exist_ok=True)
with open(scp_path) as f:
    ids = [l.strip() for l in f if l.strip() and not l.startswith("#")]
with torch.no_grad():
    for uid in ids:
        wave, _ = audio_io.load_mono_wave(
            os.path.join(data_root, "noisy_test", uid + ".wav"), sr)
        x = torch.from_numpy(np.asarray(wave, np.float32))[None]
        out, _ = enh(x)
        audio_io.write_wav(os.path.join(out_dir, uid + ".wav"),
                           out[0].numpy(), sr)
print("reference-enhanced", len(ids), "utterances")
"""


# ---------------------------------------------------------------------------
# parity gate

def _mean_metrics(clean_dir, enh_dir, ids, sr):
    import numpy as np

    from lct_gan_tpu.metrics import compute_metrics_for_pair

    per = {}
    for uid in ids:
        m = compute_metrics_for_pair(
            os.path.join(clean_dir, uid + ".wav"),
            os.path.join(enh_dir, uid + ".wav"), sr)
        for k, v in m.items():
            if math.isfinite(v):
                per.setdefault(k, []).append(v)
    return {k: float(np.mean(v)) for k, v in per.items()}


def parity_gate(stage, data_root, scp_path, reference_pt, work, sr, log):
    """Enhance the test split with (a) our framework serving the CONVERTED
    reference checkpoint, (b) the PyTorch reference itself (oracle
    subprocess, torch-CPU), score both against clean, and gate on the
    metric deltas (BASELINE.md acceptance procedure)."""
    from lct_gan_tpu.metrics import pesq_available

    ours_dir = os.path.join(work, "gate_ours")
    ref_dir = os.path.join(work, "gate_reference")

    # --exact_lengths: the torch oracle below runs per-utterance at exact
    # length; bucketed padding feeds the unmasked time attention padded
    # frames and perturbs outputs, so the comparison must match shapes.
    rc = _run_cli(["infer.py", "--data_root", data_root,
                   "--checkpoint", reference_pt,
                   "--output_dir", ours_dir,
                   "--exact_lengths",
                   "--sample_rate", str(sr)],
                  os.path.join(work, "gate_ours.log"))
    if rc != 0:
        return stage.fail("our inference with the converted checkpoint "
                          "failed:\n"
                          + _tail(os.path.join(work, "gate_ours.log")))

    audio_io_path = os.path.join(REPO, "lct_gan_tpu", "data", "audio_io.py")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # torch-only child; keep jax plugins out
    with open(os.path.join(work, "gate_reference.log"), "w") as lf:
        proc = subprocess.run(
            [sys.executable, "-c", _REF_INFER, REFERENCE_ROOT,
             audio_io_path, reference_pt, data_root, scp_path, ref_dir,
             str(sr)],
            stdout=lf, stderr=subprocess.STDOUT, env=env, timeout=3600)
    if proc.returncode != 0:
        return stage.fail("reference (torch) inference failed:\n"
                          + _tail(os.path.join(work, "gate_reference.log")))

    with open(scp_path) as f:
        ids = [ln.strip() for ln in f
               if ln.strip() and not ln.startswith("#")]
    clean_dir = os.path.join(data_root, "clean_test")
    ours = _mean_metrics(clean_dir, ours_dir, ids, sr)
    ref = _mean_metrics(clean_dir, ref_dir, ids, sr)

    print("  parity gate means (ours vs reference):", file=log)
    for k in sorted(set(ours) | set(ref)):
        print(f"    {k}: {ours.get(k, float('nan')):.4f} vs "
              f"{ref.get(k, float('nan')):.4f}", file=log)

    if pesq_available():
        gates = [("pesq_wb", 0.01)]
        mode = "PESQ gate"
    else:
        gates = [("si_sdr", 0.1), ("stoi", 0.001), ("fwsegsnr", 0.1)]
        mode = "waiver triple (pesq wheel absent)"
    fails, details = [], []
    for key, tol in gates:
        a, b = ours.get(key), ref.get(key)
        if a is None or b is None:
            fails.append(key)
            details.append(f"{key}: missing")
            continue
        d = abs(a - b)
        details.append(f"|d {key}|={d:.4f} (tol {tol})")
        if d > tol:
            fails.append(key)
    detail = f"{mode}: " + ", ".join(details)
    return stage.fail(detail) if fails else stage.ok(detail)


# ---------------------------------------------------------------------------

def main():
    args = parse_args()
    t_start = time.time()

    work = args.work_dir or tempfile.mkdtemp(prefix="lct_acceptance_")
    os.makedirs(work, exist_ok=True)
    data_root = args.data_root
    seg_s = args.segment_seconds
    if args.synthetic:
        if data_root is None:
            data_root = os.path.join(work, "data")
            make_synthetic_tree(data_root, args.sample_rate)
        if seg_s is None:
            seg_s = 0.25
    if data_root is None:
        print("ERROR: need --data_root or --synthetic", file=sys.stderr)
        sys.exit(2)
    if seg_s is None:
        seg_s = 2.0
    scp_path = os.path.join(data_root, "test.scp")

    reference_pt = args.reference_pt
    if reference_pt is None and args.synthetic and os.path.isdir(
            REFERENCE_ROOT):
        reference_pt = os.path.join(work, "reference_init.pt")
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        with open(os.path.join(work, "make_ref_pt.log"), "w") as lf:
            proc = subprocess.run(
                [sys.executable, "-c", _MAKE_REF_PT, REFERENCE_ROOT,
                 reference_pt],
                stdout=lf, stderr=subprocess.STDOUT, env=env, timeout=600)
        if proc.returncode != 0:
            print(_tail(os.path.join(work, "make_ref_pt.log")))
            reference_pt = None

    stages = []
    print(f"== acceptance run: data_root={data_root} work={work}")

    # ---- config 2: feature pipeline on segment batches ----
    st = Stage("2", "STFT + tf_features on segment batches")
    try:
        import numpy as np

        from lct_gan_tpu.data import ScpDataset, batch_iterator
        from lct_gan_tpu.sigproc import TFFeaturesConfig, compute_tf_features

        seg = int(seg_s * args.sample_rate)
        ds = ScpDataset(data_root, "train.scp", "train",
                        sample_rate=args.sample_rate, segment_length=seg,
                        random_segment=True, seed=42)
        batch = next(iter(batch_iterator(ds, args.batch_size,
                                         pad_to_segment=True)))
        feats = compute_tf_features(
            batch["noisy"], batch["clean"],
            TFFeaturesConfig(n_fft=512, compress_input=False,
                             return_stfts=False))
        assert set(feats) >= {"noisy_mag", "irm_c", "noisy_mag_c"}
        for k, v in feats.items():
            assert np.all(np.isfinite(np.asarray(v))), k
        stages.append(st.ok(
            f"batch {batch['noisy'].shape} -> irm_c {feats['irm_c'].shape}"))
    except Exception as e:  # noqa: BLE001 -- report any failure in verdict
        stages.append(st.fail(repr(e)))

    # ---- configs 3 + 4: training runs ----
    best_ckpt = args.checkpoint
    for config, gan_loss in (("3", "ls"), ("4", "hinge")):
        st = Stage(config, f"train.py --gan_loss {gan_loss} + val loop")
        if args.skip_train:
            stages.append(st.skip("--skip_train"))
            continue
        expr = os.path.join(work, f"expr_{gan_loss}")
        log_path = os.path.join(work, f"train_{gan_loss}.log")
        rc = _run_cli(
            ["train.py", "--data_root", data_root, "--expr_root", expr,
             "--epochs", str(args.epochs), "--batch_size",
             str(args.batch_size), "--segment_seconds", str(seg_s),
             "--sample_rate", str(args.sample_rate),
             "--gan_loss", gan_loss, "--seed", "42",
             "--val_interval", "1", "--ckpt_interval", "1",
             "--log_interval", "1"],
            log_path)
        if rc != 0:
            stages.append(st.fail(_tail(log_path)))
            continue
        runs = sorted(os.listdir(expr))
        ckpt = os.path.join(expr, runs[-1], "ckpts", "best")
        if not os.path.isdir(ckpt):
            stages.append(st.fail("no best checkpoint written"))
            continue
        csv = os.path.join(expr, runs[-1], "metrics.csv")
        ok = os.path.isfile(csv)
        if gan_loss == "ls" and best_ckpt is None:
            best_ckpt = ckpt
        stages.append(st.ok(f"best={ckpt} metrics.csv={'yes' if ok else 'NO'}")
                      if ok else st.fail("metrics.csv missing"))

    # ---- config 1: inference over the test split ----
    st = Stage("1", "infer.py wav-in/wav-out over the test split")
    if best_ckpt is None:
        stages.append(st.skip("no checkpoint (training skipped/failed)"))
    else:
        out_dir = os.path.join(work, "enhanced_test")
        log_path = os.path.join(work, "infer.log")
        rc = _run_cli(["infer.py", "--data_root", data_root,
                       "--checkpoint", best_ckpt, "--output_dir", out_dir,
                       "--sample_rate", str(args.sample_rate)], log_path)
        if rc != 0:
            stages.append(st.fail(_tail(log_path)))
        else:
            with open(scp_path) as f:
                ids = [x.strip() for x in f if x.strip()]
            missing = [u for u in ids
                       if not os.path.isfile(
                           os.path.join(out_dir, u + ".wav"))]
            mlog = os.path.join(work, "metrics.log")
            mrc = _run_cli(["metrics.py", "--data_root", data_root,
                            "--enhanced_dir", out_dir,
                            "--sample_rate", str(args.sample_rate)], mlog)
            if missing or mrc != 0:
                stages.append(st.fail(f"missing={missing} metrics_rc={mrc}"))
            else:
                stages.append(st.ok(
                    f"{len(ids)} wavs + metrics.py report:\n"
                    + _tail(mlog, 6).rstrip()))

    # ---- config 5: DP multichip dry run + streaming inference ----
    st = Stage("5", "data-parallel step (8-dev mesh) + streaming inference")
    log_path = os.path.join(work, "dp_dryrun.log")
    rc = _run_cli(["__graft_entry__.py", "8"], log_path)
    if rc != 0:
        stages.append(st.fail(_tail(log_path)))
    elif best_ckpt is None:
        stages.append(st.skip("DP dry run ok; no ckpt for streaming infer"))
    else:
        out_dir = os.path.join(work, "enhanced_stream")
        slog = os.path.join(work, "infer_stream.log")
        rc = _run_cli(["infer.py", "--data_root", data_root,
                       "--checkpoint", best_ckpt, "--output_dir", out_dir,
                       "--sample_rate", str(args.sample_rate),
                       "--chunk_seconds", "1.0",
                       "--chunk_overlap", "0.25"], slog)
        stages.append(st.ok("DP dry run (jnp + kernel paths) + chunked "
                            "streaming inference")
                      if rc == 0 else st.fail(_tail(slog)))

    # ---- parity gate ----
    st = Stage("G", "converted-reference-checkpoint parity gate")
    if reference_pt is None:
        stages.append(st.skip("no --reference_pt supplied"))
    else:
        stages.append(parity_gate(st, data_root, scp_path, reference_pt,
                                  work, args.sample_rate, sys.stdout))

    # ---- verdict table ----
    print(f"\n== BASELINE.md acceptance verdict "
          f"({time.time() - t_start:.0f}s) ==")
    width = max(len(s.desc) for s in stages)
    failed = False
    for s in stages:
        failed |= s.status == "FAIL"
        detail = s.detail if "\n" not in s.detail else (
            "\n      " + s.detail.replace("\n", "\n      "))
        print(f"  [config {s.config}] {s.desc:<{width}} {s.status}  "
              f"{detail}")
    print(f"\nVERDICT: {'FAIL' if failed else 'PASS'}")
    print(json.dumps({"verdict": "FAIL" if failed else "PASS",
                      "stages": {s.config: s.status for s in stages}}))

    if not args.keep_work_dir and args.work_dir is None and not failed:
        shutil.rmtree(work, ignore_errors=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
