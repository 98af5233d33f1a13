"""Epoch driver: experiment dirs, data-parallel training, validation with
metrics, checkpointing, CSV logging, resume.

Mirrors the reference's experiment contract (train.py:525-733):
run dir <expr_root>/<timestamp>/ with ckpts/, configs.json, metrics.csv;
validation every val_interval epochs and on the final epoch; best tracked
by val MR-STFT; `last` checkpoint each epoch, `epoch_%04d` periodic,
`best` on improvement.

TPU specifics: ONE compiled train step for the whole run (fixed-shape
segment batches); the val loader's bucketed padding bounds eval
recompiles; batches stream through a background prefetcher that places
arrays sharded over the mesh's data axis.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from lct_gan_tpu.data import Prefetcher, ScpDataset, batch_iterator
from lct_gan_tpu.metrics.external import pesq_score, stoi_score
from lct_gan_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from lct_gan_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from lct_gan_tpu.train.state import TrainConfig, create_state
from lct_gan_tpu.train.step import make_eval_step, make_train_step
from lct_gan_tpu.utils import (
    append_csv_row,
    ensure_dir,
    now_timestamp,
    to_jsonable,
    write_json,
)

__all__ = ["DataConfig", "run_training", "validate"]


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_root: str
    train_scp: str = "train.scp"
    test_scp: str = "test.scp"
    num_prefetch: int = 4
    # Decode-thread count for batch_iterator (reference train.py:118/136
    # num_workers). Also sizes the PESQ/STOI host scoring pool. On a
    # 1-core host, 0 (serial in-prefetch-thread decode) measures fastest
    # (tools/bench_input_pipeline.py); the default matches the
    # reference's 4 and the step stays compute-bound either way because
    # the prefetch thread overlaps decode with device work.
    num_workers: int = 4


def _pad_batch_to(batch: Dict[str, Any], size: int) -> Dict[str, Any]:
    """Pad the batch axis to `size` by repeating the last row (keeps jit
    shapes fixed for the tail batch); `lengths` marks rows as valid."""
    b = batch["noisy"].shape[0]
    if b == size:
        return batch
    out = dict(batch)
    reps = size - b
    for k in ("noisy", "clean"):
        out[k] = np.concatenate(
            [batch[k], np.repeat(batch[k][-1:], reps, axis=0)], axis=0)
    out["lengths"] = np.concatenate(
        [batch["lengths"], np.zeros((reps,), dtype=np.int64)])
    out["valid"] = b
    return out


def _score_utterance(ref: np.ndarray, est: np.ndarray, sample_rate: int,
                     compute_pesq: bool, compute_stoi: bool):
    """Host-side PESQ/STOI for one utterance, with the reference's
    exception-swallowing (train.py:343-364). Returns (pesq, stoi) with
    NaN marking unavailable/failed."""
    p = s = float("nan")
    if compute_pesq:
        try:
            p = pesq_score(ref, est, sample_rate, "wb")
        except Exception:
            pass
    if compute_stoi:
        try:
            s = stoi_score(ref, est, sample_rate)
        except Exception:
            pass
    return p, s


def validate(eval_step, g_params, val_ds: ScpDataset, cfg: TrainConfig,
             batch_size: int, compute_pesq: bool = True,
             compute_stoi: bool = True, num_workers: int = 4,
             adaptive_target_seconds: Optional[float] = None,
             max_batch: int = 128, batch_multiple: int = 1
             ) -> Dict[str, float]:
    """Full-utterance validation (reference: train.py:285-385).

    MR-STFT and SI-SDR on device (length-masked). PESQ/STOI are scored on
    a host worker pool CONCURRENTLY with the next batches' device eval --
    the reference serializes them after each batch (train.py:324-364),
    idling the accelerator for the whole host pass. Results are
    accumulated in submission order, so they are bit-identical to the
    serial loop.

    adaptive_target_seconds: size each batch by its length bucket
    (data/pipeline.py adaptive_slices; rows <= max_batch) instead of a
    fixed batch_size, holding the padded batch ~constant at the target --
    short buckets then fill the chip. Tail batches pad rows up to the
    bucket's full row count so compiled shapes stay at one per bucket.
    Metrics are per-utterance and masked, so results don't change.
    batch_multiple: round adaptive row counts UP to this multiple (the
    mesh's data-axis size -- a sharded eval_step needs its batch axis
    divisible by the shard count).
    """
    from concurrent.futures import ThreadPoolExecutor

    adaptive = (int(adaptive_target_seconds * cfg.sample_rate)
                if adaptive_target_seconds else None)
    total_mr = 0.0
    total_si = 0.0
    count = 0
    futures = []

    def run(pool):
        nonlocal total_mr, total_si, count
        # Length-sorted bucketing: near-uniform batch lengths cut padding
        # waste and pad-to-max buckets. Per-utterance metrics are
        # unchanged (lengths-masked, averaged over utterances), so the
        # val mean is order-invariant.
        for batch in batch_iterator(val_ds,
                                    max_batch if adaptive else batch_size,
                                    bucket=True, sort_by_length=True,
                                    adaptive_target_samples=adaptive,
                                    num_workers=num_workers):
            b = batch["noisy"].shape[0]
            if adaptive:
                # Rows for THIS bucket (recomputed from the collated
                # width, so shape count stays 1/bucket even if the header
                # probe disagreed with the decoded length); never below
                # the actual row count, never above the val-set size
                # (tiny val sets must not pad 2 rows up to 128).
                bucket = batch["noisy"].shape[1]
                rows = max(b, min(max_batch, adaptive // bucket,
                                  len(val_ds)))
                rows = -(-rows // batch_multiple) * batch_multiple
            else:
                rows = batch_size
            padded = _pad_batch_to(batch, rows)
            lengths = np.asarray(padded["lengths"])
            enhanced, m = eval_step(g_params, padded["noisy"],
                                    padded["clean"], lengths)
            enhanced = np.asarray(enhanced)
            # Per-sample MR-STFT: count only the b valid rows (padded tail
            # rows are duplicates and must not bias the mean / best-ckpt
            # selection).
            total_mr += float(np.asarray(m["mrstft"])[:b].sum())
            total_si += float(np.asarray(m["si_sdr"])[:b].sum())

            if compute_pesq or compute_stoi:
                for i in range(b):
                    L = int(lengths[i])
                    if L <= 0:
                        continue
                    ref = np.array(batch["clean"][i, :L], copy=True)
                    est = np.array(enhanced[i, :L], copy=True)
                    futures.append(pool.submit(
                        _score_utterance, ref, est, cfg.sample_rate,
                        compute_pesq, compute_stoi))
            count += b

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        run(pool)
        scores = [f.result() for f in futures]

    total_pesq = n_pesq = 0
    total_stoi = n_stoi = 0
    for p, s in scores:
        if math.isfinite(p):
            total_pesq += p
            n_pesq += 1
        if math.isfinite(s):
            total_stoi += s
            n_stoi += 1

    return {
        "val_mrstft": total_mr / max(count, 1),
        "val_si_sdr": total_si / max(count, 1),
        "val_pesq": (total_pesq / n_pesq) if n_pesq else float("nan"),
        "val_stoi": (total_stoi / n_stoi) if n_stoi else float("nan"),
    }


def run_training(cfg: TrainConfig,
                 data: DataConfig,
                 expr_root: str = "exprs",
                 resume: Optional[str] = None,
                 mesh=None,
                 compute_pesq: bool = True,
                 compute_stoi: bool = True,
                 profile_steps: int = 0) -> Dict[str, Any]:
    """Train LCT-GAN end to end. Returns summary info (run_dir, best)."""
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if cfg.batch_size % n_dev != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must be divisible by device "
            f"count {n_dev}")

    # ---- Experiment dirs (train.py:529-549) ----
    if resume is not None:
        resume_path = os.path.abspath(resume)
        ckpt_dir = os.path.dirname(resume_path)
        run_dir = os.path.dirname(ckpt_dir)
        if os.path.basename(ckpt_dir) != "ckpts":
            ckpt_dir = os.path.join(run_dir, "ckpts")
        print(f"Resuming from: {resume_path}")
        print(f"Using existing run_dir: {run_dir}")
    else:
        run_dir = os.path.join(expr_root, now_timestamp())
        ckpt_dir = os.path.join(run_dir, "ckpts")
    ensure_dir(run_dir)
    ensure_dir(ckpt_dir)
    configs_path = os.path.join(run_dir, "configs.json")
    metrics_csv = os.path.join(run_dir, "metrics.csv")

    # ---- Data ----
    train_ds = ScpDataset(
        data.data_root, data.train_scp, "train",
        sample_rate=cfg.sample_rate, segment_length=cfg.segment_length,
        random_segment=True, seed=cfg.seed)
    val_ds = ScpDataset(
        data.data_root, data.test_scp, "test",
        sample_rate=cfg.sample_rate, segment_length=None,
        random_segment=False)

    # ---- State / steps ----
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    state = jax.device_put(state, repl)

    train_step = jax.jit(
        make_train_step(cfg),
        in_shardings=(repl, bsh, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    # Validation runs sharded over the same data axis as training (params
    # replicated, batch + lengths split); without explicit shardings a
    # multi-device mesh would run eval replicated on every chip.
    eval_step = jax.jit(make_eval_step(cfg),
                        in_shardings=(repl, bsh, bsh, bsh))

    start_epoch = 1
    best_val = float("inf")
    best_epoch = 0
    if resume is not None:
        state, meta = restore_checkpoint(resume_path, cfg)
        state = jax.device_put(state, repl)
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_val = float(meta.get("best_val", float("inf")))
        best_epoch = int(meta.get("best_epoch", 0))
        print(f"Resumed at epoch {start_epoch} "
              f"(best_val={best_val:.4f} from epoch {best_epoch}).")
    else:
        payload = {
            "run_dir": run_dir,
            "created_at": now_timestamp(),
            "train_cfg": to_jsonable(cfg),
            "data_cfg": to_jsonable(data),
            "devices": n_dev,
        }
        write_json(configs_path, payload)
        print(f"Saved configs to: {configs_path}")

    # ---- Epoch loop (train.py:651-731) ----
    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        it = Prefetcher(
            batch_iterator(train_ds, cfg.batch_size, shuffle=True,
                           drop_last=True, pad_to_segment=True,
                           seed=cfg.seed, epoch=epoch,
                           num_workers=data.num_workers),
            depth=data.num_prefetch, sharding=bsh)
        n_steps = 0
        for step_idx, batch in enumerate(it, 1):
            # Optional device trace of steps 3..3+profile_steps of epoch 1
            # (skips the compile step) -> <run_dir>/profile/, viewable in
            # XProf/TensorBoard. The reference has no tracing (SURVEY §5.1).
            if (profile_steps and epoch == start_epoch and step_idx == 3):
                jax.profiler.start_trace(os.path.join(run_dir, "profile"))
            state, metrics = train_step(state, batch["noisy"],
                                        batch["clean"])
            if (profile_steps and epoch == start_epoch
                    and step_idx == 3 + profile_steps):
                jax.tree.map(
                    lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                print(f"Saved device trace to {run_dir}/profile")
            n_steps += 1
            if step_idx % cfg.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"[Epoch {epoch:03d} Step {step_idx:05d}] "
                      f"D_loss={m['d_loss']:.4f} | "
                      f"G_loss={m['g_loss']:.4f} | "
                      f"MR={m['mr_loss']:.4f} | "
                      f"Mask={m['mask_loss']:.4f} | "
                      f"Adv={m['adv_loss']:.4f} | "
                      f"FM={m['fm_loss']:.4f}")
        dt = time.time() - t0
        if n_steps:
            print(f"[Epoch {epoch:03d}] {n_steps} steps in {dt:.1f}s "
                  f"({n_steps * cfg.batch_size * cfg.segment_seconds / dt:.1f}"
                  " audio-sec/s)")

        do_val = (epoch % max(cfg.val_interval, 1) == 0) or (
            epoch == cfg.epochs)
        val_metrics: Dict[str, float] = {}
        improved = False
        if do_val:
            val_metrics = validate(
                eval_step, state.g_params, val_ds, cfg, cfg.batch_size,
                compute_pesq=compute_pesq, compute_stoi=compute_stoi,
                num_workers=data.num_workers,
                adaptive_target_seconds=(cfg.val_target_batch_seconds
                                         or None),
                batch_multiple=(mesh.shape.get("data", 1)
                                if mesh is not None else 1))
            msg = (f"[Epoch {epoch:03d}] Val MR-STFT="
                   f"{val_metrics['val_mrstft']:.4f} | "
                   f"SI-SDR={val_metrics['val_si_sdr']:.3f}")
            if math.isfinite(val_metrics["val_pesq"]):
                msg += f" | PESQ={val_metrics['val_pesq']:.3f}"
            if math.isfinite(val_metrics["val_stoi"]):
                msg += f" | STOI={val_metrics['val_stoi']:.4f}"
            print(msg)
            if val_metrics["val_mrstft"] < best_val:
                best_val = val_metrics["val_mrstft"]
                best_epoch = epoch
                improved = True

        meta = {
            "epoch": epoch,
            "best_val": best_val,
            "best_epoch": best_epoch,
            "val_metrics": val_metrics,
            "train_cfg": to_jsonable(cfg),
        }
        save_checkpoint(ckpt_dir, "last", state, meta)
        if (epoch % max(cfg.ckpt_interval, 1) == 0) or (epoch == cfg.epochs):
            save_checkpoint(ckpt_dir, f"epoch_{epoch:04d}", state, meta)
        if do_val and improved:
            save_checkpoint(ckpt_dir, "best", state, meta)
            print(f"New best val MR-STFT: {best_val:.4f} @ epoch "
                  f"{best_epoch} (saved best)")
        if do_val:
            append_csv_row(metrics_csv, {
                "epoch": epoch,
                **val_metrics,
                "best_val_mrstft": best_val,
                "best_epoch": best_epoch,
            })

    print("Training finished.")
    return {"run_dir": run_dir, "best_val": best_val,
            "best_epoch": best_epoch}
