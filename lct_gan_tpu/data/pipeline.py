"""Host-side batching + prefetching pipeline.

Replaces the reference's torch DataLoader stack (train.py:97-142) with a
TPU-shaped pipeline:

  * train batches are FIXED-SHAPE (segment_length samples) so the jitted
    train step compiles exactly once;
  * val/infer batches use bucketed padding (power-of-two-ish length
    buckets) with explicit `lengths`, bounding the number of distinct
    compiled shapes;
  * a background thread decodes/crops the next batches while the device
    computes (the host never blocks the TPU);
  * batches are placed on device with `jax.device_put` under an explicit
    Sharding so the leading batch axis lands sharded across the data-
    parallel mesh axis without a host-side split.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from lct_gan_tpu.data.dataset import ScpDataset, collate

__all__ = [
    "batch_iterator", "Prefetcher", "bucket_length", "adaptive_slices",
]


def bucket_length(n: int, min_bucket: int = 16384) -> int:
    """Smallest padded length >= n from a {1, 1.25, 1.5, 1.75} x 2^k grid.

    Geometric buckets cap the distinct jit shapes at O(log T) while wasting
    <= 25% padding.
    """
    if n <= min_bucket:
        return min_bucket
    b = min_bucket
    while b < n:
        b *= 2
    half = b // 2
    for num in (5, 6, 7):  # half * 1.25 / 1.5 / 1.75
        cand = half * num // 4
        if cand >= n:
            return cand
    return b


def adaptive_slices(sorted_lens: Sequence[int], target_samples: int,
                    max_batch: int):
    """Length-adaptive batch slices over LENGTH-SORTED utterances.

    Device utilization is strongly batch-bound (measured v5e-1: a 2 M-
    sample padded batch sustains ~42 M samples/s, a 4 M one ~105 M/s --
    the per-step GEMMs are latency-bound until the chip fills), so a
    fixed row count leaves most of the machine idle on short utterances.
    Each batch's row count is  B_b = clamp(target_samples // bucket, 1,
    max_batch)  for its geometric length bucket, holding the PADDED batch
    size ~constant at the target: short buckets run at large B, long ones
    at small B (bounded memory).

    A batch NEVER spans buckets. Padding rows in B costs linear FLOPs,
    but padding an utterance's time axis into a longer bucket costs
    QUADRATIC attention FLOPs -- cross-bucket coalescing was implemented
    and measured 18% SLOWER than bucket-pure batches on the 1.5-10 s
    workload (v5e-1, 2026-08-18) even though it filled batches better;
    do not retry. The boundary cut also keeps per-utterance pad lengths
    grouping-independent (outputs move only within the bf16 noise band).

    B_b is a deterministic function of the bucket, so compiled (B, T)
    shapes stay bounded at <= 2 per occupied bucket (full B_b plus at
    most one run-remainder).

    Returns a list of (start, end) index pairs covering range(len(lens))
    exactly once, in order.
    """
    n = len(sorted_lens)
    slices = []
    i = 0
    while i < n:
        b = bucket_length(int(sorted_lens[i]))
        size = max(1, min(int(max_batch), target_samples // b))
        j = i + 1
        while (j < min(i + size, n)
               and bucket_length(int(sorted_lens[j])) == b):
            j += 1
        slices.append((i, j))
        i = j
    return slices


def batch_iterator(
    dataset: ScpDataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    drop_last: bool = False,
    pad_to_segment: bool = False,
    bucket: bool = False,
    sort_by_length: bool = False,
    adaptive_target_samples: Optional[int] = None,
    seed: int = 0,
    epoch: int = 0,
    num_workers: int = 0,
    lookahead: int = 2,
) -> Iterator[Dict]:
    """Yield collated numpy batches from a ScpDataset.

    pad_to_segment: pad every batch to dataset.segment_length (fixed-shape
      training batches).
    bucket: pad full utterances to geometric length buckets (val/infer).
    sort_by_length: order utterances by header-probed post-resample length
      (stable sort) so each bucketed batch is near-uniform in length --
      padding waste and the pad-to-max bucket both shrink, which is a
      large device-utilization win for full-utterance val/infer. Ignored
      under shuffle. Batch CONTENTS are unchanged per utterance (crops
      are keyed on (seed, epoch, index)); only grouping/order changes,
      and every consumer keys results by utterance id.
    adaptive_target_samples: with bucket+sort_by_length, size each batch
      by its length bucket (see adaptive_slices) with `batch_size` as the
      row-count CAP -- short buckets run at large B (utilization), long
      buckets at small B (memory), padded batch size ~constant at the
      target. Per-utterance outputs are invariant to batch grouping
      (verified on TPU within the bf16 kernel noise band, CLAUDE.md).
    num_workers: > 0 decodes samples on a thread pool (the wav parse is
      numpy and the native decoder is a GIL-releasing ctypes call), with
      `lookahead` batches of decode futures submitted ahead of the
      consumer -- the TPU-side equivalent of the reference DataLoader's
      `num_workers=4` subprocess decode (train.py:118/136). 0 = serial
      in-caller decode (identical batch contents either way: crops are
      keyed on (seed, epoch, index), not on decode order).
    """
    if hasattr(dataset, "set_epoch"):
        dataset.set_epoch(epoch)  # resume-stable segment crops
    order = np.arange(len(dataset))
    sorted_lens = None
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        rng.shuffle(order)
    elif sort_by_length and hasattr(dataset, "num_samples"):
        lens = np.asarray([dataset.num_samples(int(i)) for i in order])
        sort = np.argsort(lens, kind="stable")
        order = order[sort]
        sorted_lens = lens[sort]
    n = len(order)
    end = n - (n % batch_size) if drop_last else n

    def _collate(samples):
        pad_to: Optional[int] = None
        if pad_to_segment and dataset.segment_length is not None:
            pad_to = dataset.segment_length
        elif bucket:
            mx = max(
                max(s["noisy"].shape[-1],
                    s["clean"].shape[-1] if "clean" in s else 0)
                for s in samples)
            pad_to = bucket_length(mx)
        return collate(samples, pad_to=pad_to)

    if adaptive_target_samples and bucket and sorted_lens is not None:
        if drop_last:
            raise ValueError(
                "drop_last is undefined with adaptive_target_samples "
                "(adaptive batches have no fixed size to drop against)")
        slices = adaptive_slices(sorted_lens, int(adaptive_target_samples),
                                 batch_size)
    else:
        slices = [(i, min(i + batch_size, end))
                  for i in range(0, end, batch_size)]
    if num_workers and num_workers > 0:
        ex = ThreadPoolExecutor(max_workers=int(num_workers),
                                thread_name_prefix="lct-decode")
        try:
            from collections import deque
            pending: "deque" = deque()
            it = iter(slices)
            exhausted = False
            while True:
                while not exhausted and len(pending) < max(1, lookahead):
                    try:
                        i, j = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    idx = order[i:j]
                    pending.append(
                        [ex.submit(dataset.__getitem__, int(k))
                         for k in idx])
                if not pending:
                    break
                yield _collate([f.result() for f in pending.popleft()])
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
    else:
        for i, j in slices:
            idx = order[i:j]
            yield _collate([dataset[int(k)] for k in idx])


class Prefetcher:
    """Background-thread prefetcher with optional device placement.

    Wraps any iterator of {str: np.ndarray} batches; decodes ahead of the
    consumer and (optionally) device_puts arrays under a sharding.
    """

    _SENTINEL = object()

    def __init__(self,
                 it: Iterator[Dict],
                 depth: int = 2,
                 sharding=None,
                 array_keys: Sequence[str] = ("noisy", "clean")):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._array_keys = array_keys
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(it,), daemon=True)
        self._thread.start()

    def _worker(self, it):
        try:
            for batch in it:
                self._q.put(self._place(batch))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def _place(self, batch: Dict) -> Dict:
        if self._sharding is None:
            return batch
        import jax

        out = dict(batch)
        for k in self._array_keys:
            if k in out:
                out[k] = jax.device_put(out[k], self._sharding)
        return out

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
