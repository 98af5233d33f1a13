"""Data layer tests: wav round-trips, scp dataset semantics, collate,
bucketing, prefetcher."""

import os

import numpy as np
import pytest

from lct_gan_tpu.data import (
    Prefetcher,
    ScpDataset,
    adaptive_slices,
    batch_iterator,
    bucket_length,
    collate,
    load_mono_wave,
    read_wav,
    resample,
    write_wav,
)


def _make_dataset_tree(root, n=5, sr=16000, seconds=1.0):
    rng = np.random.default_rng(0)
    ids = [f"utt{i:03d}" for i in range(n)]
    for sub in ("clean_train", "noisy_train"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    lengths = []
    for i, uid in enumerate(ids):
        T = int(sr * seconds) + i * 777
        lengths.append(T)
        clean = (rng.standard_normal(T) * 0.1).astype(np.float32)
        noise = (rng.standard_normal(T) * 0.05).astype(np.float32)
        write_wav(os.path.join(root, "clean_train", f"{uid}.wav"), clean, sr)
        write_wav(os.path.join(root, "noisy_train", f"{uid}.wav"),
                  clean + noise, sr)
    with open(os.path.join(root, "train.scp"), "w") as f:
        f.write("# comment line\n")
        for uid in ids:
            f.write(uid + "\n")
        f.write("\n")
    return ids, lengths


def test_wav_roundtrip_pcm16(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4321) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000 and y.shape == (1, 4321)
    np.testing.assert_allclose(y[0], x, atol=1.0 / 32768)


def test_wav_roundtrip_float32_stereo(tmp_path):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 1000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 22050, bits=32)
    y, sr = read_wav(p)
    assert sr == 22050 and y.shape == (2, 1000)
    np.testing.assert_allclose(y, x, atol=1e-7)
    mono, sr2 = load_mono_wave(p)
    np.testing.assert_allclose(mono, x.mean(axis=0), atol=1e-6)


def test_resample_tone():
    sr, sr2 = 48000, 16000
    t = np.arange(sr, dtype=np.float64) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr, sr2)
    assert abs(y.shape[-1] - sr2) <= 1
    t2 = np.arange(y.shape[-1], dtype=np.float64) / sr2
    expected = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    # Interior matches the ideal tone closely.
    sl = slice(100, -100)
    assert np.max(np.abs(y[sl] - expected[sl])) < 5e-3


def test_scp_dataset_and_collate(tmp_path):
    root = str(tmp_path)
    ids, lengths = _make_dataset_tree(root)
    ds = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                    segment_length=8000, random_segment=True)
    assert len(ds) == len(ids)
    s = ds[2]
    assert s["id"] == ids[2]
    assert s["noisy"].shape == (8000,)
    assert s["clean"].shape == (8000,)

    full = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                      segment_length=None)
    batch = collate([full[i] for i in range(3)])
    assert batch["noisy"].shape == batch["clean"].shape
    assert batch["noisy"].shape[1] == max(lengths[:3])
    assert list(batch["lengths"]) == lengths[:3]
    # padding is zeros
    assert batch["noisy"][0, lengths[0]:].max() == 0.0


def test_batch_iterator_fixed_shape(tmp_path):
    root = str(tmp_path)
    _make_dataset_tree(root)
    ds = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                    segment_length=8000, random_segment=True)
    batches = list(batch_iterator(ds, 2, shuffle=True, drop_last=True,
                                  pad_to_segment=True, seed=42))
    assert len(batches) == 2  # 5 // 2
    for b in batches:
        assert b["noisy"].shape == (2, 8000)


def test_wav_num_samples_header_probe(tmp_path):
    from lct_gan_tpu.data.audio_io import wav_num_samples

    sr = 48000
    x = (np.random.default_rng(0).standard_normal(48123) * 0.1
         ).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    n, got_sr = wav_num_samples(p)
    assert (n, got_sr) == (48123, sr)
    # Post-resample frame count matches the actual decode+resample length.
    n16, sr16 = wav_num_samples(p, target_sr=16000)
    y, _ = load_mono_wave(p, 16000)
    assert (n16, sr16) == (y.shape[-1], 16000)


def test_batch_iterator_sort_by_length(tmp_path):
    root = str(tmp_path)
    ids, lengths = _make_dataset_tree(root)  # lengths strictly increasing
    ds = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                    segment_length=None)
    # Reverse the scp order so scp-order batching differs from sorted.
    with open(os.path.join(root, "train.scp"), "w") as f:
        for uid in reversed(ids):
            f.write(uid + "\n")
    ds = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                    segment_length=None)
    assert [ds.num_samples(i) for i in range(len(ds))] == lengths[::-1]
    batches = list(batch_iterator(ds, 2, bucket=True, sort_by_length=True))
    seen = [uid for b in batches for uid in b["id"]]
    assert sorted(seen) == sorted(ids)  # every utterance exactly once
    assert seen == ids  # ascending length order despite reversed scp
    flat_lens = [int(x) for b in batches for x in b["lengths"]]
    assert flat_lens == sorted(flat_lens)
    # Per-utterance contents identical to an unsorted run (keyed by id).
    ref = {uid: b["noisy"][i, :int(b["lengths"][i])]
           for b in batch_iterator(ds, 2, bucket=True)
           for i, uid in enumerate(b["id"])}
    for b in batches:
        for i, uid in enumerate(b["id"]):
            np.testing.assert_array_equal(
                b["noisy"][i, :int(b["lengths"][i])], ref[uid])


def test_load_clean_false(tmp_path):
    """load_clean=False (the infer path) skips the clean decode: samples
    and collated batches carry no 'clean' key, and the noisy side is
    byte-identical to a paired load."""
    root = str(tmp_path)
    ids, _ = _make_dataset_tree(root)
    pair = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                      segment_length=None)
    noisy_only = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                            segment_length=None, load_clean=False)
    s = noisy_only[0]
    assert "clean" not in s
    np.testing.assert_array_equal(s["noisy"], pair[0]["noisy"])
    batches = list(batch_iterator(noisy_only, 2, bucket=True,
                                  sort_by_length=True,
                                  adaptive_target_samples=2 * 16384))
    ref = list(batch_iterator(pair, 2, bucket=True, sort_by_length=True,
                              adaptive_target_samples=2 * 16384))
    assert all("clean" not in b for b in batches)
    for b, r in zip(batches, ref):
        assert list(b["id"]) == list(r["id"])
        np.testing.assert_array_equal(b["noisy"], r["noisy"])
        np.testing.assert_array_equal(b["lengths"], r["lengths"])
    # Segment-crop mode still crops deterministically without clean.
    seg = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                     segment_length=8000, random_segment=True,
                     load_clean=False)
    seg_pair = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                          segment_length=8000, random_segment=True)
    np.testing.assert_array_equal(seg[1]["noisy"], seg_pair[1]["noisy"])


def test_adaptive_slices_properties():
    """Length-adaptive batch slices: exact cover, bucket-homogeneous
    batches (padding L is quadratic-attention cost; padding B is linear
    -- a batch must never stretch an utterance into a longer bucket),
    memory bound, bounded compiled-shape count."""
    rng = np.random.default_rng(3)
    lens = sorted(int(s * 16000)
                  for s in np.clip(rng.gamma(4.0, 1.1, size=200), 1.5, 10.0))
    target, cap = 128 * 32000, 128
    slices = adaptive_slices(lens, target, cap)
    # Exact, in-order cover of range(len(lens)).
    flat = [k for i, j in slices for k in range(i, j)]
    assert flat == list(range(len(lens)))
    per_bucket_sizes = {}
    for i, j in slices:
        bks = {bucket_length(n) for n in lens[i:j]}
        assert len(bks) == 1  # a batch never spans buckets
        b = bks.pop()
        size = j - i
        assert size <= cap
        # Padded batch fits the target (single-row batches may exceed).
        assert size * b <= target or size == 1
    # <= 2 distinct row counts per bucket (full B_b + one run remainder):
    # bounds the number of distinct compiled (B, T) shapes.
        per_bucket_sizes.setdefault(b, set()).add(size)
    for b, sizes in per_bucket_sizes.items():
        full = max(1, min(cap, target // b))
        assert sizes <= {full} or len(sizes - {full}) <= 1
    # Short buckets actually run at large B (the utilization win): a long
    # run of 1.5 s utterances fills to the cap, 10 s ones to target//b.
    short = adaptive_slices([24000] * 300, target, cap)
    assert (short[0][1] - short[0][0]) == cap
    long_b = bucket_length(160000)
    long = adaptive_slices([160000] * 300, target, cap)
    assert (long[0][1] - long[0][0]) == target // long_b == 25


def test_batch_iterator_adaptive(tmp_path):
    """Adaptive bucketed batching yields every utterance once with
    identical per-utterance contents to fixed-B batching."""
    root = str(tmp_path)
    ids, lengths = _make_dataset_tree(root)
    ds = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                    segment_length=None)
    # Tiny target -> forces multiple batches over the 5 utterances.
    target = 2 * bucket_length(max(lengths))
    batches = list(batch_iterator(ds, 4, bucket=True, sort_by_length=True,
                                  adaptive_target_samples=target))
    assert len(batches) > 1
    seen = [uid for b in batches for uid in b["id"]]
    assert sorted(seen) == sorted(ids)
    ref = {uid: b["noisy"][i, :int(b["lengths"][i])]
           for b in batch_iterator(ds, 2, bucket=True)
           for i, uid in enumerate(b["id"])}
    for b in batches:
        assert b["noisy"].shape[0] <= 4
        for i, uid in enumerate(b["id"]):
            np.testing.assert_array_equal(
                b["noisy"][i, :int(b["lengths"][i])], ref[uid])
    # Threaded decode path produces the same grouping and contents.
    threaded = list(batch_iterator(ds, 4, bucket=True, sort_by_length=True,
                                   adaptive_target_samples=target,
                                   num_workers=2))
    assert [list(b["id"]) for b in threaded] == [list(b["id"])
                                                 for b in batches]
    for bt, bb in zip(threaded, batches):
        np.testing.assert_array_equal(bt["noisy"], bb["noisy"])


def test_crops_are_resume_stable(tmp_path):
    """Segment crops are keyed on (seed, epoch, index): re-iterating an
    epoch after 'resume' (a fresh dataset object) reproduces the exact
    same batches as the uninterrupted run."""
    root = str(tmp_path)
    _make_dataset_tree(root)

    def run_epochs(epochs):
        ds = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                        segment_length=8000, random_segment=True, seed=7)
        out = []
        for ep in epochs:
            out.append([
                (b["noisy"].copy(), b["clean"].copy())
                for b in batch_iterator(ds, 2, shuffle=True, drop_last=True,
                                        pad_to_segment=True, seed=7,
                                        epoch=ep)
            ])
        return out

    uninterrupted = run_epochs([1, 2])
    resumed = run_epochs([2])  # fresh object jumping straight to epoch 2
    for (a_n, a_c), (b_n, b_c) in zip(uninterrupted[1], resumed[0]):
        np.testing.assert_array_equal(a_n, b_n)
        np.testing.assert_array_equal(a_c, b_c)

    # And different epochs draw different crops.
    same = all(
        np.array_equal(a[0], b[0])
        for a, b in zip(uninterrupted[0], uninterrupted[1]))
    assert not same


def test_bucket_length_monotone():
    lens = [1000, 20000, 33000, 50000, 100000, 200000]
    for n in lens:
        b = bucket_length(n)
        assert b >= n
        assert b <= max(16384, int(n * 1.3))
    assert len({bucket_length(n) for n in range(16384, 40000, 1000)}) <= 8


def test_prefetcher(tmp_path):
    root = str(tmp_path)
    _make_dataset_tree(root)
    ds = ScpDataset(root, "train.scp", "train", sample_rate=16000,
                    segment_length=8000)
    it = Prefetcher(batch_iterator(ds, 2, drop_last=True,
                                   pad_to_segment=True))
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["noisy"].shape == (2, 8000)


def test_prefetcher_propagates_errors():
    def bad():
        yield {"noisy": np.zeros((1, 10))}
        raise RuntimeError("boom")

    it = Prefetcher(bad())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
