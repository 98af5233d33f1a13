from lct_gan_tpu.data.audio_io import (
    read_wav,
    write_wav,
    resample,
    load_mono_wave,
)
from lct_gan_tpu.data.dataset import ScpDataset, collate, read_scp
from lct_gan_tpu.data.pipeline import (
    Prefetcher,
    adaptive_slices,
    batch_iterator,
    bucket_length,
)

__all__ = [
    "read_wav",
    "write_wav",
    "resample",
    "load_mono_wave",
    "ScpDataset",
    "collate",
    "read_scp",
    "Prefetcher",
    "batch_iterator",
    "bucket_length",
    "adaptive_slices",
]
