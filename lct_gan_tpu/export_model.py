"""Serialized-model export: the TPU-native counterpart to the reference's
TorchScript artifact.

The reference ships its ground-truth model as `FTFNet_scripted.pt`
(a TorchScript program with the weights baked in, loadable without the
model code -- Experiments/LCT-GAN model.ipynb). The JAX-native
equivalent is `jax.export`: the jitted enhancer is traced at fixed
bucket shapes, lowered to versioned StableHLO with the parameters baked
in as constants, and serialized. The artifact is self-contained --
`load_exported()` needs only jax, not this package's model code -- and
portable across backends (CPU/TPU) and jax releases within the StableHLO
compatibility window.

Artifact layout: a single .zip containing `meta.json` (sample rate,
compress_c, max_time_context, shape table) and one `b<B>_t<T>.shlo`
blob per exported (batch, samples) bucket.
"""

from __future__ import annotations

import json
import zipfile
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = [
    "export_enhancer", "load_exported", "ExportedEnhancer",
    "adaptive_export_shapes",
]


def adaptive_export_shapes(min_seconds: float, max_seconds: float,
                           sample_rate: int = 16000,
                           target_batch_seconds: float = 256.0,
                           max_batch: int = 128
                           ) -> List[Tuple[int, int]]:
    """(batch, samples) export table mirroring infer.py's length-adaptive
    bucketed batching: one shape per geometric length bucket covering
    [min_seconds, max_seconds], with rows = clamp(target // bucket, 1,
    max_batch) -- short buckets serve at large B (device utilization),
    long buckets at small B (bounded memory), padded batch ~constant.
    ExportedEnhancer's smallest-covering-shape selection then picks the
    right bucket per request at serve time.
    """
    from lct_gan_tpu.data import bucket_length

    target = int(target_batch_seconds * sample_rate)
    stop = int(max_seconds * sample_rate)
    shapes: List[Tuple[int, int]] = []
    t = bucket_length(int(min_seconds * sample_rate))
    while True:
        shapes.append((max(1, min(int(max_batch), target // t)), t))
        if t >= stop:
            return shapes
        t = bucket_length(t + 1)


def export_enhancer(path: str, g_params, cfg,
                    shapes: Sequence[Tuple[int, int]],
                    keep_pallas: bool = False) -> None:
    """Serialize the enhancer at each (batch, samples) shape into `path`.

    cfg is a TrainConfig (supplies compress_c / max_time_context /
    sample_rate); parameters are baked into the program as constants.

    By default the artifact uses the pure-jnp compute path and is lowered
    for BOTH cpu and tpu (Pallas custom-calls would pin the artifact to
    one backend and one Mosaic serialization version). keep_pallas=True
    bakes the fused TPU kernels for maximum on-TPU throughput at the cost
    of portability.
    """
    import contextlib

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from lct_gan_tpu.ops.dispatch import pallas_override
    from lct_gan_tpu.train.state import build_models

    enhancer, _, _ = build_models(cfg)

    def enhance(noisy):
        out, mask = enhancer.apply({"params": g_params}, noisy)
        return out, mask

    meta = {
        "format": 1,
        "sample_rate": int(cfg.sample_rate),
        "compress_c": float(cfg.compress_c),
        "max_time_context": cfg.max_time_context,
        "pallas": bool(keep_pallas),
        "shapes": [[int(b), int(t)] for b, t in shapes],
    }
    # Portable artifacts trace the jnp path via a scoped dispatch override
    # (contextvar, not env mutation -- safe around concurrent traces).
    ctx = (contextlib.nullcontext() if keep_pallas
           else pallas_override(None))
    kw = {} if keep_pallas else {"platforms": ("cpu", "tpu")}
    with ctx, zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        for b, t in shapes:
            exp = jexport.export(jax.jit(enhance), **kw)(
                jax.ShapeDtypeStruct((b, t), jnp.float32))
            z.writestr(f"b{b}_t{t}.shlo", exp.serialize())


class ExportedEnhancer:
    """Loaded artifact: callable over [B, T] float32 with automatic
    bucket selection (zero-pad up to the smallest covering shape)."""

    def __init__(self, meta: Dict, programs: Dict[Tuple[int, int], object]):
        self.meta = meta
        self._programs = programs
        self.shapes: List[Tuple[int, int]] = sorted(programs)

    def __call__(self, noisy: np.ndarray) -> np.ndarray:
        noisy = np.asarray(noisy, np.float32)
        b, t = noisy.shape
        fits = [(bb, tt) for bb, tt in self.shapes if bb >= b and tt >= t]
        if not fits:
            raise ValueError(
                f"no exported shape covers {noisy.shape}; have "
                f"{self.shapes}")
        bb, tt = min(fits, key=lambda s: s[0] * s[1])
        padded = np.zeros((bb, tt), np.float32)
        padded[:b, :t] = noisy
        out, _mask = self._programs[(bb, tt)].call(padded)
        return np.asarray(out)[:b, :t]


def load_exported(path: str) -> ExportedEnhancer:
    """Load an artifact written by export_enhancer. Requires only jax."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json").decode())
        programs = {}
        for b, t in meta["shapes"]:
            programs[(b, t)] = jexport.deserialize(
                z.read(f"b{b}_t{t}.shlo"))
    return ExportedEnhancer(meta, programs)
