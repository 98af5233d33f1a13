"""Orbax checkpointing with the reference's file roles and logical payload.

Reference contract (train.py:690-719): `last` overwritten every epoch,
`epoch_%04d` periodic, `best` on val-MR-STFT improvement; payload carries
model + optimizer states, epoch counters, best-val tracking, val metrics
and configs. Here the array state (GanTrainState) is an Orbax pytree
directory and the scalar metadata is a JSON sidecar inside it.

Also provides `state_from_torch_checkpoint`: imports a reference PyTorch
.pt checkpoint (keys 'enhancer'/'mpd'/'msd', train.py:690-704) into a
GanTrainState for parity evaluation and warm starts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from lct_gan_tpu.train.state import GanTrainState, TrainConfig, create_state
from lct_gan_tpu.utils import ensure_dir, to_jsonable, write_json

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "read_checkpoint_meta",
    "state_from_torch_checkpoint",
    "load_generator_params",
    "save_generator_params_npz",
]

_META = "meta.json"


def _ckptr() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, name: str, state: GanTrainState,
                    meta: Dict[str, Any]) -> str:
    """Save state under <ckpt_dir>/<name> (overwrites), with JSON meta."""
    ensure_dir(ckpt_dir)
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    _ckptr().save(tmp, jax.device_get(state))
    write_json(os.path.join(tmp, _META), meta)
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, cfg: TrainConfig
                       ) -> Tuple[GanTrainState, Dict[str, Any]]:
    """Restore a GanTrainState (+ meta) from a checkpoint directory."""
    path = os.path.abspath(path)
    abstract = jax.eval_shape(
        lambda: create_state(cfg, jax.random.PRNGKey(0)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract)
    state = _ckptr().restore(path, item=template)
    meta_path = os.path.join(path, _META)
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    p = os.path.join(ckpt_dir, "last")
    return p if os.path.isdir(p) else None


def read_checkpoint_meta(checkpoint: str) -> Dict[str, Any]:
    """Return the JSON meta of a checkpoint: the sidecar of an Orbax dir,
    or the embedded meta of a generator .npz ({} if absent).
    meta['train_cfg'] carries the training-time TrainConfig -- inference
    must honor hyperparameters that change behavior without changing
    param shapes (max_time_context, compress_c), or a banded-causal-
    trained generator would silently be served with full attention."""
    if checkpoint.endswith(".npz") and os.path.isfile(checkpoint):
        with np.load(checkpoint) as z:
            if _NPZ_META_KEY in z.files:
                return json.loads(bytes(z[_NPZ_META_KEY]).decode("utf-8"))
        return {}
    meta_path = os.path.join(os.path.abspath(checkpoint), _META)
    if not os.path.isfile(meta_path):
        return {}
    with open(meta_path, "r", encoding="utf-8") as f:
        return json.load(f)


_NPZ_META_KEY = "__meta_json__"


def save_generator_params_npz(path: str, g_params,
                              meta: Optional[Dict[str, Any]] = None) -> str:
    """Write ONLY the generator params as a flat .npz ('/'-joined keys).

    The full Orbax training checkpoint carries both discriminators and
    two optimizer states (~190 MB); inference needs the 135 K-param
    generator (~0.5 MB). This is the committable serving-weights format
    -- load_generator_params accepts it everywhere a checkpoint path is
    taken (infer.py, export.py, eval/compare.py, eval/streaming.py).

    `meta` (the Orbax checkpoint's JSON sidecar) is embedded so
    behavior-changing hyperparameters survive extraction: infer.py and
    export.py read train_cfg.max_time_context / compress_c via
    read_checkpoint_meta, and a banded-causal-trained generator must not
    silently be served with full attention."""
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(g_params)[0]
    }
    assert _NPZ_META_KEY not in flat
    if meta is not None:
        flat[_NPZ_META_KEY] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    ensure_dir(os.path.dirname(os.path.abspath(path)))
    np.savez(path, **flat)
    return path


def _load_generator_params_npz(path: str):
    nested: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            if key == _NPZ_META_KEY:
                continue
            node = nested
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return nested


def load_generator_params(checkpoint: str, cfg: TrainConfig):
    """Checkpoint -> generator params. Accepts our Orbax checkpoint dirs,
    generator-only .npz files (save_generator_params_npz), and reference
    PyTorch .pt files (infer.py:98-128 equivalent). For .pt files only
    the 'enhancer' entry is needed (discriminators are training-only)."""
    if checkpoint.endswith(".npz") and os.path.isfile(checkpoint):
        return _load_generator_params_npz(checkpoint)
    if os.path.isdir(checkpoint):
        # The restore template's pytree structure must match the
        # training-time one; use_spectral_norm changes it (spectral u/v
        # buffers), so honor the checkpoint's own record.
        saved = read_checkpoint_meta(checkpoint).get("train_cfg", {})
        sn = bool(saved.get("use_spectral_norm", False))
        if sn != cfg.use_spectral_norm:
            import dataclasses

            cfg = dataclasses.replace(cfg, use_spectral_norm=sn)
        state, _ = restore_checkpoint(checkpoint, cfg)
        return state.g_params
    from lct_gan_tpu.convert.torch_import import (
        convert_enhancer,
        load_torch_state_dict,
    )

    return jax.tree.map(
        lambda x: np.asarray(x, dtype=np.float32),
        convert_enhancer(load_torch_state_dict(checkpoint, "enhancer")))


def state_from_torch_checkpoint(path: str, cfg: TrainConfig,
                                rng: Optional[jax.Array] = None
                                ) -> GanTrainState:
    """Build a GanTrainState whose model params come from a reference
    PyTorch checkpoint (optimizer states freshly initialized)."""
    from lct_gan_tpu.convert.torch_import import (
        convert_enhancer,
        convert_mpd,
        convert_msd,
        load_torch_state_dict,
    )
    from lct_gan_tpu.train.state import make_optimizers

    if rng is None:
        rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)

    g_params = jax.tree.map(
        lambda x: np.asarray(x, dtype=np.float32),
        convert_enhancer(load_torch_state_dict(path, "enhancer")))
    mpd_params = jax.tree.map(
        lambda x: np.asarray(x, dtype=np.float32),
        convert_mpd(load_torch_state_dict(path, "mpd")))
    msd_params = jax.tree.map(
        lambda x: np.asarray(x, dtype=np.float32),
        convert_msd(load_torch_state_dict(path, "msd")))

    g_tx, d_tx = make_optimizers(cfg)
    return GanTrainState(
        step=state.step,
        g_params=g_params,
        mpd_params=mpd_params,
        msd_params=msd_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init({"mpd": mpd_params, "msd": msd_params}),
        spectral=state.spectral,
    )
