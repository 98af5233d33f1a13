"""lct_gan_tpu parameter tree -> reference PyTorch checkpoint exporter.

The exact inverse of convert/torch_import.py for the generator: takes our
Flax LctEnhancer params and writes a state_dict the REFERENCE code loads
with strict=True (reference infer.py:126 `load_state_dict(ckpt["enhancer"])`
after recovering compress_c/max_time_context from ckpt["args"],
infer.py:104-108). This makes models trained here servable by the
reference stack -- the reverse of the torch-import parity direction -- and
lets the torch oracle (eval/compare.py) run OUR trained weights, so the
acceptance parity gate and the category study can be produced off a real
trained checkpoint instead of a seeded random init.

Layout conversions (each the inverse of torch_import.py's):
  HWIO [kh, kw, in, out]             -> Conv2d [out, in, kh, kw]
  HWIO pre-flipped deconv            -> ConvTranspose [in, out, kh, kw]
  Linear [in, out]                   -> [out, in]
  GRU  w_ih[dir, group] = [I, 3H]    -> weight_ih_l0{_reverse} [3H, I]
  MHA  in_proj_kernel [E, 3E]        -> in_proj_weight [3E, E]
  LayerNorm scale/bias               -> weight/bias

The 'stft.window' buffer (reference stft.py:56-57 registers
torch.hann_window(512)) is synthesized so strict=True loads succeed.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

__all__ = ["export_enhancer_state_dict", "save_torch_enhancer_checkpoint"]

Array = np.ndarray


def _f32(x: Any) -> Array:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _conv2d(out: Dict[str, Array], prefix: str, p: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _f32(np.transpose(p["kernel"], (3, 2, 0, 1)))
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _conv_transpose2d(out: Dict[str, Array], prefix: str,
                      p: Mapping[str, Any]) -> None:
    k = np.asarray(p["kernel"])[::-1, ::-1]  # un-flip kh, kw
    out[f"{prefix}.weight"] = _f32(np.transpose(k, (2, 3, 0, 1)))
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _dense(out: Dict[str, Array], prefix: str, p: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _f32(np.asarray(p["kernel"]).T)
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _layernorm(out: Dict[str, Array], prefix: str,
               p: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _f32(p["scale"])
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _mha(out: Dict[str, Array], prefix: str, p: Mapping[str, Any]) -> None:
    out[f"{prefix}.in_proj_weight"] = _f32(
        np.asarray(p["in_proj_kernel"]).T)
    out[f"{prefix}.in_proj_bias"] = _f32(p["in_proj_bias"])
    out[f"{prefix}.out_proj.weight"] = _f32(
        np.asarray(p["out_proj_kernel"]).T)
    out[f"{prefix}.out_proj.bias"] = _f32(p["out_proj_bias"])


def _grouped_gru(out: Dict[str, Array], prefix: str, p: Mapping[str, Any]
                 ) -> None:
    w_ih, w_hh = np.asarray(p["w_ih"]), np.asarray(p["w_hh"])
    b_ih, b_hh = np.asarray(p["b_ih"]), np.asarray(p["b_hh"])
    dirs, groups = w_ih.shape[:2]
    pfx = f"{prefix}." if prefix else ""
    for d in range(dirs):
        sfx = "_reverse" if d == 1 else ""
        for g in range(groups):
            out[f"{pfx}gru{g + 1}.weight_ih_l0{sfx}"] = _f32(w_ih[d, g].T)
            out[f"{pfx}gru{g + 1}.weight_hh_l0{sfx}"] = _f32(w_hh[d, g].T)
            out[f"{pfx}gru{g + 1}.bias_ih_l0{sfx}"] = _f32(b_ih[d, g])
            out[f"{pfx}gru{g + 1}.bias_hh_l0{sfx}"] = _f32(b_hh[d, g])


def _gru_block(out: Dict[str, Array], prefix: str,
               p: Mapping[str, Any]) -> None:
    _layernorm(out, f"{prefix}.layernorm1", p["layernorm1"])
    _layernorm(out, f"{prefix}.layernorm2", p["layernorm2"])
    _grouped_gru(out, prefix, p["gru"])
    _mha(out, f"{prefix}.attn", p["attn"])
    _dense(out, f"{prefix}.lin", p["lin"])


def export_generator_state_dict(params: Mapping[str, Any],
                                prefix: str = "") -> Dict[str, Array]:
    """Our LctGenerator param tree -> reference LCTGenerator state_dict
    arrays (keys like 'conv1.weight'; reference generator.py:440-533)."""
    out: Dict[str, Array] = {}
    p = prefix
    for name in ("conv1", "conv2", "conv3", "skip2", "skip3", "skip4"):
        _conv2d(out, f"{p}{name}", params[name])
    _layernorm(out, f"{p}layernorm", params["layernorm"])
    for name in ("GRUf1", "GRUt1", "GRUf2"):
        _gru_block(out, f"{p}{name}", params[name])
    for name in ("deconv2", "deconv3", "deconv4"):
        _conv_transpose2d(out, f"{p}{name}", params[name])
    return out


def _hann_periodic(n: int) -> Array:
    # torch.hann_window(n) default periodic=True (reference stft.py:56).
    return (0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def export_enhancer_state_dict(params: Mapping[str, Any],
                               n_fft: int = 512) -> Dict[str, Array]:
    """Our LctEnhancer params -> reference LCTEnhancer state_dict arrays
    ('gen.*' + the 'stft.window' hann buffer, for strict=True loads)."""
    gen = params["gen"] if "gen" in params else params
    out = export_generator_state_dict(gen, prefix="gen.")
    out["stft.window"] = _hann_periodic(n_fft)
    return out


def save_torch_enhancer_checkpoint(path: str, params: Mapping[str, Any],
                                   compress_c: float = 0.3,
                                   max_time_context: Optional[int] = None,
                                   extra_meta: Optional[Dict[str, Any]]
                                   = None) -> str:
    """Write a reference-compatible .pt: {'enhancer': state_dict, 'args':
    {...}} (reference infer.py:98-128 contract). Runs torch in a
    SUBPROCESS for the same tunnel-deadlock reason as
    load_torch_state_dict. Set LCT_TORCH_INPROC=1 to save in-process."""
    import json
    import os
    import subprocess
    import sys
    import tempfile

    sd = export_enhancer_state_dict(params)
    args = {"compress_c": float(compress_c),
            "max_time_context": max_time_context}
    if extra_meta:
        args.update(extra_meta)

    def _save_inproc(npz_path: str) -> None:
        import torch

        with np.load(npz_path) as z:
            tensors = {k: torch.from_numpy(np.array(z[k])) for k in z.files}
        torch.save({"enhancer": tensors, "args": args}, path)

    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "sd.npz")
        np.savez(npz, **sd)
        if os.environ.get("LCT_TORCH_INPROC"):
            _save_inproc(npz)
            return path
        script = (
            "import sys, json, numpy as np, torch\n"
            "npz, path, args = sys.argv[1], sys.argv[2], "
            "json.loads(sys.argv[3])\n"
            "with np.load(npz) as z:\n"
            "    sd = {k: torch.from_numpy(np.array(z[k])) for k in z.files}\n"
            "torch.save({'enhancer': sd, 'args': args}, path)\n")
        subprocess.run(
            [sys.executable, "-c", script, npz, path, json.dumps(args)],
            check=True, capture_output=True, timeout=600)
    return path
