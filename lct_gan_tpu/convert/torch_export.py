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

__all__ = [
    "export_enhancer_state_dict",
    "export_mpd_state_dict",
    "export_msd_state_dict",
    "save_torch_enhancer_checkpoint",
]

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


def _wn_conv(out: Dict[str, Array], prefix: str, p: Mapping[str, Any],
             conv1d: bool) -> None:
    """Inverse of torch_import._wn_conv{1,2}d: v back to torch conv layout,
    g back to torch weight_norm's [out, 1, ...] dim-0 shape."""
    v = np.asarray(p["v"])
    if conv1d:
        out[f"{prefix}.weight_v"] = _f32(np.transpose(v, (2, 1, 0)))
        g_shape = (-1, 1, 1)
    else:
        out[f"{prefix}.weight_v"] = _f32(np.transpose(v, (3, 2, 0, 1)))
        g_shape = (-1, 1, 1, 1)
    out[f"{prefix}.weight_g"] = _f32(np.asarray(p["g"]).reshape(g_shape))
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _sn_conv(out: Dict[str, Array], prefix: str, p: Mapping[str, Any],
             spectral: Mapping[str, Any], conv1d: bool) -> None:
    """Inverse of torch_import._sn_conv: kernel back to weight_orig, v back
    through the (k..., in) -> (in, k...) column permutation."""
    k = np.asarray(p["kernel"])
    v = np.asarray(spectral["v"])
    if conv1d:
        ksz, in_g, out_ch = k.shape
        out[f"{prefix}.weight_orig"] = _f32(np.transpose(k, (2, 1, 0)))
        v_t = v.reshape(ksz, in_g).transpose(1, 0).reshape(-1)
    else:
        kh, kw, in_g, out_ch = k.shape
        out[f"{prefix}.weight_orig"] = _f32(np.transpose(k, (3, 2, 0, 1)))
        v_t = v.reshape(kh, kw, in_g).transpose(2, 0, 1).reshape(-1)
    out[f"{prefix}.weight_u"] = _f32(spectral["u"])
    out[f"{prefix}.weight_v"] = _f32(v_t)
    out[f"{prefix}.bias"] = _f32(p["bias"])


def export_mpd_state_dict(params: Mapping[str, Any],
                          spectral: Optional[Mapping[str, Any]] = None,
                          periods=(2, 3, 5, 7, 11)) -> Dict[str, Array]:
    """Our MultiPeriodDiscriminator params -> reference state_dict
    (discriminators.py:106-147). Pass the 'spectral' tree for
    use_spectral_norm=True checkpoints."""
    out: Dict[str, Array] = {}
    for i, p in enumerate(periods):
        sub = params[f"disc_p{p}"]
        ssub = spectral.get(f"disc_p{p}") if spectral else None
        for j in range(5):
            if ssub is not None:
                _sn_conv(out, f"discriminators.{i}.convs.{j}",
                         sub[f"conv{j}"], ssub[f"conv{j}"], conv1d=False)
            else:
                _wn_conv(out, f"discriminators.{i}.convs.{j}",
                         sub[f"conv{j}"], conv1d=False)
        if ssub is not None:
            _sn_conv(out, f"discriminators.{i}.conv_post",
                     sub["conv_post"], ssub["conv_post"], conv1d=False)
        else:
            _wn_conv(out, f"discriminators.{i}.conv_post",
                     sub["conv_post"], conv1d=False)
    return out


def export_msd_state_dict(params: Mapping[str, Any],
                          spectral: Optional[Mapping[str, Any]] = None,
                          num_scales: int = 3) -> Dict[str, Array]:
    """Our MultiScaleDiscriminator params -> reference state_dict
    (discriminators.py:227-286; spectral norm on scale 0 only when the
    'spectral' tree is given, matching discriminators.py:243-248)."""
    out: Dict[str, Array] = {}
    for i in range(num_scales):
        sub = params[f"disc_s{i}"]
        ssub = (spectral.get(f"disc_s{i}")
                if spectral and f"disc_s{i}" in spectral else None)
        for j in range(7):
            name = f"conv{j}" if j < 6 else "conv_post"
            tkey = (f"discriminators.{i}.convs.{j}" if j < 6
                    else f"discriminators.{i}.conv_post")
            if ssub is not None:
                _sn_conv(out, tkey, sub[name], ssub[name], conv1d=True)
            else:
                _wn_conv(out, tkey, sub[name], conv1d=True)
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
                                   = None,
                                   mpd_sd: Optional[Mapping[str, Array]]
                                   = None,
                                   msd_sd: Optional[Mapping[str, Array]]
                                   = None) -> str:
    """Write a reference-compatible .pt: {'enhancer': state_dict, 'args':
    {...}} (reference infer.py:98-128 contract), plus optional 'mpd' and
    'msd' state_dicts (export_{mpd,msd}_state_dict) for discriminator
    warm starts on the reference side. Runs torch in a SUBPROCESS for the
    same tunnel-deadlock reason as load_torch_state_dict. Set
    LCT_TORCH_INPROC=1 to save in-process."""
    import json
    import os
    import subprocess
    import sys
    import tempfile

    entries = {"enhancer": export_enhancer_state_dict(params)}
    if mpd_sd is not None:
        entries["mpd"] = dict(mpd_sd)
    if msd_sd is not None:
        entries["msd"] = dict(msd_sd)
    args = {"compress_c": float(compress_c),
            "max_time_context": max_time_context}
    if extra_meta:
        args.update(extra_meta)

    # One flat npz; '\x1f'-joined (entry, key) names survive arbitrary
    # state_dict keys (which contain '.').
    flat = {f"{entry}\x1f{k}": v for entry, sd in entries.items()
            for k, v in sd.items()}

    def _save_inproc(npz_path: str) -> None:
        import torch

        ckpt: Dict[str, Any] = {"args": args}
        with np.load(npz_path) as z:
            for name in z.files:
                entry, k = name.split("\x1f", 1)
                ckpt.setdefault(entry, {})[k] = torch.from_numpy(
                    np.array(z[name]))
        torch.save(ckpt, path)

    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "sd.npz")
        np.savez(npz, **flat)
        if os.environ.get("LCT_TORCH_INPROC"):
            _save_inproc(npz)
            return path
        script = (
            "import sys, json, numpy as np, torch\n"
            "npz, path, args = sys.argv[1], sys.argv[2], "
            "json.loads(sys.argv[3])\n"
            "ckpt = {'args': args}\n"
            "with np.load(npz) as z:\n"
            "    for name in z.files:\n"
            "        entry, k = name.split('\\x1f', 1)\n"
            "        ckpt.setdefault(entry, {})[k] = "
            "torch.from_numpy(np.array(z[name]))\n"
            "torch.save(ckpt, path)\n")
        subprocess.run(
            [sys.executable, "-c", script, npz, path, json.dumps(args)],
            check=True, capture_output=True, timeout=600)
    return path
