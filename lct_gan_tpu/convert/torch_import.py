"""PyTorch checkpoint -> lct_gan_tpu parameter-tree converter.

Maps the reference's state_dicts (train.py:690-704 checkpoint payload keys
'enhancer', 'mpd', 'msd') onto our Flax param trees so that converted
checkpoints can be parity-tested and served directly.

Layout conversions:
  Conv2d        [out, in, kh, kw]    -> HWIO [kh, kw, in, out]
  Conv1d        [out, in, k]        -> WIO  [k, in, out]
  ConvTranspose [in, out, kh, kw]    -> HWIO pre-flipped:
                                        transpose(2,3,0,1) then flip kh, kw
  Linear        [out, in]            -> [in, out]
  GRU  weight_ih_l0 [3H, I] (r|z|n)  -> w_ih[dir, group] = [I, 3H]
  MHA  in_proj_weight [3E, E]        -> in_proj_kernel [E, 3E]
  LayerNorm weight/bias              -> scale/bias
  weight_norm weight_g/[out,1,..]    -> g [out];  weight_v -> v (conv layout)

The converters operate on {key: np.ndarray} dicts; `load_torch_state_dict`
does the torch.load (torch is an optional, CPU-only dependency used for
parity testing and checkpoint import, never in the TPU compute path).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "convert_enhancer",
    "convert_mpd",
    "convert_msd",
]

Array = np.ndarray
Tree = Dict[str, Any]


def load_torch_state_dict(path: str, key: str) -> Dict[str, Array]:
    """Load one state_dict (e.g. 'enhancer', 'mpd', 'msd') from a reference
    checkpoint file into numpy.

    Runs torch.load in a SUBPROCESS: importing torch into a process that
    talks to a tunneled TPU backend deadlocks device-to-host transfers
    (observed on the axon platform), and a serving process should not
    carry torch anyway. Set LCT_TORCH_INPROC=1 to load in-process (fine on
    CPU backends, e.g. under the test suite)."""
    import os

    if os.environ.get("LCT_TORCH_INPROC"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt[key] if key in ckpt else ckpt
        return {k: v.detach().cpu().numpy() for k, v in sd.items()
                if hasattr(v, "detach")}

    import subprocess
    import sys
    import tempfile

    script = (
        "import sys, numpy as np, torch\n"
        "path, key, out = sys.argv[1], sys.argv[2], sys.argv[3]\n"
        "ckpt = torch.load(path, map_location='cpu', weights_only=False)\n"
        "sd = ckpt[key] if key in ckpt else ckpt\n"
        "arrs = {k: v.detach().cpu().numpy() for k, v in sd.items()\n"
        "        if hasattr(v, 'detach')}\n"
        "np.savez(out, **arrs)\n")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "sd.npz")
        subprocess.run([sys.executable, "-c", script, path, key, out],
                       check=True, capture_output=True, timeout=600)
        with np.load(out) as z:
            return {k: np.array(z[k]) for k in z.files}


def _np(sd: Mapping[str, Any], key: str) -> Array:
    v = sd[key]
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _conv2d(sd, prefix) -> Tree:
    return {
        "kernel": _np(sd, f"{prefix}.weight").transpose(2, 3, 1, 0),
        "bias": _np(sd, f"{prefix}.bias"),
    }


def _conv_transpose2d(sd, prefix) -> Tree:
    w = _np(sd, f"{prefix}.weight")  # [in, out, kh, kw]
    k = w.transpose(2, 3, 0, 1)[::-1, ::-1]  # HWIO, spatially flipped
    return {"kernel": np.ascontiguousarray(k),
            "bias": _np(sd, f"{prefix}.bias")}


def _dense(sd, prefix) -> Tree:
    return {
        "kernel": _np(sd, f"{prefix}.weight").T,
        "bias": _np(sd, f"{prefix}.bias"),
    }


def _layernorm(sd, prefix) -> Tree:
    return {
        "scale": _np(sd, f"{prefix}.weight"),
        "bias": _np(sd, f"{prefix}.bias"),
    }


def _mha(sd, prefix) -> Tree:
    return {
        "in_proj_kernel": _np(sd, f"{prefix}.in_proj_weight").T,
        "in_proj_bias": _np(sd, f"{prefix}.in_proj_bias"),
        "out_proj_kernel": _np(sd, f"{prefix}.out_proj.weight").T,
        "out_proj_bias": _np(sd, f"{prefix}.out_proj.bias"),
    }


def _grouped_gru(sd, prefix, groups: int, bidirectional: bool) -> Tree:
    """Stack torch gru1..gru{G} (models/generator.py:52-75, 169-192) into
    the fused [directions, G, ...] layout of models/gru.py."""
    dirs = 2 if bidirectional else 1
    pfx = f"{prefix}." if prefix else ""
    w_ih, w_hh, b_ih, b_hh = [], [], [], []
    for d in range(dirs):
        sfx = "_reverse" if d == 1 else ""
        w_ih.append([_np(sd, f"{pfx}gru{g + 1}.weight_ih_l0{sfx}").T
                     for g in range(groups)])
        w_hh.append([_np(sd, f"{pfx}gru{g + 1}.weight_hh_l0{sfx}").T
                     for g in range(groups)])
        b_ih.append([_np(sd, f"{pfx}gru{g + 1}.bias_ih_l0{sfx}")
                     for g in range(groups)])
        b_hh.append([_np(sd, f"{pfx}gru{g + 1}.bias_hh_l0{sfx}")
                     for g in range(groups)])
    return {
        "w_ih": np.asarray(w_ih),
        "w_hh": np.asarray(w_hh),
        "b_ih": np.asarray(b_ih),
        "b_hh": np.asarray(b_hh),
    }


def _gru_block(sd, prefix, bidirectional: bool, groups: int = 4) -> Tree:
    return {
        "layernorm1": _layernorm(sd, f"{prefix}.layernorm1"),
        "layernorm2": _layernorm(sd, f"{prefix}.layernorm2"),
        "gru": _grouped_gru(sd, prefix, groups, bidirectional),
        "attn": _mha(sd, f"{prefix}.attn"),
        "lin": _dense(sd, f"{prefix}.lin"),
    }


def convert_generator(sd: Mapping[str, Any], prefix: str = "") -> Tree:
    """Convert an LCTGenerator state_dict (keys like 'conv1.weight')."""
    p = prefix
    return {
        "conv1": _conv2d(sd, f"{p}conv1"),
        "conv2": _conv2d(sd, f"{p}conv2"),
        "conv3": _conv2d(sd, f"{p}conv3"),
        "skip2": _conv2d(sd, f"{p}skip2"),
        "skip3": _conv2d(sd, f"{p}skip3"),
        "skip4": _conv2d(sd, f"{p}skip4"),
        "layernorm": _layernorm(sd, f"{p}layernorm"),
        "GRUf1": _gru_block(sd, f"{p}GRUf1", bidirectional=True),
        "GRUt1": _gru_block(sd, f"{p}GRUt1", bidirectional=False),
        "GRUf2": _gru_block(sd, f"{p}GRUf2", bidirectional=True),
        "deconv2": _conv_transpose2d(sd, f"{p}deconv2"),
        "deconv3": _conv_transpose2d(sd, f"{p}deconv3"),
        "deconv4": _conv_transpose2d(sd, f"{p}deconv4"),
    }


def convert_enhancer(sd: Mapping[str, Any]) -> Tree:
    """Convert an LCTEnhancer state_dict ('gen.*' keys; the stft.window
    buffer is a compile-time constant here and is ignored)."""
    return {"gen": convert_generator(sd, prefix="gen.")}


def _wn_conv2d(sd, prefix) -> Tree:
    v = _np(sd, f"{prefix}.weight_v").transpose(2, 3, 1, 0)
    g = _np(sd, f"{prefix}.weight_g").reshape(-1)
    return {"v": v, "g": g, "bias": _np(sd, f"{prefix}.bias")}


def _wn_conv1d(sd, prefix) -> Tree:
    v = _np(sd, f"{prefix}.weight_v").transpose(2, 1, 0)
    g = _np(sd, f"{prefix}.weight_g").reshape(-1)
    return {"v": v, "g": g, "bias": _np(sd, f"{prefix}.bias")}


def _sn_conv(sd, prefix, conv1d: bool) -> Tuple[Tree, Tree]:
    """torch.nn.utils.spectral_norm params (weight_orig/weight_u/weight_v)
    -> (params, spectral buffers) for SNConv.

    torch matricizes weight as [out, -1] in (in, k...) column order; our
    HWIO matricization orders columns (k..., in), so v is permuted
    accordingly (sigma = u W v is invariant under the matched permutation).
    """
    w = _np(sd, f"{prefix}.weight_orig")
    u = _np(sd, f"{prefix}.weight_u")
    v = _np(sd, f"{prefix}.weight_v")
    if conv1d:
        out_ch, in_g, k = w.shape
        kernel = w.transpose(2, 1, 0)  # WIO
        v_perm = v.reshape(in_g, k).transpose(1, 0).reshape(-1)
    else:
        out_ch, in_g, kh, kw = w.shape
        kernel = w.transpose(2, 3, 1, 0)  # HWIO
        v_perm = v.reshape(in_g, kh, kw).transpose(1, 2, 0).reshape(-1)
    params = {"kernel": kernel, "bias": _np(sd, f"{prefix}.bias")}
    spectral = {"u": u, "v": v_perm}
    return params, spectral


def convert_mpd_sn(sd: Mapping[str, Any],
                   periods: Sequence[int] = (2, 3, 5, 7, 11)
                   ) -> Tuple[Tree, Tree]:
    """Convert a spectral-normed MultiPeriodDiscriminator state_dict
    (reference: discriminators.py:29-33 with use_spectral_norm=True).
    Returns (params, spectral) trees."""
    params: Tree = {}
    spectral: Tree = {}
    for i, p in enumerate(periods):
        pre = f"discriminators.{i}"
        psub: Tree = {}
        ssub: Tree = {}
        for j in range(5):
            psub[f"conv{j}"], ssub[f"conv{j}"] = _sn_conv(
                sd, f"{pre}.convs.{j}", conv1d=False)
        psub["conv_post"], ssub["conv_post"] = _sn_conv(
            sd, f"{pre}.conv_post", conv1d=False)
        params[f"disc_p{p}"] = psub
        spectral[f"disc_p{p}"] = ssub
    return params, spectral


def convert_msd_sn(sd: Mapping[str, Any],
                   num_scales: int = 3) -> Tuple[Tree, Tree]:
    """Convert a MultiScaleDiscriminator state_dict with
    use_spectral_norm=True: spectral norm on scale 0 only, weight norm on
    the rest (reference: discriminators.py:243-248).
    Returns (params, spectral) trees."""
    params: Tree = {}
    spectral: Tree = {}
    for i in range(num_scales):
        pre = f"discriminators.{i}"
        psub: Tree = {}
        ssub: Tree = {}
        for j in range(7):
            name = f"conv{j}" if j < 6 else "conv_post"
            tkey = f"{pre}.convs.{j}" if j < 6 else f"{pre}.conv_post"
            if i == 0:
                psub[name], ssub[name] = _sn_conv(sd, tkey, conv1d=True)
            else:
                psub[name] = _wn_conv1d(sd, tkey)
        params[f"disc_s{i}"] = psub
        if ssub:
            spectral[f"disc_s{i}"] = ssub
    return params, spectral


def convert_mpd(sd: Mapping[str, Any],
                periods: Sequence[int] = (2, 3, 5, 7, 11)) -> Tree:
    """Convert a MultiPeriodDiscriminator state_dict
    (reference: models/discriminators.py:106-147)."""
    out: Tree = {}
    for i, p in enumerate(periods):
        pre = f"discriminators.{i}"
        sub: Tree = {}
        for j in range(5):
            sub[f"conv{j}"] = _wn_conv2d(sd, f"{pre}.convs.{j}")
        sub["conv_post"] = _wn_conv2d(sd, f"{pre}.conv_post")
        out[f"disc_p{p}"] = sub
    return out


def convert_msd(sd: Mapping[str, Any], num_scales: int = 3) -> Tree:
    """Convert a MultiScaleDiscriminator state_dict
    (reference: models/discriminators.py:227-286)."""
    out: Tree = {}
    for i in range(num_scales):
        pre = f"discriminators.{i}"
        sub: Tree = {}
        for j in range(6):
            sub[f"conv{j}"] = _wn_conv1d(sd, f"{pre}.convs.{j}")
        sub["conv_post"] = _wn_conv1d(sd, f"{pre}.conv_post")
        out[f"disc_s{i}"] = sub
    return out
