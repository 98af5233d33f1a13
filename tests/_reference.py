"""Helpers to import the read-only reference implementation as an oracle.

The reference repo is mounted at /root/reference and is plain
PyTorch-on-CPU; we import its modules under their own package layout for
numerical parity tests only. Nothing from the reference is used in the
framework itself.
"""

import os
import sys

REFERENCE_ROOT = os.environ.get("LCT_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def import_reference():
    """Import reference modules (models.generator, models.discriminators,
    datasets.stft, losses) with /root/reference first on sys.path."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # The reference's 'datasets' package may collide with an installed
    # 'datasets' (HuggingFace). Force ours.
    for mod in list(sys.modules):
        if mod == "datasets" or mod.startswith("datasets."):
            path = getattr(sys.modules[mod], "__file__", "") or ""
            if REFERENCE_ROOT not in path:
                del sys.modules[mod]
    import importlib
    import types

    # The reference's datasets/__init__.py imports torchaudio (absent in
    # this image, eval-only there); stub it so datasets.stft is importable.
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.functional = types.ModuleType("torchaudio.functional")
        ta.load = None
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = ta.functional

    stft = importlib.import_module("datasets.stft")
    generator = importlib.import_module("models.generator")
    discriminators = importlib.import_module("models.discriminators")
    losses = importlib.import_module("losses")
    return stft, generator, discriminators, losses
