"""ctypes binding for the native wav decode + resample library.

Builds lazily (g++ one-liner) on first use; the Python/numpy reader in
lct_gan_tpu/data/audio_io.py is the fallback when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libwavio.so")
_LIB = None
_LOCK = threading.Lock()
_TLS = threading.local()


def _get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["sh", os.path.join(_HERE, "build.sh")],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                raise ImportError("native wav library unavailable")
        lib = ctypes.CDLL(_SO)
        lib.lct_load_mono_wave.restype = ctypes.c_long
        lib.lct_load_mono_wave.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.lct_copy_samples.restype = None
        lib.lct_copy_samples.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        _LIB = lib
    return _LIB


def load_mono_wave_native(path: str, target_sr: int = 0
                          ) -> Optional[Tuple[np.ndarray, int]]:
    """Decode + downmix + resample natively. Returns None on any failure so
    the caller falls back to the numpy reader."""
    try:
        lib = _get_lib()
    except ImportError:
        return None
    out_sr = ctypes.c_int(0)
    n = lib.lct_load_mono_wave(path.encode("utf-8"), int(target_sr),
                               ctypes.byref(out_sr))
    if n < 0:
        return None
    buf = np.empty(int(n), dtype=np.float32)
    lib.lct_copy_samples(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(n))
    return buf, int(out_sr.value)
