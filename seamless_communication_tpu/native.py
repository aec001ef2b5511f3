"""ctypes bindings for the native C++ host runtime (native/fbank.cpp): fast fbank
extraction and WAV decode for the data-loading path. Auto-builds with cmake+ninja on
first use; all callers fall back to the numpy implementations when the toolchain or
library is unavailable (audio/fbank.py, audio/wav.py — identical math)."""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    build_dir = _NATIVE_DIR / "build"
    lib = build_dir / "lib" / "libseamless_native.so"
    if lib.exists():
        return lib
    try:
        build_dir.mkdir(exist_ok=True)
        subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=build_dir, check=True,
                       capture_output=True)
        subprocess.run(["ninja"], cwd=build_dir, check=True, capture_output=True)
        return lib if lib.exists() else None
    except Exception as e:  # toolchain missing / build failure -> numpy fallback
        logger.debug("native build failed: %s", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.seamless_fbank.restype = ctypes.c_int
    lib.seamless_fbank.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.seamless_wav_decode.restype = ctypes.c_int64
    lib.seamless_wav_decode.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def fbank_native(waveform: np.ndarray, *, num_mel_bins: int = 80,
                 sample_rate: float = 16000.0) -> Optional[np.ndarray]:
    """Native fbank; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    wav = np.ascontiguousarray(waveform, np.float32)
    max_frames = max(0, 1 + (len(wav) - 400) // 160)
    out = np.empty((max_frames, num_mel_bins), np.float32)
    if max_frames == 0:
        return out
    n = lib.seamless_fbank(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        num_mel_bins, sample_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames)
    if n < 0:
        return None
    return out[:n]


def wav_decode_native(data: bytes) -> Optional[Tuple[np.ndarray, int]]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    max_samples = len(data) // 2 + 16
    out = np.empty(max_samples, np.float32)
    rate = ctypes.c_int32(0)
    n = lib.seamless_wav_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
        ctypes.byref(rate))
    if n < 0:
        return None
    return out[:n].copy(), int(rate.value)
