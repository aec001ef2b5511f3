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
    lib.seamless_loader_create.restype = ctypes.c_void_p
    lib.seamless_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.seamless_loader_next_meta.restype = ctypes.c_int
    lib.seamless_loader_next_meta.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.seamless_loader_next_data.restype = ctypes.c_int
    lib.seamless_loader_next_data.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.seamless_loader_destroy.restype = None
    lib.seamless_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.seamless_spm_create.restype = ctypes.c_void_p
    lib.seamless_spm_create.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.seamless_spm_encode.restype = ctypes.c_int64
    lib.seamless_spm_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.seamless_spm_destroy.restype = None
    lib.seamless_spm_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class NativeSpmEncoder:
    """C++ unigram Viterbi (native/spm.cpp); byte-exact with the Python
    SentencePieceModel.encode (which remains the parity reference). Raises
    RuntimeError if the native library is unavailable."""

    def __init__(self, pieces, scores, matchable, byte_ids: dict, unk_id: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        blob = b"".join(p.encode("utf-8") for p in pieces)
        offsets = np.zeros(len(pieces) + 1, np.int64)
        np.cumsum([len(p.encode("utf-8")) for p in pieces], out=offsets[1:])
        self._blob = np.frombuffer(blob, np.uint8).copy()
        self._offsets = offsets
        self._scores = np.asarray(scores, np.float32)
        self._matchable = np.asarray(matchable, np.uint8)
        bids = np.full(256, -1, np.int32)
        for b, i in byte_ids.items():
            bids[b] = i
        self._bids = bids
        self._h = lib.seamless_spm_create(
            self._blob.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(pieces),
            self._scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._matchable.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            bids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), unk_id)
        if not self._h:
            raise RuntimeError("spm model creation failed")

    def encode_normalized(self, text: str):
        data = np.frombuffer(text.encode("utf-8"), np.uint8)
        if len(data) == 0:
            return []
        out = np.empty(max(16, 4 * len(data)), np.int32)
        n = self._lib.seamless_spm_encode(
            self._h, data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(out))
        if n < 0:
            raise RuntimeError("spm encode failed")
        return out[:n].tolist()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.seamless_spm_destroy(self._h)
                self._h = None
        except Exception:
            pass


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


class NativeFbankLoader:
    """Threaded C++ wav->fbank batch loader (native/dataloader.cpp).

    Iterates (fbank (B, T_padded, n_mels) float32, lengths (B,) int32) batches in
    file order; unreadable/corrupted files come back with length 0 for the caller
    to mask (reference evaluate.py:205-245). Construction raises RuntimeError if
    the native library is unavailable — callers fall back to the Python path.
    """

    def __init__(self, paths, *, batch_size: int = 8, n_mels: int = 80,
                 bucket: int = 128, n_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.paths = [str(p) for p in paths]
        self.n_mels = n_mels
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._arr = arr  # keep alive
        self._h = lib.seamless_loader_create(arr, len(self.paths), batch_size,
                                             n_mels, bucket, n_threads)
        if not self._h:
            raise RuntimeError("loader creation failed")

    def __iter__(self):
        return self

    def __next__(self):
        frames = ctypes.c_int64(0)
        n = self._lib.seamless_loader_next_meta(self._h, ctypes.byref(frames))
        if n <= 0:
            raise StopIteration
        out = np.empty((n, frames.value, self.n_mels), np.float32)
        lengths = np.empty(n, np.int32)
        got = self._lib.seamless_loader_next_data(
            self._h, frames.value,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if got != n:
            raise RuntimeError("loader batch copy failed")
        return out, lengths

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.seamless_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


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
