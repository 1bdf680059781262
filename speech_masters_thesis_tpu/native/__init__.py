"""ctypes bindings for the native host runtime (native/wavio.c).

Builds the shared library on first import if the C toolchain is available;
consumers (utils/audio_io.py) transparently fall back to the scipy path when
the library can't be built or a file isn't plain RIFF/PCM.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsmtnative.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # pragma: no cover - depends on toolchain
        logger.debug("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Loads (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        logger.debug("native load failed: %s", e)
        return None
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                             ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_read_f32.argtypes = [ctypes.c_char_p,
                                 np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                                 ctypes.c_long]
    lib.wav_read_f32.restype = ctypes.c_long
    lib.wav_write_i16.argtypes = [ctypes.c_char_p,
                                  np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                                  ctypes.c_long, ctypes.c_int]
    lib.wav_write_i16.restype = ctypes.c_int
    _lib = lib
    return _lib


def read_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decodes a PCM WAV to (mono float32 [-1,1], sample_rate); None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    n_samples = ctypes.c_long()
    sample_rate = ctypes.c_int()
    channels = ctypes.c_int()
    if lib.wav_info(path.encode(), ctypes.byref(n_samples), ctypes.byref(sample_rate),
                    ctypes.byref(channels)) != 0:
        return None
    out = np.empty(n_samples.value, dtype=np.float32)
    got = lib.wav_read_f32(path.encode(), out, n_samples.value)
    if got < 0:
        return None
    return out[:got], sample_rate.value


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    return lib.wav_write_i16(path.encode(), audio, len(audio), sample_rate) == 0
