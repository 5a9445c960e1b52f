"""ctypes bindings for the native C++ data-loading core (native/dataloader.cc).

Builds the shared library on first use (g++ is in the image; no pip). Falls
back cleanly when a compiler is unavailable — callers check
:func:`available` and use the numpy path otherwise.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / 'native'
_LIB_PATH = _NATIVE_DIR / 'libdataloader.so'
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(['make', '-C', str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=300)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists() and not _build():
        _build_failed = True
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.dl_open.restype = ctypes.c_void_p
    lib.dl_open.argtypes = [ctypes.c_char_p]
    lib.dl_close.argtypes = [ctypes.c_void_p]
    lib.dl_num_entries.argtypes = [ctypes.c_void_p]
    lib.dl_entry_name.restype = ctypes.c_char_p
    lib.dl_entry_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.dl_load_frames.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeNpz:
    """Native per-scene npz frame archive with parallel batched decoding."""

    def __init__(self, path: str | Path):
        lib = _load()
        if lib is None:
            raise RuntimeError('native dataloader unavailable')
        self._lib = lib
        self._h = lib.dl_open(str(path).encode())
        if not self._h:
            raise IOError(f'failed to open npz {path}')

    def keys(self) -> list[str]:
        n = self._lib.dl_num_entries(self._h)
        return [self._lib.dl_entry_name(self._h, i).decode()
                for i in range(n)]

    def load_frames(self, entries: Sequence[str], out_hw=(256, 256),
                    resize_hw=(0, 0), square_crop=True,
                    n_threads: int = 8) -> np.ndarray:
        """Decode+resize+crop+normalize frames to (N, H, W, 3) f32 in
        [-1, 1] on the worker pool."""
        n = len(entries)
        out = np.empty((n, out_hw[0], out_hw[1], 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[e.encode() for e in entries])
        ok = self._lib.dl_load_frames(
            self._h, arr, n, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
            out_hw[0], out_hw[1], resize_hw[0], resize_hw[1],
            int(square_crop), n_threads)
        if ok != n:
            raise IOError(f'decoded {ok}/{n} frames')
        return out

    def __del__(self):
        if getattr(self, '_h', None):
            self._lib.dl_close(self._h)
