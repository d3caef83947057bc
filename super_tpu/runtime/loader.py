"""ctypes bindings for the native frame-loading runtime.

Replaces the reference's Python DataLoader workers (shared_functions.py:174)
with a C++ thread pool (frame_loader.cpp) that decodes .npy disparity and
.png RGB ahead of the tracker.  Auto-builds the shared library on first use
(g++ + libpng are part of the image); falls back gracefully when a native
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsuper_runtime.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.sr_open_sequence.restype = ctypes.c_void_p
    lib.sr_open_sequence.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
    ]
    lib.sr_next.restype = ctypes.c_int
    lib.sr_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_float)]
    lib.sr_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeSequenceLoader:
    """In-order prefetching loader over (depth .npy, rgb .png) file pairs.

    Usage:
      with NativeSequenceLoader(depth_paths, rgb_paths, h, w) as ld:
          for idx, depth, rgb in ld:   # depth (H, W); rgb (3, H, W) in [0,1]
              ...
    """

    def __init__(self, depth_paths: List[Optional[str]],
                 rgb_paths: List[Optional[str]], height: int, width: int,
                 workers: int = 3, min_depth: float = 0.1,
                 max_depth: float = 80.0, disp_to_depth: bool = True,
                 lookahead: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable (build failed)")
        self._lib = lib
        self._n = len(depth_paths)
        self._h, self._w = height, width
        enc = lambda p: p.encode() if p else None  # noqa: E731
        self._dp = (ctypes.c_char_p * self._n)(*[enc(p) for p in depth_paths])
        self._rp = (ctypes.c_char_p * self._n)(*[enc(p) for p in rgb_paths])
        self._handle = lib.sr_open_sequence(
            self._dp, self._rp, self._n, height, width, workers,
            min_depth, max_depth, 1 if disp_to_depth else 0, lookahead)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        depth = np.empty((self._h, self._w), dtype=np.float32)
        rgb = np.empty((3, self._h, self._w), dtype=np.float32)
        while True:
            idx = self._lib.sr_next(
                self._handle,
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if idx == -1:
                return
            if idx == -2:
                continue  # decode failure: skip frame (reported by caller)
            yield idx, depth.copy(), rgb.copy()

    def close(self):
        if self._handle:
            self._lib.sr_close(self._handle)
            self._handle = None
