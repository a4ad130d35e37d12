"""ctypes bindings for the native host-preprocessing library.

Builds lazily with make/g++ on first use; every entry point has a numpy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpreprocess.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.preprocess_clip.restype = ctypes.c_int
        lib.preprocess_clip.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.to_uint8_clip.restype = ctypes.c_int
        lib.to_uint8_clip.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_clip(frames: np.ndarray, out_h: int, out_w: int,
                    num_threads: int = 0) -> np.ndarray:
    """(T,H,W,3) uint8 -> (T,out_h,out_w,3) float32 in [-1,1]:
    bilinear resize-to-cover + center crop + normalize."""
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    lib = _load()
    if lib is not None:
        out = np.empty((t, out_h, out_w, 3), np.float32)
        rc = lib.preprocess_clip(
            frames.ctypes.data, t, h, w, out.ctypes.data, out_h, out_w,
            num_threads)
        if rc == 0:
            return out
    # numpy fallback (cv2 if importable, else naive)
    try:
        import cv2

        scale = max(out_h / h, out_w / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        res = np.empty((t, nh, nw, 3), np.uint8)
        for i in range(t):
            res[i] = cv2.resize(frames[i], (nw, nh),
                                interpolation=cv2.INTER_LINEAR)
        top, left = (nh - out_h) // 2, (nw - out_w) // 2
        res = res[:, top:top + out_h, left:left + out_w]
        return res.astype(np.float32) / 127.5 - 1.0
    except ImportError:
        raise RuntimeError("neither native lib nor cv2 available")


def to_uint8_clip(video: np.ndarray, num_threads: int = 0) -> np.ndarray:
    video = np.ascontiguousarray(video, np.float32)
    lib = _load()
    if lib is not None:
        t, h, w, _ = video.shape
        out = np.empty(video.shape, np.uint8)
        rc = lib.to_uint8_clip(video.ctypes.data, t, h, w, out.ctypes.data,
                               num_threads)
        if rc == 0:
            return out
    v = np.clip(video, -1.0, 1.0)
    return ((v + 1.0) * 127.5 + 0.5).astype(np.uint8)
