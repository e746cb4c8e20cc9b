"""ctypes bindings for the native host-preprocessing kernels.

Auto-builds ``native/libe4s_preprocess.so`` with g++ on first use (cached);
falls back to numpy when no toolchain is available. Used by the DataLoader's
batch assembly — the only dense per-pixel host work on the training path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libe4s_preprocess.so")

_f32p = ctypes.POINTER(ctypes.c_float)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("E4S_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "preprocess.cpp")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                     "-fPIC", src, "-o", _SO_PATH],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.to_tensor_normalize.argtypes = [
                _u8p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int
            ]
            lib.remap_labels.argtypes = [_u8p, _i32p, _i32p, ctypes.c_int64]
            lib.label_to_onehot.argtypes = [
                _i32p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
            ]
            lib.remap_and_onehot.argtypes = [
                _u8p, _i32p, _i32p, _f32p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.hflip_chw.argtypes = [
                _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
            ]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def to_tensor_normalize(img_hwc_u8: np.ndarray, normalize: bool = True) -> np.ndarray:
    """uint8 [H,W,3] -> float32 [3,H,W] in [-1,1] (or [0,1])."""
    lib = _load()
    img_hwc_u8 = np.ascontiguousarray(img_hwc_u8)
    h, w = img_hwc_u8.shape[:2]
    if lib is None:
        out = img_hwc_u8.astype(np.float32) / 255.0
        out = np.transpose(out, (2, 0, 1))
        return out * 2 - 1 if normalize else out
    dst = np.empty((3, h, w), np.float32)
    lib.to_tensor_normalize(
        img_hwc_u8.ctypes.data_as(_u8p), dst.ctypes.data_as(_f32p),
        h, w, int(normalize),
    )
    return dst


def make_lut(pairs, num_src: int = 256) -> np.ndarray:
    """Converter spec [(sources, target), ...] -> int32[256] LUT."""
    lut = np.zeros((num_src,), np.int32)
    for sources, target in pairs:
        for s in sources:
            lut[s] = target
    return lut


def remap_and_onehot(label_u8: np.ndarray, lut: np.ndarray, num_cls: int = 12):
    """uint8 [H,W] raw labels -> (int32 [H,W], float32 [C,H,W] one-hot)."""
    lib = _load()
    label_u8 = np.ascontiguousarray(label_u8)
    h, w = label_u8.shape
    if lib is None:
        labels = lut[label_u8].astype(np.int32)
        onehot = np.zeros((num_cls, h, w), np.float32)
        for c in range(num_cls):
            onehot[c] = labels == c
        return labels, onehot
    labels = np.empty((h, w), np.int32)
    onehot = np.empty((num_cls, h, w), np.float32)
    lib.remap_and_onehot(
        label_u8.ctypes.data_as(_u8p),
        np.ascontiguousarray(lut, np.int32).ctypes.data_as(_i32p),
        labels.ctypes.data_as(_i32p), onehot.ctypes.data_as(_f32p),
        h, w, num_cls,
    )
    return labels, onehot


def hflip_chw(x: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        return x[..., ::-1].copy()
    x = np.ascontiguousarray(x, np.float32)
    c, h, w = x.shape
    lib.hflip_chw(x.ctypes.data_as(_f32p), c, h, w)
    return x
