"""ctypes binding + builder for the native augmentation hot ops.

`data/augment.py` dispatches its inverse-warp (rotate/shear/translate) and
the CLIP normalize through here when the library builds; the numpy path
stays as the always-available fallback AND the parity oracle
(tests/test_augment_native.py asserts byte-identical outputs).

Build flags: bit-exact fp32 parity with numpy requires no FMA contraction
(-ffp-contract=off) and strict IEEE ordering (no -ffast-math); -O3
vectorization preserves both.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "augment.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libaugment.so")

logger = logging.getLogger(__name__)

# Unlike wordpiece/feature_store (built from single-threaded contexts,
# pid-unique tmp suffices), this library is first touched from
# load_images' WORKER THREADS — the build must be serialized in-process
# and the tmp name thread-unique, or two g++ runs interleave into one file
# and a corrupt .so (mtime newer than the source) poisons every later run.
_BUILD_LOCK = threading.Lock()


def ensure_built(force: bool = False) -> str:
    if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        # temp + atomic rename: concurrent builders must never dlopen a
        # half-written .so
        tmp = f"{_LIB}.{os.getpid()}.{threading.get_ident()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                check=True)
            os.replace(tmp, _LIB)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return _LIB


class _Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.affine_inverse_warp_u8.restype = ctypes.c_int
        lib.affine_inverse_warp_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_float]
        lib.normalize_u8.restype = ctypes.c_int
        lib.normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        for name in ("autocontrast_u8", "equalize_u8"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_uint8)]
        lib.sharpness_u8.restype = ctypes.c_int
        lib.sharpness_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]

    def warp(self, img: np.ndarray, inv: np.ndarray,
             fill: float) -> np.ndarray:
        h, w, c = img.shape
        img = np.ascontiguousarray(img, np.uint8)
        inv6 = np.ascontiguousarray(inv, np.float32).reshape(6)
        out = np.empty_like(img)
        rc = self._lib.affine_inverse_warp_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            inv6.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_float(fill))
        if rc != 0:
            raise ValueError("affine_inverse_warp_u8 failed")
        return out

    def _chanop(self, name: str, img: np.ndarray) -> np.ndarray:
        h, w, c = img.shape
        assert c == 3
        img = np.ascontiguousarray(img, np.uint8)
        out = np.empty_like(img)
        rc = getattr(self._lib, name)(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h * w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise ValueError(f"{name} failed")
        return out

    def autocontrast(self, img: np.ndarray) -> np.ndarray:
        return self._chanop("autocontrast_u8", img)

    def equalize(self, img: np.ndarray) -> np.ndarray:
        return self._chanop("equalize_u8", img)

    def sharpness(self, img: np.ndarray, factor: float) -> np.ndarray:
        h, w, c = img.shape
        assert c == 3
        img = np.ascontiguousarray(img, np.uint8)
        out = np.empty_like(img)
        rc = self._lib.sharpness_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            ctypes.c_float(factor),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise ValueError("sharpness_u8 failed")
        return out

    def normalize(self, img: np.ndarray, mean: np.ndarray,
                  std: np.ndarray) -> np.ndarray:
        h, w, c = img.shape
        assert c == 3
        img = np.ascontiguousarray(img, np.uint8)
        out = np.empty((h, w, 3), np.float32)
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        self._lib.normalize_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h * w,
            mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out


_cached: object = None


def load():
    """Build + load the library; None when unavailable (no g++ etc.) — the
    numpy path serves. Cached per process; thread-safe (worker threads race
    here on first batch)."""
    global _cached
    if _cached is None:
        with _BUILD_LOCK:
            if _cached is None:
                try:
                    _cached = _Native(ctypes.CDLL(ensure_built()))
                except Exception as e:  # noqa: BLE001 -> numpy path
                    logger.warning(
                        "native augment unavailable (%s); numpy path", e)
                    _cached = False
    return _cached or None
