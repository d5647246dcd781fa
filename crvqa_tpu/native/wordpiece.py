"""ctypes binding for the native WordPiece encoder (`wordpiece.cpp`).

Bulk host-side tokenization fast path: the ASCII subset of the BERT
algorithm runs in C++ (the overwhelming majority of VQA questions); rows
containing any non-ASCII byte are reported back (`lens[i] == -1`) and the
caller's pure-Python tokenizer handles them (NFD accent strip, CJK
isolation, unicode categories). Compiled on demand with g++, same pattern
as `feature_store.py`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "wordpiece.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libwordpiece.so")


def ensure_built(force: bool = False) -> str:
    if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        # compile to a process-unique temp and rename atomically: concurrent
        # processes (pytest workers, train + score CLIs) must never dlopen a
        # half-written .so
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", tmp],
                check=True)
            os.replace(tmp, _LIB)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return _LIB


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_encode_batch.restype = ctypes.c_long
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long)]
        _lib = lib
    return _lib


class NativeWordPiece:
    """Holds a native vocab handle; `encode_batch` returns raw wordpiece ids
    (no specials added) per text, with None marking fallback rows."""

    def __init__(self, vocab: dict, specials: Sequence[str], unk_id: int):
        lib = _load_lib()
        # vocab blob in id order ('\n'-joined)
        items = sorted(vocab.items(), key=lambda kv: kv[1])
        assert [i for _, i in items] == list(range(len(items))), \
            "vocab ids must be dense 0..n-1"
        blob = "\n".join(t for t, _ in items).encode("utf-8")
        sblob = "\n".join(specials).encode("utf-8")
        self._lib = lib
        self._h = lib.wp_create(blob, sblob, unk_id)
        if not self._h:
            raise RuntimeError("wp_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.wp_destroy(h)
            self._h = None

    def encode_batch(self, texts: Sequence[str], cap: int = 512):
        """-> list of (list[int] | None); None rows need the Python path."""
        n = len(texts)
        if n == 0:
            return []
        enc = [t.encode("utf-8", errors="surrogatepass") for t in texts]
        # embedded NUL would truncate the C string where Python drops the
        # char — route such rows to the Python fallback (empty string is
        # ASCII-clean and encodes to []).
        nul = [b"\x00" in e for e in enc]
        arr = (ctypes.c_char_p * n)(
            *[b"" if bad else e for e, bad in zip(enc, nul)])
        out_ids = np.empty((n, cap), np.int32)
        out_lens = np.empty((n,), np.int64)
        self._lib.wp_encode_batch(
            self._h, arr, n, cap,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        return [out_ids[i, : out_lens[i]].tolist()
                if out_lens[i] >= 0 and not nul[i] else None
                for i in range(n)]
