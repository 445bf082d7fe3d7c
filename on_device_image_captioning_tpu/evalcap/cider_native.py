"""ctypes binding for the native C++ CIDEr scorer (native/cider.cc).

Drop-in accelerated replacement for evalcap.cider.CiderCorpus on the SCST hot
path: the reward computation runs on host between every sampling call and
gradient step (reference losses/reward.py:30-89); the C++ scorer removes the
Python dict arithmetic from that loop. Numerics match the Python scorer (and
therefore the reference's coco-caption scorer) to float32 precision.

The shared library builds on first use with g++ -O3 and is cached next to the
source; `NativeCiderCorpus.available()` reports whether a toolchain exists so
callers can fall back to the Python implementation.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "cider.cc",
)
_LIB = os.path.join(os.path.dirname(_SRC), "libcider.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_RS, _US = "\x1e", "\x1f"


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.check_call(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
        )
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.cider_corpus_new.restype = ctypes.c_void_p
        lib.cider_corpus_new.argtypes = [ctypes.c_char_p]
        lib.cider_corpus_free.argtypes = [ctypes.c_void_p]
        lib.cider_corpus_size.restype = ctypes.c_int
        lib.cider_corpus_size.argtypes = [ctypes.c_void_p]
        lib.cider_score.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


class NativeCiderCorpus:
    """Same interface as evalcap.cider.CiderCorpus.score_hypotheses."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def __init__(self, refs_per_image: Sequence[List[str]]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native cider library unavailable (no g++?)")
        self._lib = lib
        blob = _RS.join(_US.join(refs) for refs in refs_per_image).encode("utf-8")
        self._handle = lib.cider_corpus_new(blob)
        assert lib.cider_corpus_size(self._handle) == len(refs_per_image)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.cider_corpus_free(self._handle)
            self._handle = None

    def score_hypotheses(
        self, hypotheses: Sequence[str], ref_indices: Optional[Sequence[int]] = None
    ) -> np.ndarray:
        n = len(hypotheses)
        if ref_indices is None:
            ref_indices = range(n)
        idx = (ctypes.c_int * n)(*[int(i) for i in ref_indices])
        out = (ctypes.c_float * n)()
        blob = _RS.join(hypotheses).encode("utf-8")
        self._lib.cider_score(self._handle, blob, idx, n, out)
        return np.asarray(out, dtype=np.float32)
