"""Native host runtime: C++ implementations of sequential host-side loops
(k-mer selection walk, ...), compiled on first use and loaded via ctypes.

The TPU compute path (ops/) handles the dense math; this layer covers the
orchestration loops the reference implements in OpenMP C++ that are neither
TPU-shaped nor fast enough in Python at production scale.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build() -> str | None:
    src = os.path.join(_HERE, "kmer_select.cpp")
    out = os.path.join(_HERE, "_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib():
    """Returns the loaded native library, or None (callers fall back to
    the pure-Python implementations)."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _build()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        lib.select_kmers_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        lib.select_kmers_batch.restype = None
        _LIB = lib
        return _LIB


def select_kmers_batch(masked_kmers: np.ndarray, hashes: np.ndarray,
                       seq_offsets: np.ndarray,
                       kmer_considered: np.ndarray) -> np.ndarray | None:
    """Batched selection walk; returns bool mask or None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    masked_kmers = np.ascontiguousarray(masked_kmers, dtype=np.uint64)
    hashes = np.ascontiguousarray(hashes, dtype=np.uint16)
    seq_offsets = np.ascontiguousarray(seq_offsets, dtype=np.int64)
    kmer_considered = np.ascontiguousarray(kmer_considered, dtype=np.int64)
    selected = np.zeros(len(masked_kmers), dtype=np.uint8)
    lib.select_kmers_batch(
        masked_kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        seq_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        kmer_considered.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(kmer_considered),
        selected.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return selected.astype(bool)
