"""Native host runtime: C++ implementations of host-side hot loops
(k-mer selection walk, per-pair overlap scoring, correction coverage
accumulation), compiled on first use and loaded via ctypes.

The TPU compute path (ops/) handles the dense math on the accelerator;
this layer serves the same math at native speed on hosts without one and
covers the orchestration loops the reference implements in OpenMP C++
that are neither TPU-shaped nor fast enough in Python at production
scale.  Every entry point has a pure-NumPy fallback in its caller, so a
missing toolchain degrades to slow-but-correct.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["kmer_select.cpp", "host_kernels.cpp"]
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_u16p = ctypes.POINTER(ctypes.c_uint16)
_u64p = ctypes.POINTER(ctypes.c_uint64)


def _build() -> str | None:
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    out = os.path.join(_HERE, "_native.so")
    if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    for flags in (["-fopenmp"], []):  # tolerate toolchains without OpenMP
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", *flags, *srcs, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return out
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return None


def _as(arr, dtype, ptr):
    return np.ascontiguousarray(arr, dtype=dtype).ctypes.data_as(ptr)


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
        lib.select_kmers_batch.argtypes = [_u64p, _u16p, _i64p, _i64p,
                                           ctypes.c_int64, _u8p]
        lib.select_kmers_batch.restype = None
        lib.score_pairs.argtypes = [_u8p, _i64p, _i64p, _i32p, _i32p, _i32p,
                                    _u8p, ctypes.c_int64,
                                    _i32p, _i32p, _i32p, _i32p, _i32p,
                                    _i32p, _i32p]
        lib.score_pairs.restype = None
        lib.correction_accumulate.argtypes = [
            _u8p, _i64p, _i64p, _i32p, _i32p, _u8p, _i32p, _i32p, _i32p,
            _u8p, _i32p, ctypes.c_int64, _i32p, _i32p]
        lib.correction_accumulate.restype = None
        lib.cyclecheck_batch.argtypes = [_u8p, _i64p, _i64p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int64,
                                         _i32p]
        lib.cyclecheck_batch.restype = None
        _u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.build_pref_scan.argtypes = [_i64p, _u8p, _i64p, _i32p,
                                        ctypes.c_int64, _u32p,
                                        _u32p, _u32p, _i32p, _i32p,
                                        _i64p, _i64p, _i64p]
        lib.build_pref_scan.restype = ctypes.c_int64
        _LIB = lib
        return _LIB


def select_kmers_batch(masked_kmers: np.ndarray, hashes: np.ndarray,
                       seq_offsets: np.ndarray,
                       kmer_considered: np.ndarray) -> np.ndarray | None:
    """Batched selection walk; returns bool mask or None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    selected = np.zeros(len(masked_kmers), dtype=np.uint8)
    lib.select_kmers_batch(
        _as(masked_kmers, np.uint64, _u64p), _as(hashes, np.uint16, _u16p),
        _as(seq_offsets, np.int64, _i64p),
        _as(kmer_considered, np.int64, _i64p),
        len(kmer_considered), selected.ctypes.data_as(_u8p))
    return selected.astype(bool)


def score_pairs(data, offsets, lengths, qid, tid, diag,
                is_rev) -> dict | None:
    """End-to-end ungapped scoring of all pairs; returns raw arrays dict
    (same schema as stages.rescorediagonal._score_pairs_numpy) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(qid)
    out = {k: np.zeros(n, dtype=np.int32)
           for k in ("score", "qstart", "qend", "tstart", "tend",
                     "aln_len", "id_cnt")}
    lib.score_pairs(
        _as(data, np.uint8, _u8p), _as(offsets, np.int64, _i64p),
        _as(lengths, np.int64, _i64p), _as(qid, np.int32, _i32p),
        _as(tid, np.int32, _i32p), _as(diag, np.int32, _i32p),
        _as(is_rev, np.uint8, _u8p), n,
        *(out[k].ctypes.data_as(_i32p)
          for k in ("score", "qstart", "qend", "tstart", "tend",
                    "aln_len", "id_cnt")))
    return out


def build_pref_scan(c, f, m, d, keys) -> tuple | None:
    """writeKmerMatcherResult scan; returns (qkey, tkey, score, diag,
    group_row_start, group_centre) arrays or None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    _u32p = ctypes.POINTER(ctypes.c_uint32)
    n = len(c)
    cap = 2 * n + 2
    qkey = np.zeros(cap, dtype=np.uint32)
    tkey = np.zeros(cap, dtype=np.uint32)
    score = np.zeros(cap, dtype=np.int32)
    diag = np.zeros(cap, dtype=np.int32)
    grs = np.zeros(n + 1, dtype=np.int64)
    gc = np.zeros(n + 1, dtype=np.int64)
    ng = np.zeros(1, dtype=np.int64)
    n_rows = lib.build_pref_scan(
        _as(c, np.int64, _i64p), _as(f, np.uint8, _u8p),
        _as(m, np.int64, _i64p), _as(d, np.int32, _i32p), n,
        _as(keys, np.uint32, _u32p),
        qkey.ctypes.data_as(_u32p), tkey.ctypes.data_as(_u32p),
        score.ctypes.data_as(_i32p), diag.ctypes.data_as(_i32p),
        grs.ctypes.data_as(_i64p), gc.ctypes.data_as(_i64p),
        ng.ctypes.data_as(_i64p))
    g = int(ng[0])
    return (qkey[:n_rows], tkey[:n_rows], score[:n_rows], diag[:n_rows],
            grs[:g], gc[:g])


def cyclecheck_batch(data, offsets, lengths, k: int,
                     max_seq_len: int) -> np.ndarray | None:
    """Per-sequence circular-contig split diagonal (0 = not circular), or
    None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(lengths)
    split = np.zeros(n, dtype=np.int32)
    lib.cyclecheck_batch(
        _as(data, np.uint8, _u8p), _as(offsets, np.int64, _i64p),
        _as(lengths, np.int64, _i64p), n, k, max_seq_len,
        split.ctypes.data_as(_i32p))
    return split


def correction_accumulate(data, offsets, lengths, rec_q, rec_t, rec_is_rev,
                          rec_qstart, rec_tstart, rec_alen, rec_keep_pre,
                          rec_ry_smin, total_len) -> tuple | None:
    """RY-filter + coverage scatter; returns (counts, rev_counts) as
    (total_len, 4, 11) int32 arrays, or None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    counts = np.zeros(total_len * 44, dtype=np.int32)
    rev_counts = np.zeros(total_len * 44, dtype=np.int32)
    lib.correction_accumulate(
        _as(data, np.uint8, _u8p), _as(offsets, np.int64, _i64p),
        _as(lengths, np.int64, _i64p), _as(rec_q, np.int32, _i32p),
        _as(rec_t, np.int32, _i32p), _as(rec_is_rev, np.uint8, _u8p),
        _as(rec_qstart, np.int32, _i32p), _as(rec_tstart, np.int32, _i32p),
        _as(rec_alen, np.int32, _i32p), _as(rec_keep_pre, np.uint8, _u8p),
        _as(rec_ry_smin, np.int32, _i32p), len(rec_q),
        counts.ctypes.data_as(_i32p), rev_counts.ctypes.data_as(_i32p))
    return (counts.reshape(total_len, 4, 11),
            rev_counts.reshape(total_len, 4, 11))
