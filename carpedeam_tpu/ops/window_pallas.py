"""Pallas TPU kernel: per-record alignment-window identity counts.

Computes, for each alignment record (query row, canonical target row,
qstart, tstart, window length), the number of matching characters and
the number of matching RY (purine/pyrimidine) classes over the aligned
window — the "pass B" of the greedy extension stages
(src/assembler/ancientContigsResults.cpp:282-292 in the reference).

Same window-alignment trick as the fused correction kernel: the target
row is rotated into the query-local frame with one barrel shift, so the
compare is a masked elementwise equality plus a lane reduction.

The stacked (2N, L) symbol planes encode non-ACGT characters as 'X' on
the reverse-complement rows while the host oracle keeps them as-is, and
the planes are case-folded while the raw data is not — so callers must
recompute records touching sequences with non-uppercase-ACGT characters
on the host (see `has_non_acgt_flags`); the kernel is exact for pure
ACGT data, which is the overwhelmingly common case.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_rows(max_len: int) -> int:
    """Record rows per grid step, bounded by VMEM (int32 intermediates)."""
    if max_len <= 1536:
        return 256
    if max_len <= 3072:
        return 128
    if max_len <= 6144:
        return 64
    return 32


MAX_LEN_WINDOW_PALLAS = 16384


def _ident_kernel(q_sym_ref, t_sym_ref, scal_ref, out_ref):
    B, L = q_sym_ref.shape
    q = q_sym_ref[:].astype(jnp.int32)
    t = t_sym_ref[:].astype(jnp.int32)
    # widen immediately: the scalar plane ships int16 (tunnel bytes) but
    # the VPU has no 16-bit vector compare
    qstart = scal_ref[:, 0:1].astype(jnp.int32)
    tstart = scal_ref[:, 1:2].astype(jnp.int32)
    win = scal_ref[:, 2:3].astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    shift = tstart - qstart
    shift = jnp.where(shift < 0, shift + L, shift)
    n_bits = max(1, (L - 1).bit_length())
    for k in range(n_bits):
        step = 1 << k
        if step >= L:
            break
        take = (shift & step) != 0
        rolled = jnp.concatenate([t[:, step:], t[:, :step]], axis=1)
        t = jnp.where(take, rolled, t)

    in_w = (pos >= qstart) & (pos < qstart + win)
    idc = jnp.sum(((q == t) & in_w).astype(jnp.int32), axis=1, keepdims=True)
    ry_q = (q == ord("C")) | (q == ord("T"))
    ry_t = (t == ord("C")) | (t == ord("T"))
    ryc = jnp.sum(((ry_q == ry_t) & in_w).astype(jnp.int32), axis=1,
                  keepdims=True)
    out_ref[:, 0:1] = idc
    out_ref[:, 1:2] = ryc


@partial(jax.jit, static_argnames=("max_len", "interpret"))
def _window_identity_device(sym2, qrow, trow, scal, max_len: int,
                            interpret: bool):
    q_sym = sym2[qrow].astype(jnp.int8)
    t_sym = sym2[trow].astype(jnp.int8)
    B = _block_rows(max_len)
    n = qrow.shape[0]
    return pl.pallas_call(
        _ident_kernel,
        grid=(n // B,),
        in_specs=[pl.BlockSpec((B, max_len), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, max_len), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2), jnp.int32),
        interpret=interpret,
    )(q_sym, t_sym, scal)


def window_identity_pallas(planes, n_seqs: int, qid, tid, is_rev,
                           qstart, tstart, win, interpret=None):
    """(idc, ryc) int64 arrays for all records; pads the record axis to a
    block multiple internally."""
    out, n = window_identity_dispatch(planes, n_seqs, qid, tid, is_rev,
                                      qstart, tstart, win,
                                      interpret=interpret)
    return window_identity_collect(out, n)


def window_identity_dispatch(planes, n_seqs: int, qid, tid, is_rev,
                             qstart, tstart, win, interpret=None):
    """Dispatch half of window_identity_pallas: returns the (device
    handle, n) pair with the device->host copy already streaming, so the
    caller can overlap other work before `window_identity_collect`."""
    max_len = int(planes["sym"].shape[1])
    B = _block_rows(max_len)
    n = len(qid)
    pad = max(B, ((n + B - 1) // B) * B)
    qrow = np.zeros(pad, np.int32)
    trow = np.zeros(pad, np.int32)
    # coordinate scalars are bounded by the plane width (<= 16384): int16
    # halves the tunnel bytes vs int32
    scal = np.zeros((pad, 4), np.int16)
    qrow[:n] = qid
    trow[:n] = tid + np.where(is_rev, n_seqs, 0)
    scal[:n, 0] = qstart
    scal[:n, 1] = tstart
    scal[:n, 2] = win
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = _window_identity_device(planes["sym"], qrow, trow, scal,
                                  max_len=max_len, interpret=interpret)
    try:
        out.copy_to_host_async()
    except AttributeError:
        pass
    return out, n


def window_identity_collect(out, n):
    out = np.asarray(out)
    return out[:n, 0].astype(np.int64), out[:n, 1].astype(np.int64)


_PURE = np.ones(256, dtype=bool)
_PURE[np.frombuffer(b"ACGT", dtype=np.uint8)] = False


def has_non_acgt_flags(seqdb) -> np.ndarray:
    """Per-sequence flag: contains any character outside uppercase ACGT
    (those records must take the host path for exact char semantics).
    Memoised on the SeqDB instance — stages treat SeqDB as immutable and
    several call this per iteration on the same DB."""
    cached = getattr(seqdb, "_non_acgt_flags", None)
    if cached is not None:
        return cached
    from .. import native
    flags = native.seq_non_acgt_flags(seqdb)
    if flags is None:
        data = seqdb.data
        bad = _PURE[data]
        cum = np.concatenate([[0], np.cumsum(bad, dtype=np.int64)])
        off = seqdb.offsets.astype(np.int64)
        ln = seqdb.lengths.astype(np.int64)
        flags = (cum[off + ln] - cum[off]) > 0
    try:
        seqdb._non_acgt_flags = flags
    except AttributeError:
        pass
    return flags
