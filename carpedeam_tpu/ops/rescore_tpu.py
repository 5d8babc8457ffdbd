"""TPU rescoring kernel: batched ungapped end-to-end overlap scoring.

The device-side formulation of stages/rescorediagonal.py.  Sequences are
pre-encoded on the host into four dense (N, Lmax) planes:

  code      5-letter scoring codes (A0 C1 T2 G3 X4)
  sym       case-folded symbol bytes (for char-equality seqId)
  code_rc   reverse-complement codes, row-reversed so the strand-corrected
            position x reads directly at [i, x]
  sym_rc    reverse-complement symbols ('X' for non-ACGT, matching the
            reference's num2aa reversal)

and stacked [fwd; rc] so strand selection is pure row arithmetic
(row = idx + N * is_rev) — no per-element LUT gathers on device (those
lower to scalar loops on TPU and were 250x slower).  Each (query, target,
diagonal) candidate is then a (P, Lmax) window comparison: two ushort
diagonal candidates scored in one fused pass of elementwise VPU ops +
row reductions.  Semantics identical to the NumPy oracle (which is
bit-exact vs the reference binary).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import evalue as _ev
from ..constants import CHAR_TO_CODE, COMPLEMENT_CODE

_DECODE_X = np.frombuffer(b"ACTGX", dtype=np.uint8)
_CHAR_REVCOMP_X = _DECODE_X[COMPLEMENT_CODE[CHAR_TO_CODE]]
_UPPER = (np.arange(256) & ~0x20).astype(np.uint8)


def pack_sequences(seqdb, max_len=None, ids=None, fwd_only=False):
    """Host-side: SeqDB -> dict of stacked device planes + lengths.

    Returns (planes, lengths) where planes = {"code": (2N, L) uint8,
    "sym": (2N, L) uint8}; rows [0, N) are forward, rows [N, 2N) are the
    row-reversed reverse complements.  `ids` restricts packing to a row
    subset (for per-length-bucket planes); rows longer than max_len are
    truncated (callers must route such rows to a wider bucket).

    `fwd_only=True` returns just {"sym": (N, L)} — the forward symbol
    plane — for callers that derive the RC rows and code planes on
    device (device_planes)."""
    if ids is None:
        n = len(seqdb)
        lengths = seqdb.lengths.astype(np.int64)
        offsets = seqdb.offsets.astype(np.int64)
    else:
        n = len(ids)
        lengths = seqdb.lengths[ids].astype(np.int64)
        offsets = seqdb.offsets[ids].astype(np.int64)
    if max_len is None:
        max_len = int(lengths.max()) if n else 1
    native_planes = None
    if n:
        from .. import native
        native_planes = native.pack_planes(
            seqdb.data, seqdb.offsets.astype(np.int64),
            seqdb.lengths.astype(np.int64),
            np.asarray(ids, dtype=np.int64) if ids is not None else None,
            max_len)
    if native_planes is not None:
        # one-pass C++ pack (native/linclust_kernels.cpp::pack_planes);
        # the NumPy path below is the oracle (tests pin equality)
        sym, sym_rc, code, code_rc = native_planes
        if fwd_only:
            return {"sym": sym}, lengths.astype(np.int32)
    elif n:
        # vectorised CSR -> padded: one clipped gather + masked select per
        # plane (an np.nonzero + scatter formulation costs ~4x more — the
        # pack is on the per-iteration hot path, see bench.py)
        pos = np.arange(max_len, dtype=np.int64)
        mask = pos[None, :] < lengths[:, None]
        last = max(len(seqdb.data) - 1, 0)
        flat = np.minimum(offsets[:, None] + pos[None, :], last)
        sym = np.where(mask, _UPPER[seqdb.data[flat]], np.uint8(0))
        if fwd_only:
            return {"sym": sym}, lengths.astype(np.int32)
        # reverse complement, row-reversed: position x reads base L-1-x
        flat_rc = np.clip(offsets[:, None] + (lengths[:, None] - 1
                                              - pos[None, :]), 0, last)
        sym_rc = np.where(mask,
                          _UPPER[_CHAR_REVCOMP_X[seqdb.data[flat_rc]]],
                          np.uint8(0))
        code = CHAR_TO_CODE[sym]
        code_rc = CHAR_TO_CODE[sym_rc]
    else:
        sym = np.zeros((n, max_len), dtype=np.uint8)
        if fwd_only:
            return {"sym": sym}, lengths.astype(np.int32)
        sym_rc = np.zeros((n, max_len), dtype=np.uint8)
        code = CHAR_TO_CODE[sym]
        code_rc = CHAR_TO_CODE[sym_rc]
    planes = {"code": np.concatenate([code, code_rc]),
              "sym": np.concatenate([sym, sym_rc])}
    return planes, lengths.astype(np.int32)


@jax.jit
def _derive_code(sym2):
    """CHAR_TO_CODE as an elementwise where-chain (uppercased symbols ->
    5-letter codes), so only the symbol planes cross the host->device
    link; everything else (including the X=4 padding) derives on device.
    Bit-identical to CHAR_TO_CODE[sym] for uppercased input."""
    code = jnp.full(sym2.shape, 4, dtype=jnp.uint8)
    for chars, val in (("A", 0), ("CMYH", 1), ("TUW", 2), ("GKBDVRS", 3)):
        for ch in chars:
            code = jnp.where(sym2 == ord(ch), jnp.uint8(val), code)
    return code


def _roll_rows_left(x, shift, width: int):
    """Barrel shifter: rotate row i of x left by shift[i] (log2(width)
    static rotations gated per-row by the shift's bits)."""
    n_bits = max(1, (width - 1).bit_length())
    for b in range(n_bits):
        step = 1 << b
        take = ((shift >> b) & 1).astype(bool)[:, None]
        rolled = jnp.concatenate([x[:, step:], x[:, :step]], axis=1)
        x = jnp.where(take, rolled, x)
    return x


@jax.jit
def _derive_rc_plane(sym, lengths):
    """Reverse-complement symbol plane from the forward plane, on device:
    complement each (uppercased, 5-letter-folded to "ACTGX") symbol, flip
    the row, then rotate the tail padding out (left-roll by max_len - L).
    Bit-identical to the host pack's _UPPER[_CHAR_REVCOMP_X[...]] rows —
    only the (N, L) forward plane ever crosses the host->device tunnel;
    the RC half of the (2N, L) plane is ~free HBM work."""
    comp = jnp.full(sym.shape, ord("X"), dtype=jnp.uint8)
    for chars, out in (("A", "T"), ("CMYH", "G"), ("TUW", "A"),
                       ("GKBDVRS", "C")):
        for ch in chars:
            comp = jnp.where(sym == ord(ch), jnp.uint8(ord(out)), comp)
    max_len = sym.shape[1]
    flipped = comp[:, ::-1]
    shift = (jnp.int32(max_len) - lengths.astype(jnp.int32))
    rolled = _roll_rows_left(flipped, shift, max_len)
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return jnp.where(pos < lengths.astype(jnp.int32)[:, None], rolled,
                     jnp.uint8(0))


@jax.jit
def _assemble_planes(sym_fwd, lengths):
    sym2 = jnp.concatenate([sym_fwd, _derive_rc_plane(sym_fwd, lengths)])
    return {"code": _derive_code(sym2), "sym": sym2,
            "len": lengths.astype(jnp.int32)}


class PlanesPrefetch:
    """Asynchronous device_planes: the host pack + H2D dispatch happen at
    construction; the transfer proceeds in the background while the
    caller does host work (e.g. the kmermatcher), and `get()` finishes
    the (cheap, on-device) plane derivation.  Through the tunnel this
    hides the whole upload behind any >=0.2 s host stage."""

    def __init__(self, seqdb, max_len=None, ids=None):
        from ..utils import subtimer
        with subtimer("planes.pack_host"):
            planes, self.lengths = pack_sequences(
                seqdb, max_len=max_len, ids=ids, fwd_only=True)
        with subtimer("planes.h2d_dispatch"):
            self._sym_fwd = jax.device_put(planes["sym"])
        self._out = None

    def get(self):
        from ..utils import subtimer
        if self._out is None:
            with subtimer("planes.h2d_wait"):
                self._sym_fwd.block_until_ready()
            with subtimer("planes.derive_dev"):
                self._out = _assemble_planes(self._sym_fwd,
                                             jnp.asarray(self.lengths))
        return self._out, self.lengths


def device_planes(seqdb, max_len=None, ids=None):
    """pack_sequences + upload, transfer-minimised: only the (N, L)
    FORWARD symbol plane is uploaded; the reverse-complement rows, the
    code planes and the device lengths derive on device (the tunnel H2D
    link is the cost here, not HBM bandwidth).  Returns
    ({"code", "sym", "len"} device arrays, lengths) like callers expect."""
    return PlanesPrefetch(seqdb, max_len=max_len, ids=ids).get()


@partial(jax.jit, static_argnames=("max_len",))
def rescore_pairs_device(code2, sym2, lengths, qidx, tidx, diag16, is_rev,
                         max_len: int):
    """Scores all pairs; see module docstring for the input planes.

    Returns per-pair arrays: score, qstart, qend, tstart, tend, aln_len,
    id_cnt, qlen, tlen.
    """
    n_seqs = lengths.shape[0]
    qlen = lengths[qidx].astype(jnp.int32)
    tlen = lengths[tidx].astype(jnp.int32)
    qrow = qidx + jnp.where(is_rev, n_seqs, 0).astype(qidx.dtype)
    diag_u = diag16.astype(jnp.int32) & 0xFFFF
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]          # (1, L)

    q_code_rows = code2[qrow]                                    # (P, L)
    t_code_rows = code2[tidx]
    q_sym_rows = sym2[qrow]
    t_sym_rows = sym2[tidx]

    def windows(rows, offsets):
        idx = jnp.clip(offsets, 0, max_len - 1)
        return jnp.take_along_axis(rows, idx, axis=1)

    def score_candidate(cand):
        neg = cand < 0
        dist = jnp.abs(cand)
        valid = jnp.where(neg, dist < tlen, dist < qlen)
        min_len = jnp.where(neg, jnp.minimum(tlen - dist, qlen),
                            jnp.minimum(tlen, qlen - dist))
        min_len = jnp.where(valid, min_len, 0)
        qoff = jnp.where(neg, 0, dist)[:, None] + pos
        toff = jnp.where(neg, dist, 0)[:, None] + pos
        in_win = pos < min_len[:, None]
        qc = windows(q_code_rows, qoff)
        tc = windows(t_code_rows, toff)
        match = (qc == tc) & (qc < 4) & in_win
        m = match.sum(axis=1)
        score = jnp.maximum(2 * m - 3 * (min_len - m), 0)
        return jnp.where(valid, score, 0), min_len

    cand_neg = diag_u - 65536
    cand_pos = diag_u
    s_neg, len_neg = score_candidate(cand_neg)
    s_pos, len_pos = score_candidate(cand_pos)

    use_pos = s_pos > s_neg
    best_score = jnp.where(use_pos, s_pos, s_neg)
    best_cand = jnp.where(use_pos, cand_pos, cand_neg)
    best_len = jnp.where(use_pos, len_pos, len_neg)
    got = best_score > 0
    best_dist = jnp.abs(best_cand)
    start = jnp.where(got, 0, -1)
    end = jnp.where(got, best_len - 1, -1)
    dist = jnp.where(got, best_dist, 0)
    dneg = got & (best_cand < 0)

    qstart = jnp.where(dneg, start, start + dist)
    qend = jnp.where(dneg, end, end + dist)
    tstart = jnp.where(dneg, start + dist, start)
    tend = jnp.where(dneg, end + dist, end)
    aln_len = end - start + 1

    in_win = pos < aln_len[:, None]
    qs = windows(q_sym_rows, qstart[:, None] + pos)
    ts = windows(t_sym_rows, tstart[:, None] + pos)
    id_cnt = ((qs == ts) & in_win).sum(axis=1)

    return {"score": best_score, "qstart": qstart, "qend": qend,
            "tstart": tstart, "tend": tend, "aln_len": aln_len,
            "id_cnt": id_cnt, "qlen": qlen, "tlen": tlen}


def rescorediagonal_tpu(seqdb, pref, seq_id_thr, eval_thr=0.001,
                        aln_len_thr=0, planes=None, lengths=None):
    """Device drop-in for stages.rescorediagonal.rescorediagonal: the
    (pairs, Lmax) window scans run on device; statistics, filters and
    record assembly share the host code (integer id_cnt crosses the
    boundary, so float semantics stay IEEE-exact).  The pair axis is
    padded to a bucket boundary so the executable is reused across
    assembly iterations; padded rows are sliced off before assembly."""
    from ..stages.rescorediagonal import assemble_alndb
    from ..utils import bucket_len, bucket_pairs

    if planes is None:
        planes, lengths = pack_sequences(seqdb, max_len=bucket_len(
            int(seqdb.lengths.max()) if len(seqdb) else 1))
    n = len(pref.qkey)
    np_pad = bucket_pairs(n)
    qidx = np.zeros(np_pad, dtype=np.int32)
    tidx = np.zeros(np_pad, dtype=np.int32)
    diag = np.zeros(np_pad, dtype=np.int32)
    is_rev = np.zeros(np_pad, dtype=bool)
    qidx[:n] = seqdb.lookup_keys(pref.qkey)
    tidx[:n] = seqdb.lookup_keys(pref.tkey)
    diag[:n] = pref.diag
    is_rev[:n] = pref.score < 0
    out = rescore_pairs_device(planes["code"], planes["sym"],
                               lengths.astype(np.int32), qidx, tidx,
                               diag, is_rev,
                               max_len=planes["code"].shape[1])
    raw = {k: np.asarray(v)[:n] for k, v in out.items()}
    return assemble_alndb(seqdb, pref, raw, seq_id_thr, eval_thr,
                          aln_len_thr)


# --- device e-value (mirrors evalue.py with jnp) ---------------------------
_LAMBDA = _ev.LAMBDA
_K = _ev.K
_A = _ev.A_FSC
_ALPHA = _ev.ALPHA_FSC
_Y_THR = 2.0 * _ALPHA / _LAMBDA
_INV_SQRT_2PI = 1.0 / np.sqrt(2.0 * np.pi)


def evalue_device(score, seq_len, db_res_count):
    y = score.astype(jnp.float32)
    m = seq_len.astype(y.dtype)
    n = jnp.asarray(db_res_count, dtype=y.dtype)

    def _phi(x):
        return 0.5 * jax.scipy.special.erfc(
            -jnp.asarray(np.sqrt(0.5), y.dtype) * x)

    m_li = m - _A * y
    vi = jnp.maximum(_Y_THR, _ALPHA * y)
    sq = jnp.sqrt(vi)
    m_f = m_li / sq
    p_m = _phi(m_f)
    e_m = -_INV_SQRT_2PI * jnp.exp(-0.5 * m_f * m_f)
    p1 = m_li * p_m - sq * e_m
    n_lj = n - _A * y
    n_f = n_lj / sq
    p_n = _phi(n_f)
    e_n = -_INV_SQRT_2PI * jnp.exp(-0.5 * n_f * n_f)
    p2 = n_lj * p_n - sq * e_n
    area = p1 * p2 + vi * p_m * p_n  # c_y == vi for the gapless parameters
    return _K * jnp.exp(-_LAMBDA * y) * area
