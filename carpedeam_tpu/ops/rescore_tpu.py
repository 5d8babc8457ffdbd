"""TPU rescoring kernel: batched ungapped end-to-end overlap scoring.

The device-side formulation of stages/rescorediagonal.py: sequences live as
a dense (N, Lmax) uint8 symbol matrix on device; every (query, target,
diagonal) candidate is scored as one row of a (P, Lmax) window comparison:

    gather query/target windows (strand-corrected via index arithmetic,
    no materialised reverse complements) -> code equality (+2/-3 sums) and
    symbol equality (seqId counts) -> masked reductions.

Everything is elementwise + row reductions, i.e. pure VPU work that XLA
fuses into a single pass over the (P, Lmax) grid; both ushort diagonal
candidates are evaluated in one kernel.  The e-value needs erfc, also on
device.  Semantics are identical to the NumPy oracle (golden-tested
against it; the oracle itself is bit-exact vs the reference binary).
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

# device LUTs
_LUT_CODE = jnp.asarray(CHAR_TO_CODE)
_LUT_REVCOMP = jnp.asarray(_CHAR_REVCOMP_X)
_LUT_UPPER = jnp.asarray(_UPPER)


def pack_sequences(seqdb, max_len=None):
    """Host-side: SeqDB -> dense (N, Lmax) uint8 byte matrix + lengths."""
    n = len(seqdb)
    if max_len is None:
        max_len = int(seqdb.lengths.max()) if n else 1
    mat = np.zeros((n, max_len), dtype=np.uint8)
    for i in range(n):
        L = int(seqdb.lengths[i])
        mat[i, :L] = seqdb.seq_bytes(i)
    return mat, seqdb.lengths.astype(np.int32)


@partial(jax.jit, static_argnames=("max_len",))
def rescore_pairs_device(seq_bytes, lengths, qidx, tidx, diag16, is_rev,
                         max_len: int):
    """Scores all pairs.  Returns dict of per-pair arrays:
    score, qstart, qend, tstart, tend, aln_len, id_cnt (for seqId).

    seq_bytes: (N, Lmax) uint8; lengths: (N,) int32
    qidx/tidx: (P,) int32; diag16: (P,) int32 (int16 value); is_rev: (P,) bool
    """
    qlen = lengths[qidx].astype(jnp.int32)
    tlen = lengths[tidx].astype(jnp.int32)
    diag_u = diag16.astype(jnp.int32) & 0xFFFF
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]          # (1, L)

    def q_gather(offsets):
        """Query window bytes at positions offsets (P, L), strand-corrected."""
        p = offsets
        idx = jnp.where(is_rev[:, None], qlen[:, None] - 1 - p, p)
        idx = jnp.clip(idx, 0, max_len - 1)
        raw = jnp.take_along_axis(seq_bytes[qidx], idx, axis=1)
        rc = _LUT_REVCOMP[raw]
        return jnp.where(is_rev[:, None], rc, raw)

    def t_gather(offsets):
        idx = jnp.clip(offsets, 0, max_len - 1)
        return jnp.take_along_axis(seq_bytes[tidx], idx, axis=1)

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
        qb = q_gather(qoff)
        tb = t_gather(toff)
        qc = _LUT_CODE[qb]
        tc = _LUT_CODE[tb]
        match = (qc == tc) & (qc < 4) & in_win
        m = match.sum(axis=1)
        score = jnp.maximum(2 * m - 3 * (min_len - m), 0)
        score = jnp.where(valid, score, 0)
        return score, min_len

    cand_neg = diag_u - 65536
    cand_pos = diag_u
    s_neg, len_neg = score_candidate(cand_neg)
    s_pos, len_pos = score_candidate(cand_pos)

    # negative candidate first; strictly-greater replaces (ties keep neg)
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

    # seqId: symbol equality over the aligned window
    in_win = pos < aln_len[:, None]
    qb = q_gather(qstart[:, None] + pos)
    tb = t_gather(tstart[:, None] + pos)
    id_cnt = ((_LUT_UPPER[qb] == _LUT_UPPER[tb]) & in_win).sum(axis=1)

    return {"score": best_score, "qstart": qstart, "qend": qend,
            "tstart": tstart, "tend": tend, "aln_len": aln_len,
            "id_cnt": id_cnt, "qlen": qlen, "tlen": tlen}


# --- device e-value (mirrors evalue.py with jnp) ---------------------------
_LAMBDA = _ev.LAMBDA
_K = _ev.K
_A = _ev.A_FSC
_ALPHA = _ev.ALPHA_FSC
_Y_THR = 2.0 * _ALPHA / _LAMBDA
_INV_SQRT_2PI = 1.0 / np.sqrt(2.0 * np.pi)


def evalue_device(score, seq_len, db_res_count):
    y = score.astype(jnp.float64) if jax.config.jax_enable_x64 \
        else score.astype(jnp.float32)
    m = seq_len.astype(y.dtype)
    n = jnp.asarray(db_res_count, dtype=y.dtype)

    def _phi(x):
        return 0.5 * jax.scipy.special.erfc(-jnp.sqrt(0.5).astype(y.dtype) * x)

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
