"""rescorediagonal: ungapped end-to-end rescoring of candidate overlaps.

TPU-native re-design of lib/mmseqs/src/alignment/rescorediagonal.cpp for
RESCORE_MODE_END_TO_END_ALIGNMENT (mode 4, the mode every assembly step
uses).  Instead of a per-hit scalar scan, all (query, target, diagonal)
candidates are scored as one dense batch: window gather -> +2/-3 sums and
equality counts over a (pairs, max_len) grid — exactly the shape the
Pallas kernel consumes on TPU (ops/rescore_tpu.py); this module is the
NumPy host path and the semantic oracle.

Reference semantics replicated:
* prefilter diagonals travel as unsigned short; scoring tries the two
  candidate real diagonals d-65536 and d (DistanceCalculator::
  computeUngappedAlignment, DistanceCalculator.h:93-113), keeping the
  strictly-better one (ties favour the negative candidate).
* end-to-end score = sum of +2 match / -3 mismatch over the full overlap,
  clamped at 0 (computeGlobalSubstitutionStartEndDistance, :204-220).
* if no candidate scores > 0 the default LocalAlignment survives:
  startPos = endPos = -1, diagonal = 0 (rescorediagonal.cpp:214-234) —
  coords become (-1,-1) and alnLen 1.
* e-value & bit score via the ALP Gumbel stats; seqId is computed only
  when evalue <= threshold or the hit is the identity (:276-284), as
  case-folded char equality over the query window / alnLen.
* reverse-strand hits score against the reversed query (built with
  num2aa, so non-ACGT chars become 'X', :173-179) and have their query
  coords flipped after coverage computation (:294-297).
"""
from __future__ import annotations

import numpy as np

from .. import evalue as ev
from ..aligndb import AlnDB, PrefDB, cpp_eval_roundtrip, cpp_truncate_seqid
from ..constants import CHAR_TO_CODE, COMPLEMENT_CODE
from ..io.seqdb import SeqDB

_EPS = np.float32(np.finfo(np.float32).eps)

# reversal alphabet used by the rescorer: code -> "ACTGX" (num2aa; X stays X)
_DECODE_X = np.frombuffer(b"ACTGX", dtype=np.uint8)
_CHAR_REVCOMP_X = _DECODE_X[COMPLEMENT_CODE[CHAR_TO_CODE]]
_UPPER = np.arange(256, dtype=np.uint8) & np.uint8(~0x20 & 0xFF)


def rescorediagonal(seqdb: SeqDB, pref: PrefDB, seq_id_thr: float,
                    eval_thr: float = 0.001, aln_len_thr: int = 0) -> AlnDB:
    """Score every prefilter hit and emit filtered alignment records.

    Host path: native C++ per-pair scan when the toolchain is available
    (carpedeam_tpu/native), NumPy dense-window oracle otherwise — both
    bit-identical.  ops.rescore_tpu.rescorediagonal_tpu is the device
    drop-in sharing assemble_alndb below."""
    raw = _score_pairs_native(seqdb, pref)
    if raw is None:
        raw = _score_pairs_numpy(seqdb, pref)
    return assemble_alndb(seqdb, pref, raw, seq_id_thr, eval_thr,
                          aln_len_thr)


def _score_pairs_native(seqdb: SeqDB, pref: PrefDB) -> dict | None:
    from .. import native

    qid = seqdb.lookup_keys(pref.qkey).astype(np.int32)
    tid = seqdb.lookup_keys(pref.tkey).astype(np.int32)
    out = native.score_pairs(seqdb.data, seqdb.offsets, seqdb.lengths,
                             qid, tid, pref.diag.astype(np.int32),
                             (pref.score < 0).astype(np.uint8))
    if out is None:
        return None
    out["qlen"] = seqdb.lengths[qid].astype(np.int64)
    out["tlen"] = seqdb.lengths[tid].astype(np.int64)
    return out


def _score_pairs_numpy(seqdb: SeqDB, pref: PrefDB) -> dict:
    n = len(pref.qkey)
    qid = seqdb.lookup_keys(pref.qkey).astype(np.int64)
    tid = seqdb.lookup_keys(pref.tkey).astype(np.int64)
    is_rev = pref.score < 0
    qlen = seqdb.lengths[qid].astype(np.int64)
    tlen = seqdb.lengths[tid].astype(np.int64)

    diag_u = (pref.diag.astype(np.int64)) & 0xFFFF  # unsigned short view

    # ---- choose the real diagonal: candidates d-65536 (first) and d ------
    best_score = np.zeros(n, dtype=np.int64)
    best_diag = np.zeros(n, dtype=np.int64)
    best_valid = np.zeros(n, dtype=bool)
    best_start = np.full(n, -1, dtype=np.int64)
    best_end = np.full(n, -1, dtype=np.int64)
    best_dist = np.zeros(n, dtype=np.int64)

    max_len = int(seqdb.lengths.max()) if len(seqdb) else 0
    pos_grid = np.arange(max_len, dtype=np.int64)

    # gather padded query (strand-corrected) and target char arrays once
    q_chars = np.zeros((n, max_len), dtype=np.uint8)
    t_chars = np.zeros((n, max_len), dtype=np.uint8)
    for i in range(n):
        qo, ql = seqdb.offsets[qid[i]], int(qlen[i])
        s = seqdb.data[qo:qo + ql]
        if is_rev[i]:
            s = _CHAR_REVCOMP_X[s][::-1]
        q_chars[i, :ql] = s
        to, tl = seqdb.offsets[tid[i]], int(tlen[i])
        t_chars[i, :tl] = seqdb.data[to:to + tl]

    q_codes = CHAR_TO_CODE[q_chars]
    t_codes = CHAR_TO_CODE[t_chars]

    for cand in (diag_u - 65536, diag_u):
        neg = cand < 0
        dist = np.abs(cand)
        valid = np.where(neg, dist < tlen, dist < qlen)
        min_len = np.where(neg,
                           np.minimum(tlen - dist, qlen),
                           np.minimum(tlen, qlen - dist)).astype(np.int64)
        min_len = np.where(valid, min_len, 0)
        # windows: q[qoff + p], t[toff + p] for p in [0, min_len)
        qoff = np.where(neg, 0, dist)
        toff = np.where(neg, dist, 0)
        p_mask = pos_grid[None, :] < min_len[:, None]
        qi = np.clip(qoff[:, None] + pos_grid[None, :], 0, max_len - 1)
        ti = np.clip(toff[:, None] + pos_grid[None, :], 0, max_len - 1)
        qc = np.take_along_axis(q_codes, qi, axis=1)
        tc = np.take_along_axis(t_codes, ti, axis=1)
        match = (qc == tc) & (qc < 4) & p_mask
        m = match.sum(axis=1)
        score = np.maximum(2 * m - 3 * (min_len - m), 0)
        score = np.where(valid, score, 0)
        better = score > best_score
        best_diag = np.where(better, cand, best_diag)
        best_dist = np.where(better, dist, best_dist)
        best_start = np.where(better, 0, best_start)
        best_end = np.where(better, min_len - 1, best_end)
        best_score = np.where(better, score, best_score)
        best_valid |= better

    # ---- coordinates (rescorediagonal.cpp:258-270) -----------------------
    dneg = best_diag < 0
    qstart = np.where(dneg, best_start, best_start + best_dist)
    qend = np.where(dneg, best_end, best_end + best_dist)
    tstart = np.where(dneg, best_start + best_dist, best_start)
    tend = np.where(dneg, best_end + best_dist, best_end)
    aln_len = best_end - best_start + 1

    # id_cnt over the aligned window (char equality, case-folded)
    qi = np.clip(qstart[:, None] + pos_grid[None, :], 0, max_len - 1)
    ti = np.clip(tstart[:, None] + pos_grid[None, :], 0, max_len - 1)
    in_win = pos_grid[None, :] < aln_len[:, None]
    qch = _UPPER[np.take_along_axis(q_chars, qi, axis=1)]
    tch = _UPPER[np.take_along_axis(t_chars, ti, axis=1)]
    id_cnt = ((qch == tch) & in_win).sum(axis=1)

    return {"score": best_score, "qstart": qstart, "qend": qend,
            "tstart": tstart, "tend": tend, "aln_len": aln_len,
            "id_cnt": id_cnt, "qlen": qlen, "tlen": tlen}


def assemble_alndb(seqdb: SeqDB, pref: PrefDB, raw: dict, seq_id_thr: float,
                   eval_thr: float, aln_len_thr: int) -> AlnDB:
    """Statistics + filters + per-query record assembly over the raw
    per-pair scoring arrays (from the NumPy or device scorer)."""
    db_res = seqdb.total_residues
    qid = seqdb.lookup_keys(pref.qkey)
    tid = seqdb.lookup_keys(pref.tkey)
    is_rev = pref.score < 0
    best_score = raw["score"].astype(np.int64)
    qstart = raw["qstart"].astype(np.int64)
    qend = raw["qend"].astype(np.int64)
    tstart = raw["tstart"].astype(np.int64)
    tend = raw["tend"].astype(np.int64)
    aln_len = raw["aln_len"].astype(np.int64)
    id_cnt = raw["id_cnt"].astype(np.int64)
    qlen = raw["qlen"].astype(np.int64)
    tlen = raw["tlen"].astype(np.int64)

    # ---- statistics ------------------------------------------------------
    evals = ev.evalue_grouped(best_score, qlen, db_res)
    bits = ev.bit_score_int(best_score.astype(np.float64))
    is_identity = qid == tid

    # seqId is computed only when evalue <= threshold or identity (:276-284)
    need_seqid = (evals <= eval_thr) | is_identity
    seq_id = np.where(need_seqid & (aln_len > 0),
                      id_cnt.astype(np.float32) / np.maximum(aln_len, 1)
                      .astype(np.float32),
                      np.float32(0.0)).astype(np.float32)

    # ---- filters (rescorediagonal.cpp:306-314) ---------------------------
    has_seqid = seq_id >= (np.float32(seq_id_thr) - _EPS)
    has_eval = evals <= eval_thr
    has_alnlen = aln_len >= aln_len_thr
    emit = is_identity | (has_alnlen & has_seqid & has_eval)

    # reverse hits: flip query coords (after covs, which we don't store)
    qstart_out = np.where(is_rev, qlen - qstart - 1, qstart)
    qend_out = np.where(is_rev, qlen - qend - 1, qend)

    # ---- assemble output in per-query record order -----------------------
    # records are grouped by query in pref order, so the emitted indices in
    # ascending order ARE the output order; per-query group sizes come from
    # one searchsorted (the reference writes an empty record for hit-less
    # queries, so every query keeps an entry in qkeys/starts)
    order = np.nonzero(emit)[0]
    qi_of = np.searchsorted(pref.starts[1:], order, side="right")
    counts_q = np.bincount(qi_of, minlength=len(pref.qkeys))
    starts_out = np.concatenate([[0], np.cumsum(counts_q)])

    return AlnDB.from_arrays(
        qkey=pref.qkey[order], qkeys=pref.qkeys.astype(np.uint32),
        starts=starts_out.astype(np.int64),
        tkey=pref.tkey[order],
        score=bits[order],
        seq_id=cpp_truncate_seqid(seq_id[order]),
        eval=cpp_eval_roundtrip(evals[order]) if len(order) else np.zeros(0),
        qstart=qstart_out[order], qend=qend_out[order], qlen=qlen[order],
        dbstart=tstart[order], dbend=tend[order], dblen=tlen[order])
