"""linclust-equivalent redundancy reduction.

Re-design of the reference's linclust pipeline as invoked by the guided
workflow (lib/mmseqs/data/workflow/linclust.sh with the CLUSTER_PAR of
src/workflow/GuidedNuclassembler.cpp:33-40,175-180):

  1. kmermatcher          (k=20, cov-mode 1, -c 0.99)
  2. rescorediagonal      (HAMMING + wrapped scoring, seqId 0.97, cov 0.99)
  3. clust                (greedy incremental, length-ranked ids)
  4. createsubdb/filterdb (representatives only)
  5. align                (gapped nucleotide alignment; implemented here as
                           the ungapped end-to-end scorer with exact seqId —
                           candidates at seqId>=0.97 / cov>=0.99 are
                           near-identical overlaps where the banded gapped
                           alignment reduces to the diagonal; the reference
                           uses BandedNucleotideAligner/ksw2)
  6. clust + mergeclusters

Returns {representative_key: [member keys]} (cluster records in the
reference's format: rep first, members ascending).
"""
from __future__ import annotations

import numpy as np

from ..aligndb import PrefDB
from ..constants import CHAR_TO_CODE, COMPLEMENT_CODE
from ..io.seqdb import SeqDB
from ..kmer.matcher import kmermatcher
from .. import evalue as ev

_DECODE_X = np.frombuffer(b"ACTGX", dtype=np.uint8)
_CHAR_REVCOMP_X = _DECODE_X[COMPLEMENT_CODE[CHAR_TO_CODE]]
_EPS = np.float32(np.finfo(np.float32).eps)


def length_rank_ids(seqdb: SeqDB) -> np.ndarray:
    """Internal ids under SORT_BY_LENGTH: stable sort by record byte length
    (seqLen + 2) descending, ties by original index ascending
    (DBReader.cpp:301-318).  Returns rank[orig_index]."""
    order = np.lexsort((np.arange(len(seqdb)),
                        -(seqdb.lengths + 2)))
    rank = np.empty(len(seqdb), dtype=np.int64)
    rank[order] = np.arange(len(seqdb))
    return rank


def hamming_wrapped_rescore(seqdb: SeqDB, pref: PrefDB, seq_id_thr: float,
                            cov_thr: float, cov_mode: int) -> PrefDB:
    """rescorediagonal with RESCORE_MODE_HAMMING + --wrapped-scoring:
    score = 100*seqId (sign = strand), diagonal from the best wrapped
    placement (rescorediagonal.cpp:162-167,215-225,243-246,319-331)."""
    key2id = seqdb.key_to_id()
    rows = {"qkey": [], "tkey": [], "score": [], "diag": []}
    starts = [0]
    qkeys = []
    for qi in range(len(pref.qkeys)):
        sl = pref.records_for(qi)
        qkey = int(pref.qkeys[qi])
        qid = key2id[qkey]
        qbytes = np.array(seqdb.seq_bytes(qid), dtype=np.uint8)
        L = int(len(qbytes))
        doubled = np.concatenate([qbytes, qbytes])
        doubled_rev = _CHAR_REVCOMP_X[doubled][::-1]
        n_out = 0
        for r in range(sl.start, sl.stop):
            tkey = int(pref.tkey[r])
            tid = key2id[tkey]
            is_rev = pref.score[r] < 0
            tlen = int(seqdb.lengths[tid])
            if tlen > L:
                continue  # no valid wrapped scoring (rescorediagonal.cpp:216)
            tbytes = np.array(seqdb.seq_bytes(tid), dtype=np.uint8)
            q2 = doubled_rev if is_rev else doubled
            diag_u = int(pref.diag[r]) & 0xFFFF
            # candidate real diagonals (computeUngappedWrappedAlignment)
            cands = []
            d = 1
            while (-d * 65536 + diag_u) > -tlen:
                cands.append((-d * 65536 + diag_u) + L)
                d += 1
            d = 0
            while (d * 65536 + diag_u) < L:
                cands.append(d * 65536 + diag_u)
                d += 1
            best_score = 0
            best_diag = 0
            first = True
            for rd in cands:
                n = min(tlen, L)
                if rd < 0 or rd + n > 2 * L:
                    continue
                sc = int((q2[rd:rd + n] == tbytes[:n]).sum())
                if first or sc > best_score:
                    best_score = sc
                    best_diag = rd
                first = False
            diagonal_len = min(tlen, L)
            seq_id = np.float32(best_score) / np.float32(diagonal_len)
            qcov = np.float32(diagonal_len) / np.float32(L)
            tcov = np.float32(diagonal_len) / np.float32(tlen)
            is_identity = qid == tid
            if cov_mode == 1:
                has_cov = tcov >= cov_thr
            elif cov_mode == 2:
                has_cov = qcov >= cov_thr
            else:
                has_cov = (qcov >= cov_thr) and (tcov >= cov_thr)
            has_seqid = seq_id >= (np.float32(seq_id_thr) - _EPS)
            if is_identity or (has_cov and has_seqid):
                score100 = int(100 * float(seq_id))
                rows["qkey"].append(qkey)
                rows["tkey"].append(tkey)
                rows["score"].append(-score100 if is_rev else score100)
                rows["diag"].append(int(np.int16(best_diag)))
                n_out += 1
        starts.append(starts[-1] + n_out)
        qkeys.append(qkey)
    return PrefDB(
        qkey=np.array(rows["qkey"], dtype=np.uint32),
        tkey=np.array(rows["tkey"], dtype=np.uint32),
        score=np.array(rows["score"], dtype=np.int32),
        diag=np.array(rows["diag"], dtype=np.int32),
        starts=np.array(starts, dtype=np.int64),
        qkeys=np.array(qkeys, dtype=np.uint32))


def greedy_incremental_cluster(seqdb: SeqDB, pref: PrefDB) -> dict[int, list[int]]:
    """ClusteringAlgorithms::greedyIncrementalLowMem: every member is
    assigned the minimum length-rank id among itself and all queries that
    list it; referenced reps are forced to be their own rep
    (ClusteringAlgorithms.cpp:271-332)."""
    rank = length_rank_ids(seqdb)
    key2id = seqdb.key_to_id()
    n = len(seqdb)
    assigned = np.arange(n, dtype=np.int64)  # by rank id: self-assignment
    # edges: query rank -> member rank
    for qi in range(len(pref.qkeys)):
        q_rank = rank[key2id[int(pref.qkeys[qi])]]
        sl = pref.records_for(qi)
        for r in range(sl.start, sl.stop):
            m_rank = rank[key2id[int(pref.tkey[r])]]
            if q_rank < assigned[m_rank]:
                assigned[m_rank] = q_rank
    # correction pass
    for i in range(n):
        a = assigned[i]
        if assigned[a] != a:
            assigned[a] = a
    # build clusters keyed by rep KEY, members ascending by key
    rank_to_key = {}
    for i in range(n):
        rank_to_key[int(rank[i])] = int(seqdb.keys[i])
    clusters: dict[int, list[int]] = {}
    for i in range(n):
        rep_key = rank_to_key[int(assigned[i])]
        clusters.setdefault(rep_key, []).append(rank_to_key[i])
    # record order: rep key first, remaining members ascending
    # (assignment pairs sorted by (repKey, memberKey); Clustering::writeData)
    return {k: [k] + sorted(m for m in v if m != k)
            for k, v in clusters.items()}


def align_filter(seqdb: SeqDB, pref: PrefDB, seq_id_thr: float,
                 cov_thr: float, cov_mode: int, eval_thr: float) -> PrefDB:
    """The `align` stage reduced to its filtering role: re-align each pair
    on its diagonal end-to-end, keep pairs passing seqId/cov/evalue.
    Returns a PrefDB with the surviving pairs (cluster edges)."""
    key2id = seqdb.key_to_id()
    db_res = seqdb.total_residues
    rows = {"qkey": [], "tkey": [], "score": [], "diag": []}
    starts = [0]
    qkeys = []
    for qi in range(len(pref.qkeys)):
        sl = pref.records_for(qi)
        qkey = int(pref.qkeys[qi])
        qid = key2id[qkey]
        qbytes = np.array(seqdb.seq_bytes(qid), dtype=np.uint8)
        L = len(qbytes)
        n_out = 0
        for r in range(sl.start, sl.stop):
            tkey = int(pref.tkey[r])
            tid = key2id[tkey]
            is_rev = pref.score[r] < 0
            tbytes = np.array(seqdb.seq_bytes(tid), dtype=np.uint8)
            tlen = len(tbytes)
            qb = _CHAR_REVCOMP_X[qbytes][::-1] if is_rev else qbytes
            if qid == tid:
                rows["qkey"].append(qkey); rows["tkey"].append(tkey)
                rows["score"].append(int(2 * L)); rows["diag"].append(0)
                n_out += 1
                continue
            diag_u = int(pref.diag[r]) & 0xFFFF
            best = None
            for cand in (diag_u - 65536, diag_u):
                dist = abs(cand)
                if cand >= 0 and dist < L:
                    n = min(tlen, L - dist)
                    qw, tw = qb[dist:dist + n], tbytes[:n]
                elif cand < 0 and dist < tlen:
                    n = min(tlen - dist, L)
                    qw, tw = qb[:n], tbytes[dist:dist + n]
                else:
                    continue
                q5, t5 = CHAR_TO_CODE[qw], CHAR_TO_CODE[tw]
                m = int(((q5 == t5) & (q5 < 4)).sum())
                score = max(2 * m - 3 * (n - m), 0)
                if best is None or score > best[0]:
                    ids = int((qw == tw).sum())
                    best = (score, cand, n, ids)
            if best is None:
                continue
            score, cand, n, ids = best

            def passes(sid, n_q, n_t, sc):
                qcov = np.float32(n_q) / np.float32(L)
                tcov = np.float32(n_t) / np.float32(tlen)
                if cov_mode == 1:
                    has_cov = tcov >= cov_thr
                elif cov_mode == 2:
                    has_cov = qcov >= cov_thr
                else:
                    has_cov = (qcov >= cov_thr) and (tcov >= cov_thr)
                e = float(ev.evalue(float(sc), float(L), db_res))
                return has_cov and sid >= (np.float32(seq_id_thr) - _EPS) \
                    and e <= eval_thr

            accept = score > 0 and passes(
                np.float32(ids) / np.float32(n), n, n, score)
            if not accept:
                # gapped rescue: banded affine DP around the anchor
                # diagonal, like the reference's BandedNucleotideAligner/
                # ksw2 align stage (indels between near-duplicates make
                # the ungapped diagonal under-count identity)
                from ..ops.banded_align import banded_align
                dist = abs(cand)
                if cand >= 0:
                    q_sub, t_sub = qb[dist:], tbytes
                else:
                    q_sub, t_sub = qb, tbytes[dist:]
                s2, qe2, te2, id2, alen2 = banded_align(
                    CHAR_TO_CODE[q_sub], CHAR_TO_CODE[t_sub])
                if s2 > 0 and alen2 > 0:
                    sid2 = np.float32(id2) / np.float32(alen2)
                    if passes(sid2, qe2 + 1, te2 + 1, s2):
                        accept = True
                        score = s2
            if accept:
                rows["qkey"].append(qkey); rows["tkey"].append(tkey)
                rows["score"].append(score); rows["diag"].append(int(np.int16(cand)))
                n_out += 1
        starts.append(starts[-1] + n_out)
        qkeys.append(qkey)
    return PrefDB(
        qkey=np.array(rows["qkey"], dtype=np.uint32),
        tkey=np.array(rows["tkey"], dtype=np.uint32),
        score=np.array(rows["score"], dtype=np.int32),
        diag=np.array(rows["diag"], dtype=np.int32),
        starts=np.array(starts, dtype=np.int64),
        qkeys=np.array(qkeys, dtype=np.uint32))


def linclust(seqdb: SeqDB, clust_seq_id_thr: float = 0.97,
             clust_cov_thr: float = 0.99, cov_mode: int = 1,
             kmer_size: int = 20) -> dict[int, list[int]]:
    """Full redundancy-reduction pipeline -> {rep key: [member keys]}."""
    pref = kmermatcher(seqdb, kmer_size, 200, 0.2,
                       include_only_extendable=False,
                       cov_mode=cov_mode, cov_thr=clust_cov_thr)
    # hamming thresholds: max(0.5, thr) (Linclust.cpp:107-113)
    rescore1 = hamming_wrapped_rescore(
        seqdb, pref, max(0.5, clust_seq_id_thr), max(0.5, clust_cov_thr),
        cov_mode)
    pre_clust = greedy_incremental_cluster(seqdb, rescore1)

    # representatives sub-database
    rep_keys = sorted(pre_clust.keys())
    key2id = seqdb.key_to_id()
    rep_db = seqdb.select(np.array([key2id[k] for k in rep_keys],
                                   dtype=np.int64))
    rep_set = set(rep_keys)
    # pref filtered to rep queries and rep targets
    mask_rows = []
    starts = [0]
    qkeys = []
    for qi in range(len(pref.qkeys)):
        qk = int(pref.qkeys[qi])
        if qk not in rep_set:
            continue
        sl = pref.records_for(qi)
        sel = [r for r in range(sl.start, sl.stop)
               if int(pref.tkey[r]) in rep_set]
        mask_rows.extend(sel)
        starts.append(starts[-1] + len(sel))
        qkeys.append(qk)
    sel = np.array(mask_rows, dtype=np.int64)
    pref2 = PrefDB(pref.qkey[sel], pref.tkey[sel], pref.score[sel],
                   pref.diag[sel], np.array(starts, dtype=np.int64),
                   np.array(qkeys, dtype=np.uint32))

    aln = align_filter(rep_db, pref2, clust_seq_id_thr, clust_cov_thr,
                       cov_mode, 0.001)
    clust2 = greedy_incremental_cluster(rep_db, aln)

    # mergeclusters: compose
    merged: dict[int, list[int]] = {}
    for rep, members in clust2.items():
        out = []
        for m in members:
            out.extend(pre_clust[m])
        merged[rep] = out
    return merged
