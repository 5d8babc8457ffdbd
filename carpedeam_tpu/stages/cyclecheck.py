"""cyclecheck: circular / terminally-redundant contig detection.

Re-design of src/assembler/cyclecheck.cpp: split each contig into thirds,
count shared 22-mers between thirds per diagonal (diag >= L/3 only), and
call the contig circular when some diagonal band (±1% gap window) reaches
a hit rate > 0.24; optionally chop the sequence at the split diagonal.

Returns (cycle_keys, chopped) where `chopped` maps key -> chopped (or
full, if chop=False) sequence bytes.
"""
from __future__ import annotations

import numpy as np

from ..constants import CHAR_TO_CODE
from ..io.seqdb import SeqDB

HIT_RATE_THRESHOLD = 0.24


def _kmer_indices(codes: np.ndarray, k: int) -> np.ndarray:
    """Indexer::int2index over alphabet size 4 WITHOUT X filtering: code 4
    (X) participates and aliases into the next digit, exactly like the
    reference's `kmerIdx = kmerIdx << 2 | code` arithmetic would NOT --
    Indexer uses powers of 4 with code values up to 4 (cyclecheck.cpp:83,
    118).  Replicated via the same positional-multiply formula."""
    L = len(codes)
    n = L - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    idx = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        idx = idx * np.uint64(4) + codes[j:j + n].astype(np.uint64)
    return idx


def check_one(seq_bytes: np.ndarray, k: int = 22, chop: bool = True,
              max_seq_len: int = 200000):
    """Returns chopped/full bytes if the sequence is circular, else None."""
    L = len(seq_bytes)
    if L >= max_seq_len or L < k:
        return None
    codes = CHAR_TO_CODE[seq_bytes]
    kmers = _kmer_indices(codes, k)
    pos = np.arange(len(kmers))
    third = L // 3
    front = pos < third + 1
    middle = (~front) & (pos < 2 * third + 1)
    back = pos >= 2 * third + 1

    diag_hits = np.zeros(2 * third + 1, dtype=np.int64)
    kmermatches = 0

    def first_pos_unique(mask):
        """first (lowest) position per unique kmer value within a part"""
        km = kmers[mask]
        ps = pos[mask]
        order = np.lexsort((ps, km))
        km, ps = km[order], ps[order]
        keep = np.concatenate([[True], km[1:] != km[:-1]])
        return km[keep], ps[keep], km, ps

    fk, fp, _, _ = first_pos_unique(front)
    mk, mp, mk_all, mp_all = first_pos_unique(middle)
    bk_all = kmers[back]
    bp_all = pos[back]
    order = np.lexsort((bp_all, bk_all))
    bk_all, bp_all = bk_all[order], bp_all[order]

    def count_matches(src_k, src_p, dst_k, dst_p):
        nonlocal kmermatches
        # all (unique-src-kmer, dst-entry) pairs with equal kmer
        idx = np.searchsorted(dst_k, src_k)
        for i in range(len(src_k)):
            j = idx[i]
            while j < len(dst_k) and dst_k[j] == src_k[i]:
                diag = int(dst_p[j]) - int(src_p[i])
                if diag >= third:
                    diag_hits[diag - third] += 1
                    kmermatches += 1
                j += 1

    # front x back and front x middle (all-dst-entries per unique front kmer)
    count_matches(fk, fp, bk_all, bp_all)
    count_matches(fk, fp, mk_all, mp_all)
    # middle x back
    count_matches(mk, mp, bk_all, bp_all)

    if kmermatches == 0:
        return None
    split_diagonal = 0
    for d in range(2 * third):
        if diag_hits[d] == 0:
            continue
        diag = d + third
        diaglen = L - diag
        gapwindow = int(diaglen * 0.01)
        lower = max(0, d - gapwindow)
        upper = min(d + gapwindow, 2 * third)
        band = diag_hits[lower:upper + 1]
        band_hits = int(band[band <= diag_hits[d]].sum())
        rate = np.float32(band_hits) / (diaglen - k + 1)
        if rate > HIT_RATE_THRESHOLD:
            split_diagonal = diag
            break
    if split_diagonal == 0:
        return None
    return bytes(seq_bytes[:split_diagonal]) if chop else bytes(seq_bytes)


def cyclecheck(seqdb: SeqDB, k: int = 22, chop: bool = True,
               max_seq_len: int = 200000):
    """Returns (cycle SeqDB, none_cycle SeqDB): circular contigs (chopped)
    and the remainder, mirroring the script's cycle/noneCycle split
    (data/nuclassemble.sh:19-61).  Native batch kernel when available;
    per-sequence NumPy oracle (check_one) otherwise."""
    from .. import native

    split = native.cyclecheck_batch(seqdb.data, seqdb.offsets,
                                    seqdb.lengths, k, max_seq_len)
    cyc_seqs, cyc_keys, cyc_ext = [], [], []
    keep_idx = []
    for i in range(len(seqdb)):
        if split is not None:
            res = None
            if split[i] > 0:
                sb = seqdb.seq_bytes(i)
                res = bytes(sb[:split[i]]) if chop else bytes(sb)
        else:
            res = check_one(seqdb.seq_bytes(i), k, chop, max_seq_len)
        if res is not None:
            cyc_seqs.append(res)
            cyc_keys.append(int(seqdb.keys[i]))
            cyc_ext.append(bool(seqdb.ext[i]))
        else:
            keep_idx.append(i)
    cyc = SeqDB.from_sequences(cyc_seqs,
                               keys=np.array(cyc_keys, dtype=np.uint32),
                               ext=np.array(cyc_ext, dtype=bool))
    none_cyc = seqdb.select(np.array(keep_idx, dtype=np.int64)) \
        if keep_idx else SeqDB.from_sequences([])
    return cyc, none_cyc
