"""mergereads: FLASH paired-end overlap merging.

Re-design of src/assembler/mergereads.cpp + lib/flash/combine_reads.cpp:
read 2 is reverse-complemented, then every candidate overlap position is
scored by mismatch density (N positions excluded) with quality-sum tie
breaks; the best overlap below density 0.10 merges the pair (overlap bases
resolved by quality).  Parameters fixed by the reference: max_overlap 65,
min_overlap 15, max_mismatch_density 0.10, no outies (mergereads.cpp:19-24).

The candidate scan is a dense (positions x overlap) comparison — the same
shape as the rescoring kernels; NumPy here, batchable on TPU.
"""
from __future__ import annotations

import gzip

import numpy as np

from ..io.seqdb import SeqDB

MIN_OVERLAP = 15
MAX_OVERLAP = 65
MAX_MISMATCH_DENSITY = 0.10

_COMP = np.full(256, ord("N"), dtype=np.uint8)
for _a, _b in zip(b"ACGTacgt", b"TGCATGCA"):
    _COMP[_a] = _b


def revcomp_read(seq: np.ndarray) -> np.ndarray:
    return _COMP[seq][::-1]


def combine_pair(seq1: np.ndarray, qual1: np.ndarray,
                 seq2rc: np.ndarray, qual2r: np.ndarray):
    """FLASH combine_reads for one pair (read 2 already reverse-complemented,
    its qualities reversed).  Returns merged sequence bytes or None."""
    l1, l2 = len(seq1), len(seq2rc)
    best_density = MAX_MISMATCH_DENSITY + 1.0
    best_qual = 0.0
    best_pos = None
    start = max(0, l1 - l2)
    for i in range(start, l1 - MIN_OVERLAP + 1):
        n = min(l1 - i, l2)
        s1 = seq1[i:i + n]
        s2 = seq2rc[:n]
        not_n = (s1 != ord("N")) & (s2 != ord("N"))
        eff_len = int(not_n.sum())
        if eff_len < MIN_OVERLAP:
            continue
        mm = (s1 != s2) & not_n
        num_mm = int(mm.sum())
        qual_total = int(np.minimum(qual1[i:i + n], qual2r[:n])[mm].sum())
        score_len = np.float32(min(eff_len, MAX_OVERLAP))
        density = np.float32(num_mm) / score_len
        qscore = np.float32(qual_total) / score_len
        if density <= best_density and (density < best_density
                                        or qscore < best_qual):
            best_density = float(density)
            best_qual = float(qscore)
            best_pos = i
    if best_pos is None or best_density > MAX_MISMATCH_DENSITY:
        return None
    # generate combined read
    i = best_pos
    n = min(l1 - i, l2)
    head = seq1[:i]
    tail = seq2rc[n:]
    s1, s2 = seq1[i:i + n], seq2rc[:n]
    q1, q2 = qual1[i:i + n], qual2r[:n]
    same = s1 == s2
    pick1 = q1 > q2
    pick2 = q1 < q2
    # equal quality: take read 2's base unless it is N
    eq_pick1 = (~pick1) & (~pick2) & (s2 == ord("N"))
    mid = np.where(same | pick1 | eq_pick1, s1, s2)
    return np.concatenate([head, mid, tail]).tobytes()


def _read_fastq(path):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        while True:
            h = fh.readline()
            if not h:
                return
            s = fh.readline().rstrip("\n")
            fh.readline()
            q = fh.readline().rstrip("\n")
            yield h.rstrip("\n")[1:], s, q


def mergereads(paths: list[str]) -> SeqDB:
    """Merge paired FASTQ files (R1a R2a R1b R2b ...) into a SeqDB.

    Merged pairs produce one record (ext flag False); unmerged pairs keep
    both reads as separate records, preserving the reference's sequential
    key assignment (mergereads.cpp:80-116)."""
    if len(paths) % 2 != 0:
        raise ValueError("paired-end input requires an even number of files")
    seqs, headers = [], []
    for fi in range(0, len(paths), 2):
        it1 = _read_fastq(paths[fi])
        it2 = _read_fastq(paths[fi + 1])
        for (h1, s1, q1), (h2, s2, q2) in zip(it1, it2):
            if not s1 or not s2 or not q1 or not q2:
                raise ValueError("Invalid sequence/quality record")
            a1 = np.frombuffer(s1.encode(), dtype=np.uint8)
            qa1 = np.frombuffer(q1.encode(), dtype=np.uint8)
            a2 = revcomp_read(np.frombuffer(s2.encode(), dtype=np.uint8))
            qa2 = np.frombuffer(q2.encode(), dtype=np.uint8)[::-1]
            merged = combine_pair(a1, qa1, a2, qa2)
            name1 = h1.split()[0] if h1 else h1
            if merged is not None:
                seqs.append(merged)
                headers.append(name1)
            else:
                seqs.append(s1.encode())
                headers.append(name1)
                seqs.append(a2.tobytes())
                headers.append(h2.split()[0] if h2 else h2)
    return SeqDB.from_sequences(seqs, headers=headers)
