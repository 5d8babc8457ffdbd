"""Banded affine-gap nucleotide alignment (the ksw2 / BandedNucleotide-
Aligner role in linclust's `align` stage).

The reference aligns candidate pairs with ksw_extz2_sse (band 64, +2/-3
nucleotide matrix, affine gaps o=5 e=2) anchored at the prefilter
diagonal (lib/mmseqs/src/alignment/BandedNucleotideAligner.cpp:169-195);
the result's identity/coverage feed the 0.97/0.99 cluster filter.  This
module provides the same role as a vectorised banded Gotoh DP:

  * the overlap window is anchored at the prefilter diagonal exactly
    like the ungapped scorer (one side starts at 0);
  * a banded (±64 around the anchor diagonal) affine-gap DP runs the
    window semi-globally: the alignment starts at the window start and
    ends at the end of either sequence (end-to-end overlap with
    internal indels);
  * identities / alignment length come from the traceback (gap
    placement within a run follows the H-source convention).

The within-row gap recursion is exact as a prefix-max: extending an
open gap always beats re-opening, so E[i][j] = max_{j'<j}
(max(diag,F)[i][j'] + gape*j') - gapo - gape*j — one
np.maximum.accumulate per row instead of a sequential band scan.

For indel-free pairs the optimal band path is the plain diagonal, so
scores, identities and filter decisions reduce to the ungapped
scorer's (the linclust golden tests pin this); pairs with small indels
— where the ungapped filter under-counts identity — survive like the
reference's gapped filter.
"""
from __future__ import annotations

import numpy as np

NEG = -(10 ** 8)


def banded_align(q: np.ndarray, t: np.ndarray, band: int = 64,
                 match: int = 2, mismatch: int = -3, gapo: int = 5,
                 gape: int = 2):
    """Banded affine-gap semi-global alignment of code arrays q vs t
    (already windowed so both start at alignment start).

    Returns (score, q_end, t_end, n_ident, aln_len): the alignment spans
    q[0:q_end+1] / t[0:t_end+1] and ends at the end of q or of t.
    """
    nq, nt = len(q), len(t)
    if nq == 0 or nt == 0:
        return 0, -1, -1, 0, 0
    from .. import native
    out = native.banded_align_one(q, t, band, match, mismatch, gapo, gape)
    if out is not None:
        # native/banded.cpp: the same DP at ~400x the row-loop speed
        return out
    w = band
    width = 2 * w + 1
    ds = np.arange(width, dtype=np.int64)
    js0 = ds - w                       # j - i offset per band cell

    score_lut = np.full((5, 5), mismatch, dtype=np.int64)
    np.fill_diagonal(score_lut, match)
    score_lut[4, :] = mismatch
    score_lut[:, 4] = mismatch

    q64 = q.astype(np.int64)
    t_pad = np.full(nt + width + 2, 4, dtype=np.int64)
    t_pad[:nt] = t

    # H row 0: leading query gaps (j in [1, w]) as E-state from origin.
    # tb bit layout: bits 0-1 H-source (0 diag, 1 E, 2 F); bit 2 E came
    # from E (gap-extend) vs H (gap-open); bit 3 same for F — the
    # separate gap-state bits make the traceback realize the DP score
    # exactly through multi-column affine runs (ksw2-equivalent).
    H_prev = np.full(width, NEG, dtype=np.int64)
    F_prev = np.full(width, NEG, dtype=np.int64)
    H_prev[w] = 0
    lead = ds > w
    H_prev[lead] = -(gapo + gape * (ds[lead] - w))
    tb = np.zeros((nq + 1, width), dtype=np.uint8)
    tb[0, lead] = 1
    tb[0, ds > w + 1] |= 4              # leading gap run extends E

    best_score, best_qe, best_te = NEG, -1, -1
    dend0 = nt - 1 + w + 1             # band cell where j == nt in row 0
    if 0 <= dend0 < width and H_prev[dend0] > best_score:
        best_score, best_qe, best_te = int(H_prev[dend0]), -1, nt - 1

    for i in range(1, nq + 1):
        qi = q64[i - 1]
        j_of = js0 + (i - 1)           # j-1 of the diagonal source
        valid = (j_of >= -1) & (j_of + 1 <= nt)   # j = j_of+1 in [0, nt]
        diag_ok = (j_of >= 0) & (j_of < nt)
        sub = score_lut[qi, t_pad[np.clip(j_of, 0, nt + width)]]
        diag = np.where(diag_ok, H_prev + sub, NEG)
        F_new = np.full(width, NEG, dtype=np.int64)
        F_new[:-1] = np.maximum(H_prev[1:] - gapo - gape,
                                F_prev[1:] - gape)
        F_new = np.where(valid, F_new, NEG)
        hdf = np.maximum(diag, F_new)
        # E via prefix-max of (hdf + gape*d)
        base = np.where(valid, hdf + gape * ds, NEG)
        run = np.concatenate([[NEG], np.maximum.accumulate(base)[:-1]])
        E_new = np.where(valid, run - gapo - gape * ds, NEG)
        E_new = np.maximum(E_new, NEG)
        H_new = np.maximum(hdf, E_new)
        src = np.zeros(width, dtype=np.uint8)
        src[(E_new > hdf)] = 1
        src[(F_new >= H_new) & (src == 0) & (F_new > diag)] = 2
        # gap-state provenance bits (same-row E recurrence:
        # E[d] = max(E[d-1] - gape, hdf[d-1] - gapo - gape))
        e_ext = np.zeros(width, dtype=bool)
        e_ext[1:] = (E_new[:-1] - gape >= hdf[:-1] - gapo - gape) \
            & (E_new[:-1] > NEG // 2)
        src[e_ext] |= 4
        f_ext = np.zeros(width, dtype=bool)
        f_ext[:-1] = (F_prev[1:] - gape >= H_prev[1:] - gapo - gape) \
            & (F_prev[1:] > NEG // 2)
        src[f_ext] |= 8
        tb[i] = src
        H_prev, F_prev = H_new, F_new
        # alignment may end when either sequence is exhausted
        dq = nt - i + w                 # cell where j == nt
        if 0 <= dq < width and H_new[dq] > best_score:
            best_score, best_qe, best_te = int(H_new[dq]), i - 1, nt - 1
        if i == nq:
            jv = js0 + nq
            cand = np.where((jv >= 1) & (jv <= nt), H_new, NEG)
            dmax = int(np.argmax(cand))
            if cand[dmax] > best_score:
                best_score = int(cand[dmax])
                best_qe, best_te = nq - 1, int(jv[dmax]) - 1

    if best_qe < 0 or best_te < 0 or best_score <= 0:
        return max(best_score, 0), -1, -1, 0, 0
    # traceback for identities / alignment length
    i = best_qe + 1
    d = (best_te + 1) - i + w
    n_ident = 0
    aln_len = 0
    state = 0                           # 0 = H, 1 = E, 2 = F
    guard = 4 * (nq + nt) + 8
    while i > 0 and (d - w + i) > 0 and guard > 0:
        guard -= 1
        cell = tb[i, d]
        if state == 0:
            s = cell & 3
            if s == 0:
                aln_len += 1
                j = d - w + i
                if 0 < j <= nt and q[i - 1] == t[j - 1] and q[i - 1] < 4:
                    n_ident += 1
                i -= 1
            else:
                state = s
        elif state == 1:                # E: consume one target column
            aln_len += 1
            ext = bool(cell & 4)
            d -= 1
            state = 1 if ext else 0
        else:                           # F: consume one query row
            aln_len += 1
            ext = bool(cell & 8)
            i -= 1
            d += 1
            state = 2 if ext else 0
    return best_score, best_qe, best_te, n_ident, aln_len
