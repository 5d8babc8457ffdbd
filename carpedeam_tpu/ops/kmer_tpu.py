"""Device-resident kmermatcher: the overlap prefilter on TPU.

TPU-native re-design of the reference's hot kernel #1
(lib/mmseqs/src/linclust/kmermatcher.cpp:78-930), bit-identical to the
host implementation in kmer/matcher.py (itself bit-exact vs the C++):

  1. window extraction / 2-bit packing / canonicalisation / xxh64
     scoring as fused elementwise u32-pair chains over (B, L) sequence
     planes (ops/u64.py emulates the 64-bit ops TPUs lack);
  2. the per-sequence subsampling walk (kmermatcher.cpp:226-350) as a
     batched `lax.scan` state machine over hash-sorted window rows.
     The reference's 65536-bin histogram threshold provably collapses
     to `threshold = sorted_hash[considered-1] + 1` and
     `too_much = rank(threshold) - considered` (see _selection_scan);
  3. the global k-mer table sort (the ips4o SORT_PARALLEL analogue,
     :409-415) as one multi-key `lax.sort`;
  4. group -> centre assignment with the 4-case strand table (:453-562)
     as elementwise/cumulative ops;
  5. the per-(centre,member) best-diagonal lookahead scan (:841-929,
     including the look-ahead-overruns-group quirk) as segmented
     suffix-argmax scans — each pair's window is the member-run suffix
     starting at the pair's first entry, the best diagonal run is the
     lexicographic (count, position) maximum over that window.

`kmermatcher_device` returns the same PrefDB as kmer.matcher.kmermatcher
(oracle-tested bit-identical); `kmermatcher_device_arrays` keeps the
result rows on the device for the fused device-resident iteration.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import u64

I32 = jnp.int32
U32 = jnp.uint32
_INVALID = jnp.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# stage 1+2: extraction + canonicalisation + hashing + selection (per bucket)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("hash_shift",))
def _identity_hash(codes, lengths, hash_shift: int):
    """Util::hash h = h*31 + code over the true length, then xxh64."""
    B, L = codes.shape
    c32 = codes.astype(U32)
    thirty_one = u64.const(31)

    def hstep(h, col):
        x, active = col
        nh = u64.add(u64.mul(h, thirty_one), (jnp.zeros_like(x), x))
        return u64.where(active, nh, h), None

    pos_l = jnp.arange(L, dtype=I32)
    active_cols = pos_l[None, :] < lengths.astype(I32)[:, None]
    h0 = (jnp.zeros(B, U32), jnp.zeros(B, U32))
    (ih_hi, ih_lo), _ = jax.lax.scan(hstep, h0, (c32.T, active_cols.T))
    return u64.xxh64_u64((ih_hi, ih_lo), hash_shift)


@partial(jax.jit, static_argnames=("k", "hash_shift"))
def _windows_bucket(codes, lengths, k: int, hash_shift: int):
    """All windows: pack, canonicalise, hash, strand-resolve; returns
    pre-sort per-window arrays plus row-sort keys."""
    B, L = codes.shape
    W = L - k + 1
    c32 = codes.astype(U32)
    lengths = lengths.astype(I32)
    kh = jnp.zeros((B, W), U32)
    kl = jnp.zeros((B, W), U32)
    for j in range(k):
        kh, kl = u64.shl((kh, kl), 2)
        kl = kl | c32[:, j:j + W]
    isx = (codes > 3).astype(I32)
    csum = jnp.concatenate(
        [jnp.zeros((B, 1), I32), jnp.cumsum(isx, axis=1)], axis=1)
    no_x = (csum[:, k:] - csum[:, :-k]) == 0
    pos = jnp.arange(W, dtype=I32)[None, :]
    inside = pos + k <= lengths[:, None]

    canon, pick_rev, palin = u64.canonicalize((kh, kl), k)
    keep = no_x & inside & ~palin
    pos_f = jnp.where(pick_rev, lengths[:, None] - pos - k, pos)
    h16 = u64.hash16(canon, hash_shift)
    kf_hi = jnp.where(pick_rev, canon[0], canon[0] | U32(0x80000000))
    sk0 = jnp.where(keep, h16, _INVALID)
    sk1 = jnp.where(keep, canon[0] | U32(0x80000000), _INVALID)
    return sk0, sk1, canon[1], pos_f, kf_hi, h16


@jax.jit
def _rowsort_bucket(sk0, sk1, kf_lo, pos_f, kf_hi, h16):
    """Per-row sort by (hash, kmer|b63, pos); invalid rows to the end."""
    return jax.lax.sort((sk0, sk1, kf_lo, pos_f, kf_hi, h16),
                        dimension=1, num_keys=4, is_stable=True)


@partial(jax.jit, static_argnames=("kmers_per_sequence",
                                   "kmers_per_sequence_scale"))
def _select_bucket(sk0, kl_s, kfh_s, h16_s, lengths,
                   kmers_per_sequence: int, kmers_per_sequence_scale: float):
    """Subsampling walk (kmermatcher.cpp:226-350) over hash-sorted rows.

    The reference's 65536-bin histogram threshold collapses exactly to
    `threshold = sorted_hash[considered-1] + 1` (the hierarchical loop
    positions the walk at C(t*512) < considered; the fine loop stops at
    the smallest x with C(x) >= considered) and
    `too_much = rank(threshold) - considered`.
    """
    B, W = sk0.shape
    keep_s = sk0 != _INVALID
    valid_cnt = jnp.sum(keep_s.astype(I32), axis=1)
    considered = jnp.minimum(
        (jnp.float32(kmers_per_sequence - 1)
         + jnp.float32(kmers_per_sequence_scale)
         * lengths.astype(jnp.float32)).astype(I32),
        valid_cnt)

    gi = jnp.clip(considered - 1, 0, W - 1)
    t_hash = jnp.take_along_axis(sk0, gi[:, None], axis=1)[:, 0]
    thr0 = jnp.where(considered > 0, t_hash.astype(I32) + 1, 0)
    rank = jnp.sum((sk0 < thr0.astype(U32)[:, None]).astype(I32), axis=1)
    too_much0 = jnp.where(considered > 0, rank - considered, 0)

    # cursor semantics: a run of equal masked k-mers encountered at the
    # cursor is skipped and the first different element is processed
    # unconditionally (even if it starts a new run).
    mh_s = kfh_s | U32(0x80000000)
    eq_next = jnp.concatenate(
        [(mh_s[:, 1:] == mh_s[:, :-1]) & (kl_s[:, 1:] == kl_s[:, :-1])
         & keep_s[:, 1:],
         jnp.zeros((B, 1), bool)], axis=1)
    eq_prev = jnp.concatenate(
        [jnp.zeros((B, 1), bool), eq_next[:, :-1]], axis=1)

    def sstep(carry, col):
        in_skip, sel, thr, too_much = carry
        h, nxt, prv, vld = col
        landed = in_skip & ~prv
        enter_skip = ~in_skip & nxt
        process = (landed | (~in_skip & ~nxt)) & vld & (sel < considered)
        hit = process & (h.astype(I32) < thr)
        is_tm = hit & (h.astype(I32) == thr - 1) & (too_much != 0)
        too_much = jnp.where(is_tm, too_much - 1, too_much)
        thr = jnp.where(is_tm & (too_much == 0), thr - 1, thr)
        sel = sel + hit.astype(I32)
        new_skip = (in_skip & prv) | enter_skip
        return (new_skip, sel, thr, too_much), hit

    init = (jnp.zeros(B, bool), jnp.zeros(B, I32), thr0, too_much0)
    _, hits = jax.lax.scan(
        sstep, init, (h16_s.T, eq_next.T, eq_prev.T, keep_s.T))
    return hits.T


def extract_select_bucket(codes, lengths, k: int, hash_shift: int,
                          kmers_per_sequence: int,
                          kmers_per_sequence_scale: float):
    """codes (B, L) int8 in 0..4 (X=4), lengths (B,).

    Returns per-window arrays in per-sequence (hash, kmer|b63, pos) sorted
    order: kmer hi/lo (with the strand bit-63 convention), pos, h16 and the
    `selected` mask, plus the per-sequence identity-entry hash hi/lo.
    (Phased as several jits: one fused graph made XLA's optimisation
    passes explode superlinearly — 280 s vs 16 s compile.)
    """
    id_hash = _identity_hash(codes, lengths, hash_shift)
    pre = _windows_bucket(codes, lengths, k, hash_shift)
    sk0, sk1, kl_s, pos_s, kfh_s, h16_s = _rowsort_bucket(*pre)
    selected = _select_bucket(sk0, kl_s, kfh_s, h16_s,
                              jnp.asarray(lengths), kmers_per_sequence,
                              float(kmers_per_sequence_scale))
    return {"kmer_hi": kfh_s, "kmer_lo": kl_s, "pos": pos_s,
            "h16": h16_s, "selected": selected,
            "id_hash_hi": id_hash[0], "id_hash_lo": id_hash[1]}


# ---------------------------------------------------------------------------
# stage 3+4: global sort + group assignment (flat table)
# ---------------------------------------------------------------------------

def _seg_suffix_argmax(s, j_idx, seg_start_rev_mask):
    """Per-element suffix (towards larger j) lexicographic max of (s, j)
    within segments, where segments are delimited (in reverse direction)
    by seg_start_rev_mask.  Implemented as a reversed segmented
    associative scan."""
    def combine(a, b):
        # scanning reversed arrays: `a` is the accumulation from elements
        # AFTER (in original order) — reset if b starts a new segment
        a_s, a_j, a_f = a
        b_s, b_j, b_f = b
        take_b = b_f | (b_s > a_s) | ((b_s == a_s) & (b_j > a_j))
        return (jnp.where(take_b, b_s, a_s),
                jnp.where(take_b, b_j, a_j),
                a_f | b_f)

    rs = s[::-1]
    rj = j_idx[::-1]
    rf = seg_start_rev_mask[::-1]
    out = jax.lax.associative_scan(combine, (rs, rj, rf))
    return out[0][::-1], out[1][::-1]


@jax.jit
def _global_sort(pad, kmer_hi, kmer_lo, ids, pos, seq_len):
    """Global sort by (pad, kmer|b63, seqLen desc, id, pos) — the ips4o
    SORT_PARALLEL analogue (kmermatcher.cpp:409-415)."""
    m_hi = kmer_hi | U32(0x80000000)
    neg_len = ~seq_len                       # int32 ascending == len desc
    pad_k = pad.astype(U32)
    out = jax.lax.sort(
        (pad_k, m_hi, kmer_lo, neg_len, ids, pos, kmer_hi, seq_len),
        num_keys=6, is_stable=True)
    return out


@partial(jax.jit, static_argnames=("include_only_extendable", "cov_mode"))
def _assign_groups(pad_k, m_hi, kmer_lo, ids, pos, kmer_hi, seq_len,
                   include_only_extendable: bool, cov_mode: int, cov_thr):
    """assignGroup (kmermatcher.cpp:453-562) over the globally sorted
    table; emits per-entry (centre, member, diagonal, fwd, keep)."""
    M = kmer_hi.shape[0]
    idx = jnp.arange(M, dtype=I32)
    valid = pad_k == 0
    prev_same = jnp.concatenate(
        [jnp.zeros(1, bool),
         (m_hi[1:] == m_hi[:-1]) & (kmer_lo[1:] == kmer_lo[:-1])
         & valid[1:] & valid[:-1]])
    new_group = ~prev_same
    first_idx = jnp.where(new_group, idx, 0)
    rep_idx = jax.lax.cummax(first_idx)
    next_new = jnp.concatenate([new_group[1:], jnp.ones(1, bool)])
    # group size > 1 <=> not (first of group and last of group)
    singleton = new_group & next_new
    keep = valid & ~singleton

    rep_is_rev = (kmer_hi[rep_idx] & U32(0x80000000)) == 0
    tgt_is_rev = (kmer_hi & U32(0x80000000)) == 0
    rep_pos = pos[rep_idx]
    rep_len = seq_len[rep_idx]
    flip = tgt_is_rev
    q_pos = jnp.where(flip, rep_len - 1 - rep_pos, rep_pos)
    t_pos_adj = jnp.where(flip, seq_len - 1 - pos, pos)
    q_needs_rev = rep_is_rev ^ tgt_is_rev
    diagonal = q_pos - t_pos_adj

    can_ext = (diagonal < 0) | (diagonal > (rep_len - seq_len))
    if include_only_extendable:
        keep = keep & can_ext
    else:
        ql = rep_len.astype(jnp.float32)
        tl = seq_len.astype(jnp.float32)
        if cov_mode == 0:
            cov = (ql / tl >= cov_thr) & (tl / ql >= cov_thr)
        elif cov_mode == 1:
            cov = ql / tl >= cov_thr
        elif cov_mode == 2:
            cov = tl / ql >= cov_thr
        else:
            cov = jnp.ones_like(ql, bool)
        keep = keep & jnp.where(cov_thr <= 0.0, True, cov)

    centre = ids[rep_idx]
    centre_fwd = ~q_needs_rev
    return centre, centre_fwd, ids, diagonal, keep


@jax.jit
def _sort_pairs(keep, centre, member, diagonal, centre_fwd):
    """Stable sort of kept entries by (centre, member, diag)."""
    c_key = jnp.where(keep, centre.astype(U32), _INVALID)
    m_key = member.astype(U32)
    d_key = (diagonal ^ jnp.int32(-2147483648)).view(jnp.uint32)
    return jax.lax.sort(
        (c_key, m_key, d_key, centre, member, diagonal, centre_fwd),
        num_keys=3, is_stable=True)


@jax.jit
def _pair_scan(c_key, centre, member, diagonal, fwd):
    """Per-(centre,member) lookahead scan (kmermatcher.cpp:841-929)."""
    M = centre.shape[0]
    idx = jnp.arange(M, dtype=I32)
    kept = c_key != _INVALID
    prev_c = jnp.concatenate([jnp.full(1, -1, I32), centre[:-1]])
    prev_m = jnp.concatenate([jnp.full(1, -1, I32), member[:-1]])
    prev_d = jnp.concatenate([jnp.full(1, -1, I32), diagonal[:-1]])
    # padding tail: member = -2 ensures no run continues into it
    member_eff = jnp.where(kept, member, -2 - idx)
    prev_m_eff = jnp.concatenate([jnp.full(1, -1, I32), member_eff[:-1]])
    new_pair = kept & ((centre != prev_c) | (member != prev_m)
                       | (idx == 0))
    member_new = (member_eff != prev_m_eff) | (idx == 0)
    diag_new = member_new | (diagonal != prev_d)

    run_start = jax.lax.cummax(jnp.where(diag_new, idx, 0))
    # member-run end: last index of the contiguous member-run
    next_member_new = jnp.concatenate([member_new[1:], jnp.ones(1, bool)])
    # reverse cummin of boundary indices
    nb = jnp.where(next_member_new, idx, jnp.int32(2147483647))
    mre = jax.lax.cummin(nb[::-1])[::-1]          # member-run end >= idx

    s_cnt = idx - run_start + 1                    # full-run count at idx
    suf_s, suf_j = _seg_suffix_argmax(s_cnt, idx, next_member_new)

    # diag-run end containing idx
    next_diag_new = jnp.concatenate([diag_new[1:], jnp.ones(1, bool)])
    db = jnp.where(next_diag_new, idx, jnp.int32(2147483647))
    dre = jax.lax.cummin(db[::-1])[::-1]           # diag-run end >= idx

    partial_cnt = dre - idx + 1
    partial_j = dre
    # full runs after the partial one: suffix argmax at dre+1 (clamped)
    has_full = dre < mre
    nxt = jnp.clip(dre + 1, 0, M - 1)
    full_s = jnp.where(has_full, suf_s[nxt], -1)
    full_j = jnp.where(has_full, suf_j[nxt], -1)
    take_full = (full_s > partial_cnt) | ((full_s == partial_cnt)
                                          & (full_j > partial_j))
    best_j = jnp.where(take_full, full_j, partial_j)
    best_diag = diagonal[best_j]
    best_rev = ~fwd[best_j]
    top = mre - idx + 1

    emit = new_pair & (member != centre)
    score = jnp.where(best_rev, -top, top)
    diag16 = ((best_diag & 0xFFFF) ^ 0x8000) - 0x8000  # int16 truncation

    # ---- self rows: one per centre block containing >= 1 emitted pair ----
    centre_new = kept & ((centre != prev_c) | (idx == 0))
    # reverse segmented or: does any emit exist in [idx, centre-block end]?
    # (segment flags for a reversed scan mark block ENDS in original order)
    centre_end = jnp.concatenate([centre_new[1:], jnp.ones(1, bool)])

    def comb_or(a, b):
        a_v, a_f = a
        b_v, b_f = b
        return (b_v | (a_v & ~b_f), a_f | b_f)
    r_emit, _ = jax.lax.associative_scan(
        comb_or, (emit[::-1], centre_end[::-1]))
    blk_has_emit = r_emit[::-1]                     # any emit at/after idx
    self_emit = centre_new & blk_has_emit

    return {"emit": emit, "self_emit": self_emit, "centre": centre,
            "member": member, "score": score, "diag16": diag16,
            "kept": kept}


def group_and_pairs(pad, kmer_hi, kmer_lo, ids, pos, seq_len,
                    include_only_extendable: bool, cov_mode: int, cov_thr):
    """Flat selected-entry table -> emitted prefilter rows, on device.

    `pad` marks unselected/padding slots (sorted to the tail).  Phased
    as several jits (see extract_select_bucket note)."""
    srt = _global_sort(pad, kmer_hi, kmer_lo, ids, pos, seq_len)
    pad_k, m_hi, kmer_lo, neg_len, ids, pos, kmer_hi, seq_len = srt
    centre, centre_fwd, member, diagonal, keep = _assign_groups(
        pad_k, m_hi, kmer_lo, ids, pos, kmer_hi, seq_len,
        include_only_extendable, cov_mode, cov_thr)
    c_key, m_key, d_key, centre, member, diagonal, fwd = _sort_pairs(
        keep, centre, member, diagonal, centre_fwd)
    return _pair_scan(c_key, centre, member, diagonal, fwd)


# ---------------------------------------------------------------------------
# stage 5: row compaction into the final PrefDB order
# ---------------------------------------------------------------------------

def bucket_geom(n: int, lo: int = 1024) -> int:
    """Round up to the next power of two (>= lo): geometric shape buckets
    bound compile variants to O(log n) across assembly iterations."""
    n = max(int(n), lo)
    return 1 << (n - 1).bit_length()


@partial(jax.jit, static_argnames=("n_seqs_i",))
def compact_rows(g, n_seqs_i, n_real):
    """Pair rows + self rows + missing-centre rows -> final ordered rows.

    Final PrefDB order (kmermatcher.cpp:815-930 + :716-729): centres
    ascending, self row first within each block, then members ascending;
    sequences never written as a centre get a lone self row appended in
    id order.  One stable 3-key sort compacts everything.  `n_seqs_i` is
    the bucketed slot count; `n_real` the true sequence count (phantom
    slots emit nothing).
    """
    M = g["centre"].shape[0]
    # has_centre per sequence id (scatter of self_emit)
    has_centre = jnp.zeros(n_seqs_i, I32).at[
        jnp.clip(g["centre"], 0, n_seqs_i - 1)].max(
        g["self_emit"].astype(I32), mode="drop")
    seq_ids = jnp.arange(n_seqs_i, dtype=I32)
    missing = (has_centre == 0) & (seq_ids < n_real)

    # slots: [pair rows (M)] + [self rows (M)] + [missing rows (n_seqs)]
    is_row = jnp.concatenate([g["emit"], g["self_emit"], missing])
    sect = jnp.concatenate([jnp.zeros(M, I32), jnp.zeros(M, I32),
                            jnp.ones(n_seqs_i, I32)])
    qc = jnp.concatenate([g["centre"], g["centre"], seq_ids])
    # member order key: self rows first (0), members at member+1
    mkey = jnp.concatenate([g["member"] + 1, jnp.zeros(M, I32),
                            jnp.zeros(n_seqs_i, I32)])
    tgt = jnp.concatenate([g["member"], g["centre"], seq_ids])
    score = jnp.concatenate([g["score"], jnp.zeros(M, I32),
                             jnp.zeros(n_seqs_i, I32)])
    diag = jnp.concatenate([g["diag16"].astype(I32), jnp.zeros(M, I32),
                            jnp.zeros(n_seqs_i, I32)])

    k0 = jnp.where(is_row, sect.astype(U32), _INVALID)
    k1 = qc.astype(U32)
    k2 = mkey.astype(U32)
    k0, k1, k2, qc, tgt, score, diag, is_row = jax.lax.sort(
        (k0, k1, k2, qc, tgt, score, diag, is_row),
        num_keys=3, is_stable=True)
    n_rows = jnp.sum(is_row.astype(I32))
    is_self = k2 == 0
    return {"q": qc, "t": tgt, "score": score, "diag": diag,
            "valid": is_row, "is_self": is_self, "n_rows": n_rows}


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def _bucketize(seqdb):
    """Group sequence ids by padded length bucket; returns list of
    (bucket_len, ids ndarray)."""
    from ..utils import bucket_len
    lens = seqdb.lengths
    buckets: dict[int, list] = {}
    bl = np.array([bucket_len(int(x)) for x in np.unique(lens)])
    u = np.unique(lens)
    l2b = dict(zip(u.tolist(), bl.tolist()))
    b_of = np.array([l2b[int(x)] for x in lens], dtype=np.int64)
    out = []
    for b in np.unique(b_of):
        out.append((int(b), np.nonzero(b_of == b)[0]))
    return out


def extract_selected_device(seqdb, k: int, kmers_per_sequence: int,
                            kmers_per_sequence_scale: float,
                            hash_shift: int):
    """Whole-database extraction+selection on device; returns flat device
    arrays (kmer_hi, kmer_lo, id, pos, seq_len) where *unselected* slots
    are marked kmer_hi == 0xFFFFFFFF with unique kmer_lo, plus the flat
    slot count.  Identity entries are appended per sequence."""
    from ..constants import CHAR_TO_CODE
    parts = []
    for bl, ids_np in _bucketize(seqdb):
        B = len(ids_np)
        Bp = bucket_geom(B, lo=256)     # row bucket: compile reuse
        lens_b = seqdb.lengths[ids_np].astype(np.int64)
        codes = np.full((Bp, bl), 4, dtype=np.int8)
        tot = int(lens_b.sum())
        row = np.repeat(np.arange(B), lens_b)
        cum = np.concatenate([[0], np.cumsum(lens_b)])
        col = np.arange(tot) - np.repeat(cum[:-1], lens_b)
        flat = np.repeat(seqdb.offsets[ids_np], lens_b) + col
        codes[row, col] = CHAR_TO_CODE[seqdb.data[flat]]
        lengths = np.zeros(Bp, dtype=np.int32)
        lengths[:B] = lens_b
        if bl < k:
            ext = None
        else:
            ext = extract_select_bucket(jnp.asarray(codes),
                                        jnp.asarray(lengths), k, hash_shift,
                                        kmers_per_sequence,
                                        float(kmers_per_sequence_scale))
        parts.append((ids_np, lengths, ext))
    return parts


def kmermatcher_device(seqdb, k: int, kmers_per_sequence: int,
                       kmers_per_sequence_scale: float,
                       include_only_extendable: bool,
                       hash_shift: int = 67, cov_mode: int = 0,
                       cov_thr: float = 0.0):
    """Full kmermatcher stage on device -> PrefDB (bit-identical to
    kmer.matcher.kmermatcher; oracle-tested)."""
    from ..aligndb import PrefDB

    n_seqs = len(seqdb)
    parts = extract_selected_device(seqdb, k, kmers_per_sequence,
                                    kmers_per_sequence_scale, hash_shift)

    # flatten buckets into one table (selected windows + identity entries)
    khs, kls, idss, poss, lens, pads = [], [], [], [], [], []
    for ids_np, lengths, ext in parts:
        B = len(ids_np)
        Bp = len(lengths)                     # row-bucketed count
        ids_pad = np.zeros(Bp, dtype=np.int32)
        ids_pad[:B] = ids_np
        ids_dev = jnp.asarray(ids_pad)
        phantom = jnp.arange(Bp) >= B
        if ext is not None:
            W = ext["kmer_hi"].shape[1]
            sel = ext["selected"]
            khs.append(ext["kmer_hi"].ravel())
            kls.append(ext["kmer_lo"].ravel())
            idss.append(jnp.broadcast_to(ids_dev[:, None], (Bp, W)).ravel())
            poss.append(ext["pos"].ravel())
            lens.append(jnp.broadcast_to(
                jnp.asarray(lengths)[:, None], (Bp, W)).ravel())
            pads.append(~sel.ravel())
            khs.append(ext["id_hash_hi"])
            kls.append(ext["id_hash_lo"])
        else:
            # sequences shorter than k still get their identity entry
            from ..kmer.xxh64 import util_hash_codes_batch, xxh64_u64
            from ..constants import CHAR_TO_CODE
            codes_flat = CHAR_TO_CODE[seqdb.data]
            ih = np.zeros(Bp, dtype=np.uint64)
            ih[:B] = xxh64_u64(util_hash_codes_batch(
                codes_flat, seqdb.offsets[ids_np], seqdb.lengths[ids_np]),
                hash_shift)
            khs.append(jnp.asarray((ih >> np.uint64(32)).astype(np.uint32)))
            kls.append(jnp.asarray(
                (ih & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
        idss.append(ids_dev)
        poss.append(jnp.zeros(Bp, I32))
        lens.append(jnp.asarray(lengths))
        pads.append(phantom)

    kmer_hi = jnp.concatenate(khs)
    kmer_lo = jnp.concatenate(kls)
    ids = jnp.concatenate(idss).astype(I32)
    pos = jnp.concatenate(poss).astype(I32)
    seq_len = jnp.concatenate(lens).astype(I32)
    pad = jnp.concatenate(pads)

    # flat-table bucket: pad slots sort to the tail and emit nothing
    M = kmer_hi.shape[0]
    Mp = bucket_geom(M, lo=1 << 16)
    if Mp > M:
        z = Mp - M
        kmer_hi = jnp.concatenate([kmer_hi, jnp.zeros(z, U32)])
        kmer_lo = jnp.concatenate([kmer_lo, jnp.zeros(z, U32)])
        ids = jnp.concatenate([ids, jnp.zeros(z, I32)])
        pos = jnp.concatenate([pos, jnp.zeros(z, I32)])
        seq_len = jnp.concatenate([seq_len, jnp.zeros(z, I32)])
        pad = jnp.concatenate([pad, jnp.ones(z, bool)])

    g = group_and_pairs(pad, kmer_hi, kmer_lo, ids, pos, seq_len,
                        bool(include_only_extendable), int(cov_mode),
                        jnp.float32(cov_thr))
    rows = compact_rows(g, bucket_geom(n_seqs, lo=1024),
                        jnp.int32(n_seqs))

    n_rows = int(rows["n_rows"])
    q = np.asarray(rows["q"][:n_rows])
    t = np.asarray(rows["t"][:n_rows])
    score = np.asarray(rows["score"][:n_rows])
    diag = np.asarray(rows["diag"][:n_rows])
    is_self = np.asarray(rows["is_self"][:n_rows])

    keys = seqdb.keys
    qkey = keys[q].astype(np.uint32)
    tkey = keys[t].astype(np.uint32)
    # group starts: new centre block = self row (every block starts with one)
    starts = np.concatenate([np.nonzero(is_self)[0], [n_rows]]).astype(
        np.int64)
    out_qkeys = qkey[is_self]
    # ext flag: True only for missing-centre passthrough rows of extended
    # sequences (kmermatcher.cpp:716-729)
    lone = (starts[1:] - starts[:-1]) == 1
    qext = np.zeros(len(out_qkeys), dtype=bool)
    qext[lone] = seqdb.ext[q[is_self][lone]]
    return PrefDB(qkey=qkey, tkey=tkey, score=score.astype(np.int32),
                  diag=diag.astype(np.int32), starts=starts,
                  qkeys=out_qkeys, qext=qext)
