"""Device-resident kmermatcher: the overlap prefilter on TPU.

TPU-native re-design of the reference's hot kernel #1
(lib/mmseqs/src/linclust/kmermatcher.cpp:78-930), bit-identical to the
host implementation in kmer/matcher.py (itself bit-exact vs the C++).

Architecture (v2).  TPU's XLA sort only has a fast lowering for the
two-operand `sort_key_val` form — every variadic/multi-key sort
comparator hits a pathological compile path (measured: a 3-operand sort
at 2^18 rows fails to compile in 10 minutes; (u64 key, i32 payload)
compiles in ~30 s and sorts 2^25 rows in 0.18 s).  So every ordering
step here is expressed as stable (u64 packed key, i32 permutation)
passes, and all other attributes are *packed into the sorted key* or
reconstructed by fill-forward `cummax` scans — never gathered unless
unavoidable (one u64 gather per global-sort pass):

  1. window extraction / 2-bit packing / canonicalisation / xxh64 as
     native-u64 elementwise chains over (B, L) sequence planes (XLA
     emulates u64 as u32 pairs — same cost as hand-written emulation,
     half the code);
  2. the per-sequence subsampling walk (kmermatcher.cpp:226-350) as a
     batched `lax.scan` state machine over hash-sorted window rows.
     The reference's 65536-bin histogram threshold provably collapses
     to `threshold = sorted_hash[considered-1] + 1` and
     `too_much = rank(threshold) - considered` (see _select_u64);
     per-row sorting = two LSD (key, perm) passes by pos then
     (h16 << 2k | canonical kmer) — one u64 key since 16 + 2k <= 64;
  3. per-bucket compaction: selected windows are moved to the first
     `cap` columns before flattening, so the global table scales with
     the SELECTED count, not total windows, when subsampling bites
     (long sequences / contig phase);
  4. the global k-mer table sort (the ips4o SORT_PARALLEL analogue,
     :409-415) as two stable u64 passes: wB = (len desc, id, pos)
     packed, then wA = the 63-bit masked k-mer (identical to the host
     key `kmer | BIT63` minus the constant bit).  Strand rides in the
     low bit of the payload word, outside the comparison key, exactly
     like the host lexsort;
  5. group -> centre assignment with the 4-case strand table (:453-562)
     as elementwise ops + an i32 `cummax` of group-head indices and
     small gathers of head attributes;
  6. the per-(centre,member) best-diagonal lookahead scan (:841-929,
     including the look-ahead-overruns-group quirk) as segmented
     suffix-argmax scans;
  7. final PrefDB ordering (centres ascending, self row first, members
     ascending, missing-centre passthroughs appended, :716-729 +
     :815-930) via exclusive-cumsum destination indices + two u64
     scatters — replacing a third global sort.

`kmermatcher_device` returns the same PrefDB as kmer.matcher.kmermatcher
(oracle-tested bit-identical in tests/test_kmer_device.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
U64 = jnp.uint64
ALL1 = np.uint64(0xFFFFFFFFFFFFFFFF)

# global packing widths (static): id < 2^B_ID, plane length < 2^B_LEN
B_ID = 21
B_LEN = 19


def _u64(v: int):
    return jnp.uint64(v)


# ---------------------------------------------------------------------------
# native-u64 kmer helpers (bit-exact vs kmer/xxh64.py and kmer/packing.py)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(v, r: int):
    return (v << _u64(r)) | (v >> _u64(64 - r))


def _xxh64_u64(v, seed: int):
    """XXH64 of each u64 with an 8-byte input (kmer/xxh64.xxh64_u64)."""
    k1 = _rotl(v * _u64(_P2), 31) * _u64(_P1)
    acc = _u64((_P5 + seed + 8) & 0xFFFFFFFFFFFFFFFF) ^ k1
    acc = _rotl(acc, 27) * _u64(_P1) + _u64(_P4)
    acc = acc ^ (acc >> _u64(33))
    acc = acc * _u64(_P2)
    acc = acc ^ (acc >> _u64(29))
    acc = acc * _u64(_P3)
    acc = acc ^ (acc >> _u64(32))
    return acc


def _revcomp(idx, k: int):
    """Packed-kmer reverse complement (Util.cpp:601-640 bit tricks)."""
    x = idx ^ _u64(0xAAAAAAAAAAAAAAAA)
    m2 = _u64(0x3333333333333333)
    m4 = _u64(0x0F0F0F0F0F0F0F0F)
    x = ((x >> _u64(2)) & m2) | ((x & m2) << _u64(2))
    x = ((x >> _u64(4)) & m4) | ((x & m4) << _u64(4))
    mb1 = _u64(0x00FF00FF00FF00FF)
    mb2 = _u64(0x0000FFFF0000FFFF)
    x = ((x >> _u64(8)) & mb1) | ((x & mb1) << _u64(8))
    x = ((x >> _u64(16)) & mb2) | ((x & mb2) << _u64(16))
    x = (x >> _u64(32)) | (x << _u64(32))
    return x >> _u64(64 - 2 * k)


# ---------------------------------------------------------------------------
# stage 1+2: extraction + canonicalisation + hashing + selection (per bucket)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("hash_shift",))
def _identity_hash(codes, lengths, hash_shift: int):
    """Util::hash h = h*31 + code over the true length, then xxh64."""
    B, L = codes.shape
    c64 = codes.astype(U64)

    def hstep(h, col):
        x, active = col
        return jnp.where(active, h * _u64(31) + x, h), None

    pos_l = jnp.arange(L, dtype=I32)
    active_cols = pos_l[None, :] < lengths.astype(I32)[:, None]
    h0 = jnp.zeros(B, U64)
    ih, _ = jax.lax.scan(hstep, h0, (c64.T, active_cols.T))
    return _xxh64_u64(ih, hash_shift)


@partial(jax.jit, static_argnames=("k", "hash_shift"))
def _windows_bucket(codes, lengths, k: int, hash_shift: int):
    """All windows: pack, canonicalise, hash, strand-resolve.

    Returns (key2, pos_strand): key2 = (h16 << 2k) | canonical kmer
    (ALL1 for invalid windows), pos_strand = (pos_f << 1) | fwd_bit.
    """
    B, L = codes.shape
    W = L - k + 1
    c64 = codes.astype(U64)
    lengths = lengths.astype(I32)
    kmer = jnp.zeros((B, W), U64)
    for j in range(k):
        kmer = (kmer << _u64(2)) | c64[:, j:j + W]
    isx = (codes > 3).astype(I32)
    csum = jnp.concatenate(
        [jnp.zeros((B, 1), I32), jnp.cumsum(isx, axis=1)], axis=1)
    no_x = (csum[:, k:] - csum[:, :-k]) == 0
    pos = jnp.arange(W, dtype=I32)[None, :]
    inside = pos + k <= lengths[:, None]

    rc = _revcomp(kmer, k)
    palin = rc == kmer
    pick_rev = rc < kmer
    canon = jnp.minimum(rc, kmer)
    keep = no_x & inside & ~palin
    pos_f = jnp.where(pick_rev, lengths[:, None] - pos - k, pos)
    h16 = _xxh64_u64(canon, hash_shift) & _u64(0xFFFF)
    key2 = jnp.where(keep, (h16 << _u64(2 * k)) | canon, ALL1)
    fwd = jnp.where(pick_rev, 0, 1).astype(jnp.uint32)
    pos_strand = (pos_f.astype(jnp.uint32) << jnp.uint32(1)) | fwd
    return key2, pos_strand


@jax.jit
def _rowsort_bucket(key2, pos_strand):
    """Per-row stable sort by (h16, kmer|b63, pos_f); invalid to the end.

    Two LSD (key, perm) passes: pos_f (u32), then key2 (u64)."""
    B, W = key2.shape
    iota = jnp.broadcast_to(jnp.arange(W, dtype=I32)[None, :], (B, W))
    pos_key = pos_strand >> jnp.uint32(1)
    _, perm1 = jax.lax.sort((pos_key, iota), dimension=1, num_keys=1,
                            is_stable=True)
    key2p = jnp.take_along_axis(key2, perm1, axis=1)
    key2s, perm = jax.lax.sort((key2p, perm1), dimension=1, num_keys=1,
                               is_stable=True)
    ps_s = jnp.take_along_axis(pos_strand, perm, axis=1)
    return key2s, ps_s


@partial(jax.jit, static_argnames=("k", "kmers_per_sequence",
                                   "kmers_per_sequence_scale"))
def _select_bucket(key2s, lengths, k: int, kmers_per_sequence: int,
                   kmers_per_sequence_scale: float):
    """Subsampling walk (kmermatcher.cpp:226-350) over hash-sorted rows.

    The reference's 65536-bin histogram threshold collapses exactly to
    `threshold = sorted_hash[considered-1] + 1` (the hierarchical loop
    positions the walk at C(t*512) < considered; the fine loop stops at
    the smallest x with C(x) >= considered) and
    `too_much = rank(threshold) - considered`.
    """
    B, W = key2s.shape
    keep_s = key2s != ALL1
    h16 = jnp.where(keep_s, (key2s >> _u64(2 * k)).astype(I32),
                    jnp.int32(65536))
    valid_cnt = jnp.sum(keep_s.astype(I32), axis=1)
    considered = jnp.minimum(
        (jnp.float32(kmers_per_sequence - 1)
         + jnp.float32(kmers_per_sequence_scale)
         * lengths.astype(jnp.float32)).astype(I32),
        valid_cnt)

    gi = jnp.clip(considered - 1, 0, W - 1)
    t_hash = jnp.take_along_axis(h16, gi[:, None], axis=1)[:, 0]
    thr0 = jnp.where(considered > 0, t_hash + 1, 0)
    rank = jnp.sum((h16 < thr0[:, None]).astype(I32), axis=1)
    too_much0 = jnp.where(considered > 0, rank - considered, 0)

    # cursor semantics: a run of equal masked k-mers encountered at the
    # cursor is skipped and the first different element is processed
    # unconditionally (even if it starts a new run).  key2 equality ==
    # masked-kmer equality (h16 is a function of the kmer).
    eq_next = jnp.concatenate(
        [(key2s[:, 1:] == key2s[:, :-1]) & keep_s[:, 1:],
         jnp.zeros((B, 1), bool)], axis=1)
    eq_prev = jnp.concatenate(
        [jnp.zeros((B, 1), bool), eq_next[:, :-1]], axis=1)

    def sstep(carry, col):
        in_skip, sel, thr, too_much = carry
        h, nxt, prv, vld = col
        landed = in_skip & ~prv
        enter_skip = ~in_skip & nxt
        process = (landed | (~in_skip & ~nxt)) & vld & (sel < considered)
        hit = process & (h < thr)
        is_tm = hit & (h == thr - 1) & (too_much != 0)
        too_much = jnp.where(is_tm, too_much - 1, too_much)
        thr = jnp.where(is_tm & (too_much == 0), thr - 1, thr)
        sel = sel + hit.astype(I32)
        new_skip = (in_skip & prv) | enter_skip
        return (new_skip, sel, thr, too_much), hit

    init = (jnp.zeros(B, bool), jnp.zeros(B, I32), thr0, too_much0)
    _, hits = jax.lax.scan(
        sstep, init, (h16.T, eq_next.T, eq_prev.T, keep_s.T))
    return hits.T


@jax.jit
def _compact_bucket(key2s, ps_s, hits):
    """Move selected windows to the front columns (stable); the caller
    slices to the selection cap so the flat table scales with the
    selected count, not the window count."""
    B, W = key2s.shape
    iota = jnp.broadcast_to(jnp.arange(W, dtype=I32)[None, :], (B, W))
    skey = jnp.where(hits, jnp.uint32(0), jnp.uint32(1))
    _, perm = jax.lax.sort((skey, iota), dimension=1, num_keys=1,
                           is_stable=True)
    k2c = jnp.take_along_axis(key2s, perm, axis=1)
    psc = jnp.take_along_axis(ps_s, perm, axis=1)
    selcnt = jnp.sum(hits.astype(I32), axis=1)
    return k2c, psc, selcnt


@partial(jax.jit, static_argnames=("k",))
def _flatten_bucket(key2c, psc, selcnt, ids_pad, lengths, k: int):
    """Per-bucket selected windows + identity row -> flat (wA, wB2).

    wA = low-63-bit masked kmer (host key `kmer | BIT63` minus the
    constant bit63); wB2 = ((LMAX-len) << (B_ID+B_LEN+1)) |
    (id << (B_LEN+1)) | (pos_f << 1) | fwd.  Unselected/phantom -> ALL1.
    """
    B, W = key2c.shape
    col = jnp.arange(W, dtype=I32)[None, :]
    sel = (col < selcnt[:, None]) & (key2c != ALL1)
    canon = key2c & _u64((1 << (2 * k)) - 1)
    pos_f = (psc >> jnp.uint32(1)).astype(U64)
    fwd = (psc & jnp.uint32(1)).astype(U64)
    lmax = _u64((1 << B_LEN) - 1)
    len64 = lengths.astype(U64)[:, None]
    id64 = ids_pad.astype(U64)[:, None]
    wb2 = ((lmax - len64) << _u64(B_ID + B_LEN + 1)) \
        | (id64 << _u64(B_LEN + 1)) | (pos_f << _u64(1)) | fwd
    wa = jnp.where(sel, canon, ALL1)
    wb2 = jnp.where(sel, wb2, ALL1)
    return wa.ravel(), wb2.ravel()


@jax.jit
def _identity_rows(id_hash, ids_pad, lengths, phantom):
    """Identity entries: wA = hash & ~BIT63, strand = hash >> 63."""
    lmax = _u64((1 << B_LEN) - 1)
    wa = id_hash & _u64(0x7FFFFFFFFFFFFFFF)
    wb2 = ((lmax - lengths.astype(U64)) << _u64(B_ID + B_LEN + 1)) \
        | (ids_pad.astype(U64) << _u64(B_LEN + 1)) \
        | (id_hash >> _u64(63))
    wa = jnp.where(phantom, ALL1, wa)
    wb2 = jnp.where(phantom, ALL1, wb2)
    return wa, wb2


# ---------------------------------------------------------------------------
# stage 3+4: global sort + group assignment (flat table)
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=(0, 1))
def _global_sort(wa, wb2):
    """Global stable sort by (masked kmer, len desc, id, pos) — the ips4o
    SORT_PARALLEL analogue (kmermatcher.cpp:409-415) as two LSD
    (u64 key, i32 perm) passes.  Strand (wb2 bit 0) is NOT a key, same
    as the host lexsort."""
    M = wa.shape[0]
    iota = jnp.arange(M, dtype=I32)
    _, perm1 = jax.lax.sort((wb2 >> _u64(1), iota), num_keys=1,
                            is_stable=True)
    wa1 = wa[perm1]
    wa_s, perm = jax.lax.sort((wa1, perm1), num_keys=1, is_stable=True)
    wb2_s = wb2[perm]
    return wa_s, wb2_s


@partial(jax.jit, static_argnames=("include_only_extendable", "cov_mode"),
         donate_argnums=(0, 1))
def _assign_groups(wa_s, wb2_s, include_only_extendable: bool,
                   cov_mode: int, cov_thr):
    """assignGroup (kmermatcher.cpp:453-562) over the globally sorted
    table; emits per-entry (centre, member, diagonal, fwd, keep)."""
    M = wa_s.shape[0]
    idx = jnp.arange(M, dtype=I32)
    valid = wa_s != ALL1
    lmax = jnp.int32((1 << B_LEN) - 1)
    fwd = (wb2_s & _u64(1)).astype(I32)
    pos = ((wb2_s >> _u64(1)) & _u64((1 << B_LEN) - 1)).astype(I32)
    ids = ((wb2_s >> _u64(B_LEN + 1)) & _u64((1 << B_ID) - 1)).astype(I32)
    seq_len = lmax - (wb2_s >> _u64(B_ID + B_LEN + 1)).astype(I32)

    prev_same = jnp.concatenate(
        [jnp.zeros(1, bool),
         (wa_s[1:] == wa_s[:-1]) & valid[1:] & valid[:-1]])
    new_group = ~prev_same
    next_new = jnp.concatenate([new_group[1:], jnp.ones(1, bool)])
    singleton = new_group & next_new
    keep = valid & ~singleton

    # group-head lookup: i32 cummax of head indices (native fast
    # reduce-window lowering; u64 scans explode the TPU compile) + ONE
    # u64 gather of the head's packed wb2 word — XLA:TPU random gathers
    # run ~60M elem/s, so four separate i32 gathers cost ~12s at 48M
    first_idx = jnp.where(new_group, idx, 0)
    rep_idx = jax.lax.cummax(first_idx)
    rep_wb2 = wb2_s[rep_idx]
    rep_fwd = (rep_wb2 & _u64(1)).astype(I32)
    rep_pos = ((rep_wb2 >> _u64(1)) & _u64((1 << B_LEN) - 1)).astype(I32)
    centre = ((rep_wb2 >> _u64(B_LEN + 1))
              & _u64((1 << B_ID) - 1)).astype(I32)
    rep_len = lmax - (rep_wb2 >> _u64(B_ID + B_LEN + 1)).astype(I32)

    rep_is_rev = rep_fwd == 0
    tgt_is_rev = fwd == 0
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

    centre_fwd = ~q_needs_rev
    return centre, centre_fwd, ids, diagonal, keep


@partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _sort_pairs(keep, centre, member, diagonal, centre_fwd):
    """Stable sort of kept entries by (centre, member, diag): one
    (u64 key, i32 payload) pass; fwd rides in the payload's low bit."""
    M = centre.shape[0]
    doff = jnp.int32(1 << B_LEN)
    key = (centre.astype(U64) << _u64(B_ID + B_LEN + 1)) \
        | (member.astype(U64) << _u64(B_LEN + 1)) \
        | (diagonal + doff).astype(U64)
    key = jnp.where(keep, key, ALL1)
    payload = (jnp.arange(M, dtype=I32) << 1) | centre_fwd.astype(I32)
    key_s, pay_s = jax.lax.sort((key, payload), num_keys=1, is_stable=True)
    kept = key_s != ALL1
    centre_s = (key_s >> _u64(B_ID + B_LEN + 1)).astype(I32)
    member_s = ((key_s >> _u64(B_LEN + 1)) & _u64((1 << B_ID) - 1)).astype(I32)
    diag_s = ((key_s & _u64((1 << (B_LEN + 1)) - 1)).astype(I32)) - doff
    fwd_s = (pay_s & 1).astype(bool)
    return kept, centre_s, member_s, diag_s, fwd_s


def _tiled_suffix_scan(combine, identity, xs):
    """Inclusive suffix scan of an associative `combine` over flat
    (M,) tuple `xs` (M a power of two): out_i = x_i (+) x_{i+1} (+) ...
    with combine(acc_of_later, current).

    `lax.associative_scan`'s log-depth unrolled graph explodes TPU
    compile time superlinearly in M (253 s at 2^21, >15 min at 2^22 for
    a 3-tuple combine — measured); this two-level tiling compiles two
    small `lax.scan` bodies once and runs in tens of ms:

      1. intra-tile suffix scans, all tiles in parallel (scan over the
         B columns, carrying an (NB,)-wide accumulator);
      2. exclusive suffix scan of the NB tile aggregates;
      3. elementwise combine of tile prefix into each element.
    """
    M = xs[0].shape[0]
    b_bits = max((M.bit_length() - 1) // 2, 1)
    B = 1 << b_bits
    NB = M // B
    cols = tuple(x.reshape(NB, B).T[::-1] for x in xs)   # (B, NB) reversed

    ident_nb = tuple(jnp.full((NB,), v, dtype=x.dtype)
                     for v, x in zip(identity, xs))

    def step(carry, col):
        acc = combine(carry, col)
        return acc, acc

    _, suf_cols = jax.lax.scan(step, ident_nb, cols)
    # suf_cols[b] = suffix within tile from column B-1-b; undo reversal
    suf = tuple(s.transpose(1, 0)[:, ::-1].reshape(M) for s in suf_cols)

    # tile aggregates = intra-tile suffix at column 0
    agg = tuple(s[::B] for s in suf)

    ident_1 = tuple(jnp.full((), v, dtype=x.dtype)
                    for v, x in zip(identity, xs))

    def step2(carry, a):
        out = carry                       # exclusive: later tiles only
        return combine(carry, a), out

    _, pre_rev = jax.lax.scan(step2, ident_1,
                              tuple(a[::-1] for a in agg))
    tile_pre = tuple(p[::-1] for p in pre_rev)           # (NB,)

    tile_b = tuple(jnp.repeat(p, B) for p in tile_pre)
    return combine(tile_b, suf)


def _seg_suffix_argmax(s, j_idx, seg_start_rev_mask):
    """Per-element suffix (towards larger j) lexicographic max of (s, j)
    within segments, where segments are delimited (in reverse direction)
    by seg_start_rev_mask.  Implemented as a tiled segmented suffix
    scan."""
    def combine(a, b):
        a_s, a_j, a_f = a
        b_s, b_j, b_f = b
        take_b = b_f | (b_s > a_s) | ((b_s == a_s) & (b_j > a_j))
        return (jnp.where(take_b, b_s, a_s),
                jnp.where(take_b, b_j, a_j),
                a_f | b_f)

    out = _tiled_suffix_scan(
        combine, (jnp.int32(-(2 ** 30)), jnp.int32(-1), False),
        (s, j_idx, seg_start_rev_mask))
    return out[0], out[1]


@partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _pair_scan(kept, centre, member, diagonal, fwd):
    """Per-(centre,member) lookahead scan (kmermatcher.cpp:841-929)."""
    M = centre.shape[0]
    idx = jnp.arange(M, dtype=I32)
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
    nb = jnp.where(next_member_new, idx, jnp.int32(2147483647))
    mre = jax.lax.cummin(nb[::-1])[::-1]          # member-run end >= idx

    s_cnt = idx - run_start + 1                    # full-run count at idx
    is_rev = ~fwd
    suf_s, suf_j = _seg_suffix_argmax(s_cnt, idx, next_member_new)

    # diag-run end containing idx
    next_diag_new = jnp.concatenate([diag_new[1:], jnp.ones(1, bool)])
    db = jnp.where(next_diag_new, idx, jnp.int32(2147483647))
    dre = jax.lax.cummin(db[::-1])[::-1]           # diag-run end >= idx

    partial_cnt = dre - idx + 1
    partial_j = dre
    # full runs after the partial one: suffix argmax at dre+1 (clamped).
    # (suf_s, suf_j) zip into one u64 and (diag, rev) into one i32 so
    # the lookups cost two gathers instead of four (XLA:TPU random
    # gathers are the dominant warm cost at 48M rows)
    has_full = dre < mre
    nxt = jnp.clip(dre + 1, 0, M - 1)
    suf64 = ((suf_s + (1 << 30)).astype(U64) << _u64(32)) \
        | (suf_j + 1).astype(U64)
    v = suf64[nxt]
    full_s = jnp.where(has_full,
                       (v >> _u64(32)).astype(I32) - (1 << 30), -1)
    full_j = jnp.where(has_full,
                       (v & _u64(0xFFFFFFFF)).astype(I32) - 1, -1)
    take_full = (full_s > partial_cnt) | ((full_s == partial_cnt)
                                          & (full_j > partial_j))
    best_j = jnp.where(take_full, full_j, partial_j)
    doff = jnp.int32(1 << B_LEN)
    dr_pack = ((diagonal + doff) << 1) | is_rev.astype(I32)
    dr = dr_pack[best_j]
    best_diag = (dr >> 1) - doff
    best_rev = (dr & 1).astype(bool)
    top = mre - idx + 1

    emit = new_pair & (member != centre)
    score = jnp.where(best_rev, -top, top)
    diag16 = ((best_diag & 0xFFFF) ^ 0x8000) - 0x8000  # int16 truncation

    # ---- self rows: one per centre block containing >= 1 emitted pair ----
    centre_new = kept & ((centre != prev_c) | (idx == 0))
    centre_end = jnp.concatenate([centre_new[1:], jnp.ones(1, bool)])

    def comb_or(a, b):
        a_v, a_f = a
        b_v, b_f = b
        return (b_v | (a_v & ~b_f), a_f | b_f)
    blk_has_emit, _ = _tiled_suffix_scan(comb_or, (False, False),
                                         (emit, centre_end))
    self_emit = centre_new & blk_has_emit

    return {"emit": emit, "self_emit": self_emit, "centre": centre,
            "member": member, "score": score, "diag16": diag16}


# ---------------------------------------------------------------------------
# stage 5: final ordering by destination cumsums + scatter (no third sort)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_seqs_i",))
def _count_rows(emit, self_emit, centre, n_seqs_i: int, n_real):
    """Output row count = emits + self rows + missing-centre rows; the
    caller sizes the scatter buffers from it (a flat-table-sized buffer
    OOMs at 1M reads — rows are ~5% of table slots)."""
    has_centre = jnp.zeros(n_seqs_i, I32).at[
        jnp.clip(centre, 0, n_seqs_i - 1)].max(
        self_emit.astype(I32), mode="drop")
    missing = (has_centre == 0) & (jnp.arange(n_seqs_i, dtype=I32) < n_real)
    return (jnp.sum(emit.astype(I32)) + jnp.sum(self_emit.astype(I32))
            + jnp.sum(missing.astype(I32)))


@partial(jax.jit, static_argnames=("n_seqs_i", "out_cap"),
         donate_argnums=(0,))
def _finalize(g, n_seqs_i: int, n_real, out_cap: int):
    """Pair rows + self rows + missing-centre rows -> final ordered rows.

    Final PrefDB order (kmermatcher.cpp:815-930 + :716-729): centres
    ascending, self row first within each block, then members ascending;
    sequences never written as a centre get a lone self row appended in
    id order.  Rows land at exclusive-cumsum destinations via u32
    scatters (u64 scatters hit XLA:TPU's element-wise emulation path,
    ~1.2 s each at 4M rows) into four planes:
      q_self = (q << 1) | is_self,  t,
      score_off = score + 2^17,     diag_off = diag16 + 2^15.
    `out_cap` >= the true row count (from _count_rows), so the
    mode="drop" clamp never hides a real row.
    """
    emit = g["emit"]
    self_emit = g["self_emit"]
    M = emit.shape[0]
    e_in = jnp.cumsum(emit.astype(I32))
    s_in = jnp.cumsum(self_emit.astype(I32))
    e_ex = e_in - emit.astype(I32)
    big = jnp.int32(out_cap)
    dest_e = jnp.where(emit, e_ex + s_in, big)
    dest_s = jnp.where(self_emit, e_ex + s_in - 1, big)
    total_block = e_in[-1] + s_in[-1]

    has_centre = jnp.zeros(n_seqs_i, I32).at[
        jnp.clip(g["centre"], 0, n_seqs_i - 1)].max(
        self_emit.astype(I32), mode="drop")
    seq_ids = jnp.arange(n_seqs_i, dtype=I32)
    missing = (has_centre == 0) & (seq_ids < n_real)
    m_in = jnp.cumsum(missing.astype(I32))
    dest_m = jnp.where(missing, total_block + m_in - 1, big)
    n_rows = total_block + m_in[-1]

    U32 = jnp.uint32
    qv = g["centre"].astype(U32)
    tv = g["member"].astype(U32)
    qs_e = qv << U32(1)
    sc_e = (g["score"] + (1 << 17)).astype(U32)
    dg_e = (g["diag16"] + (1 << 15)).astype(U32)
    qs_s = (qv << U32(1)) | U32(1)
    zero_sc = jnp.full(M, np.uint32(1 << 17), U32)
    zero_dg = jnp.full(M, np.uint32(1 << 15), U32)
    iv = seq_ids.astype(U32)
    qs_m = (iv << U32(1)) | U32(1)
    zsc_m = jnp.full(n_seqs_i, np.uint32(1 << 17), U32)
    zdg_m = jnp.full(n_seqs_i, np.uint32(1 << 15), U32)

    bufs = [jnp.zeros(out_cap, U32) for _ in range(4)]
    for dest, vals in ((dest_e, (qs_e, tv, sc_e, dg_e)),
                      (dest_s, (qs_s, qv, zero_sc, zero_dg)),
                      (dest_m, (qs_m, iv, zsc_m, zdg_m))):
        bufs = [b.at[dest].set(v, mode="drop")
                for b, v in zip(bufs, vals)]
    return tuple(bufs) + (n_rows,)


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def bucket_geom(n: int, lo: int = 1024) -> int:
    """Round up to the next half-step power of two (2^k or 3*2^(k-1),
    >= lo): geometric shape buckets bound compile variants to O(log n)
    across assembly iterations while capping padding waste at 33%
    (a plain power-of-two bucket doubles a 33M-entry table and OOMs the
    16 GB HBM at 1M reads).  Values stay divisible by large powers of
    two, which the tiled scans need."""
    n = max(int(n), lo)
    p = 1 << (n - 1).bit_length()
    half = (p // 4) * 3
    return half if n <= half else p


def _bucketize(seqdb):
    """Group sequence ids by padded length bucket; returns list of
    (bucket_len, ids ndarray)."""
    from ..utils import bucket_len
    lens = seqdb.lengths
    u = np.unique(lens)
    bl = np.array([bucket_len(int(x)) for x in u])
    l2b = dict(zip(u.tolist(), bl.tolist()))
    b_of = np.array([l2b[int(x)] for x in lens], dtype=np.int64)
    out = []
    for b in np.unique(b_of):
        out.append((int(b), np.nonzero(b_of == b)[0]))
    return out


def kmermatcher_device(seqdb, k: int, kmers_per_sequence: int,
                       kmers_per_sequence_scale: float,
                       include_only_extendable: bool,
                       hash_shift: int = 67, cov_mode: int = 0,
                       cov_thr: float = 0.0):
    """Full kmermatcher stage on device -> PrefDB (bit-identical to
    kmer.matcher.kmermatcher; oracle-tested)."""
    from ..aligndb import PrefDB
    from ..constants import CHAR_TO_CODE

    n_seqs = len(seqdb)
    if n_seqs == 0:
        return PrefDB(qkey=np.zeros(0, np.uint32),
                      tkey=np.zeros(0, np.uint32),
                      score=np.zeros(0, np.int32),
                      diag=np.zeros(0, np.int32),
                      starts=np.zeros(1, np.int64),
                      qkeys=np.zeros(0, np.uint32),
                      qext=np.zeros(0, bool))
    if n_seqs >= (1 << B_ID):
        raise ValueError(f"kmermatcher_device: {n_seqs} sequences exceeds "
                         f"the 2^{B_ID} packing budget; shard first")
    if int(seqdb.lengths.max(initial=0)) >= (1 << B_LEN):
        raise ValueError("kmermatcher_device: sequence length exceeds "
                         f"the 2^{B_LEN} packing budget")

    with jax.enable_x64(True):
        was, wb2s = [], []
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
            ids_pad = np.zeros(Bp, dtype=np.int32)
            ids_pad[:B] = ids_np
            codes_d = jnp.asarray(codes)
            lengths_d = jnp.asarray(lengths)
            ids_d = jnp.asarray(ids_pad)
            phantom = jnp.arange(Bp) >= B

            id_hash = _identity_hash(codes_d, lengths_d, hash_shift)
            wa_i, wb2_i = _identity_rows(id_hash, ids_d, lengths_d, phantom)
            was.append(wa_i)
            wb2s.append(wb2_i)

            if bl < k:
                continue
            key2, pos_strand = _windows_bucket(codes_d, lengths_d, k,
                                               hash_shift)
            key2s, ps_s = _rowsort_bucket(key2, pos_strand)
            hits = _select_bucket(key2s, lengths_d, k, kmers_per_sequence,
                                  float(kmers_per_sequence_scale))
            W = key2s.shape[1]
            # selection cap: nothing beyond `considered` can be selected
            cap = int(np.float32(kmers_per_sequence - 1)
                      + np.float32(kmers_per_sequence_scale)
                      * np.float32(bl)) + 1
            if cap < W // 2:
                # compaction: the flat table scales with selected count
                key2c, psc, selcnt = _compact_bucket(key2s, ps_s, hits)
                key2c = key2c[:, :cap]
                psc = psc[:, :cap]
            else:
                # short sequences: nearly everything is selected — mask
                # unselected in place instead of compacting
                key2c = jnp.where(hits, key2s, ALL1)
                psc = ps_s
                selcnt = jnp.full(key2s.shape[0], W, I32)
            wa_w, wb2_w = _flatten_bucket(key2c, psc, selcnt, ids_d,
                                          lengths_d, k)
            was.append(wa_w)
            wb2s.append(wb2_w)

        wa = jnp.concatenate(was)
        wb2 = jnp.concatenate(wb2s)
        M = wa.shape[0]
        Mp = bucket_geom(M, lo=1 << 16)
        if Mp > M:
            z = Mp - M
            wa = jnp.concatenate([wa, jnp.full(z, ALL1, U64)])
            wb2 = jnp.concatenate([wb2, jnp.full(z, ALL1, U64)])
        wa_s, wb2_s = _global_sort(wa, wb2)
        del wa, wb2
        centre, centre_fwd, member, diagonal, keep = _assign_groups(
            wa_s, wb2_s, bool(include_only_extendable), int(cov_mode),
            jnp.float32(cov_thr))
        del wa_s, wb2_s
        kept, centre_s, member_s, diag_s, fwd_s = _sort_pairs(
            keep, centre, member, diagonal, centre_fwd)
        del centre, centre_fwd, member, diagonal, keep
        g = _pair_scan(kept, centre_s, member_s, diag_s, fwd_s)
        del kept, centre_s, member_s, diag_s, fwd_s

        n_pad = bucket_geom(n_seqs, lo=1024)
        n_rows = int(_count_rows(g["emit"], g["self_emit"], g["centre"],
                                 n_pad, jnp.int32(n_seqs)))
        # scatter buffers sized by the true row count (bucketed so the
        # varying n_rows does not recompile every call)
        sl = bucket_geom(max(n_rows, 1), lo=4096)
        out = _finalize(g, n_pad, jnp.int32(n_seqs), sl)
        del g
        qs_np = np.asarray(out[0])[:n_rows]
        t = np.asarray(out[1])[:n_rows].astype(np.int64)
        sc_np = np.asarray(out[2])[:n_rows]
        dg_np = np.asarray(out[3])[:n_rows]

    q = (qs_np >> np.uint32(1)).astype(np.int64)
    is_self = (qs_np & np.uint32(1)).astype(bool)
    score = (sc_np.astype(np.int64) - (1 << 17)).astype(np.int32)
    diag = (dg_np.astype(np.int64) - (1 << 15)).astype(np.int32)

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
