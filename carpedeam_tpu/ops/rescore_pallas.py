"""Pallas TPU kernel for ungapped end-to-end overlap rescoring.

Same contract as ops/rescore_tpu.rescore_pairs_device (itself bit-exact vs
the reference's DistanceCalculator::computeGlobalSubstitutionStartEndDistance,
lib/mmseqs/src/alignment/DistanceCalculator.h:116 / rescorediagonal.cpp:146),
but the per-pair diagonal window extraction is reformulated for the TPU
VPU instead of XLA gathers:

  * the four (P, Lmax) sequence planes for a pair block live in VMEM;
  * for a candidate diagonal, exactly ONE side of the pair has a nonzero
    window offset (qoff = 0 or dist, toff = dist or 0) — so the shifted
    compare `q[qoff+j] == t[toff+j]` becomes a per-row LEFT-ROTATION of
    one plane by `dist`, done as ceil(log2 L) static `pltpu.roll` steps
    gated per row by the shift's bits (a vectorised barrel shifter).
    No per-element gathers — those lower to scalar loops on TPU;
  * match masks / score / coordinate arithmetic are elementwise VPU ops
    and lane reductions, identical in integer semantics to the XLA kernel.

The pair axis is tiled by the grid (PAIR_BLOCK pairs per program) with
double-buffered HBM->VMEM pipelining handled by pallas_call itself.
Row gathers from the (2N, L) stacked planes into per-pair (P, L) blocks
stay outside the kernel (XLA row-gathers are already optimal for that).

On non-TPU backends the kernel runs in interpreter mode (used by the
CPU test suite for bit-parity checks against the NumPy oracle).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAIR_BLOCK = 256


def _pair_block(max_len: int) -> int:
    """Pairs per grid step, bounded by VMEM (the kernel keeps ~8 int32
    (B, L) intermediates live; wide contig shapes need smaller blocks or
    Mosaic spills to HBM).  Narrow (read-length) planes use big blocks:
    fewer grid steps amortise the per-step DMA overhead."""
    if max_len <= 128:
        return 1024
    if max_len <= 256:
        return 512
    if max_len <= 512:
        return PAIR_BLOCK
    if max_len <= 1024:
        return 128
    if max_len <= 2048:
        return 64
    if max_len <= 4096:
        return 32
    if max_len <= 8192:
        return 16
    return 8


def _roll_rows_left(x, shift, n_bits: int, width: int):
    """Rotate each row of x (B, L) left by shift (B, 1) in [0, width).

    Barrel shifter: ceil(log2 width) static full-block rotations, each
    applied per row iff the corresponding bit of the row's shift is set.
    """
    for k in range(n_bits):
        step = 1 << k
        if step >= width:
            break
        take = (shift & step) != 0
        # static rotate-left(step); Mosaic lowers int8 dynamic_rotate
        # poorly, so build the rotation from two static lane slices
        rolled = jnp.concatenate([x[:, step:], x[:, :step]], axis=1)
        x = jnp.where(take, rolled, x)
    return x


def _rescore_kernel(qc_ref, tc_ref, qs_ref, ts_ref, meta_ref, out_ref):
    B, L = qc_ref.shape
    n_bits = max(1, (L - 1).bit_length())
    diag_u = meta_ref[:, 0:1]
    qlen = meta_ref[:, 1:2]
    tlen = meta_ref[:, 2:3]
    # int8 planes are DMA'd to VMEM, then widened: this Mosaic version
    # lacks i8 vector compare/rotate, and i32 VPU ops are native anyway
    qc = qc_ref[:].astype(jnp.int32)
    tc = tc_ref[:].astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    def count_and_score(qw, tw, min_len, valid):
        match = (qw == tw) & (qw < 4) & (pos < min_len)
        m = jnp.sum(match.astype(jnp.int32), axis=1, keepdims=True)
        score = jnp.maximum(2 * m - 3 * (min_len - m), 0)
        return jnp.where(valid, score, 0)

    # negative-diagonal candidate: q starts at 0, t starts at dist
    dist_neg = 65536 - diag_u
    valid_neg = dist_neg < tlen
    len_neg = jnp.where(valid_neg,
                        jnp.minimum(tlen - dist_neg, qlen), 0)
    t_rolled = _roll_rows_left(tc, jnp.where(valid_neg, dist_neg, 0),
                               n_bits, L)
    s_neg = count_and_score(qc, t_rolled, len_neg, valid_neg)

    # positive-diagonal candidate: q starts at dist, t starts at 0
    dist_pos = diag_u
    valid_pos = dist_pos < qlen
    len_pos = jnp.where(valid_pos,
                        jnp.minimum(tlen, qlen - dist_pos), 0)
    q_rolled = _roll_rows_left(qc, jnp.where(valid_pos, dist_pos, 0),
                               n_bits, L)
    s_pos = count_and_score(q_rolled, tc, len_pos, valid_pos)

    use_pos = s_pos > s_neg
    best_score = jnp.where(use_pos, s_pos, s_neg)
    best_len = jnp.where(use_pos, len_pos, len_neg)
    best_dist = jnp.where(use_pos, dist_pos, dist_neg)

    got = best_score > 0
    start = jnp.where(got, 0, -1)
    end = jnp.where(got, best_len - 1, -1)
    dist = jnp.where(got, best_dist, 0)
    dneg = got & (~use_pos)          # the negative candidate is always < 0

    qstart = jnp.where(dneg, start, start + dist)
    tstart = jnp.where(dneg, start + dist, start)
    aln_len = end - start + 1

    # identity count over the winning window (symbol equality, clip(.,0)
    # semantics of the XLA kernel: a -1 start only ever reads position 0
    # because aln_len is 1 there)
    sh_q = jnp.maximum(qstart, 0)
    sh_t = jnp.maximum(tstart, 0)
    qsym = qs_ref[:].astype(jnp.int32)
    tsym = ts_ref[:].astype(jnp.int32)
    a = jnp.where(sh_q > 0, qsym, tsym)
    rolled = _roll_rows_left(a, sh_q + sh_t, n_bits, L)
    qw = jnp.where(sh_q > 0, rolled, qsym)
    tw = jnp.where(sh_q > 0, tsym, rolled)
    id_cnt = jnp.sum(((qw == tw) & (pos < aln_len)).astype(jnp.int32),
                     axis=1, keepdims=True)

    # ONE int32 per pair crosses the (slow) device->host link:
    # score (16 bits, <= 2*16384), id_cnt (15 bits, <= 16384), use_pos
    # (sign bit).  Coordinates are pure functions of (diag, qlen, tlen,
    # use_pos, score>0) and are recomputed on the host (unpack_rescore).
    packed = best_score + (id_cnt << 16)
    out_ref[:] = jnp.where(use_pos,
                           packed | jnp.int32(-2147483648), packed)


@partial(jax.jit, static_argnames=("max_len", "interpret"))
def rescore_pairs_pallas(code2, sym2, lengths, pairs, max_len: int,
                         interpret: bool = False):
    """Pallas drop-in for ops.rescore_tpu.rescore_pairs_device.

    `pairs` is ONE (P, 3) int32 host array (a single H2D transfer):
      col 0: qidx with is_rev packed in the sign bit
      col 1: tidx
      col 2: prefilter diagonal (unsigned-short semantics, low 16 bits)
    Returns (P, 1) int32 packed results (see _rescore_kernel).

    Requires max_len % 128 == 0 (bucket_len guarantees this) and the pair
    count to be a multiple of the pair block (bucket_pairs guarantees it).
    """
    n_pairs = pairs.shape[0]
    B = _pair_block(max_len)
    assert n_pairs % B == 0, n_pairs
    assert max_len % 128 == 0, max_len
    n_seqs = lengths.shape[0]
    qp = pairs[:, 0]
    is_rev = qp < 0
    qidx = qp & 0x7FFFFFFF
    tidx = pairs[:, 1]
    qlen = lengths[qidx].astype(jnp.int32)
    tlen = lengths[tidx].astype(jnp.int32)
    qrow = qidx + jnp.where(is_rev, n_seqs, 0)
    diag_u = pairs[:, 2] & 0xFFFF

    # XLA row gathers (embedding-style, fast); values all < 128 so int8
    qc = code2[qrow].astype(jnp.int8)
    tc = code2[tidx].astype(jnp.int8)
    qs = sym2[qrow].astype(jnp.int8)
    ts = sym2[tidx].astype(jnp.int8)
    meta = jnp.concatenate(
        [diag_u[:, None], qlen[:, None], tlen[:, None],
         jnp.zeros((n_pairs, 5), jnp.int32)], axis=1)

    plane_spec = pl.BlockSpec((B, max_len), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        _rescore_kernel,
        grid=(n_pairs // B,),
        in_specs=[plane_spec, plane_spec, plane_spec, plane_spec,
                  pl.BlockSpec((B, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pairs, 1), jnp.int32),
        interpret=interpret,
    )(qc, tc, qs, ts, meta)
    return packed


RESCORE_FIELDS = ("score", "qstart", "tstart", "aln_len", "id_cnt")


def unpack_rescore(packed_np, lengths, qidx, tidx, diag):
    """Recompute the per-pair field dict from the packed int32 kernel
    output (host side, vectorised).  Coordinates replay the kernel's
    candidate-selection arithmetic exactly from (diag, qlen, tlen,
    use_pos, got); only score/id_cnt/use_pos cross the device->host
    link."""
    v = np.ascontiguousarray(packed_np[:, 0]).view(np.uint32)
    score = (v & 0xFFFF).astype(np.int64)
    id_cnt = ((v >> 16) & 0x7FFF).astype(np.int64)
    use_pos = (v >> 31).astype(bool)

    qlen = lengths[qidx].astype(np.int64)
    tlen = lengths[tidx].astype(np.int64)
    diag_u = diag.astype(np.int64) & 0xFFFF
    cand = np.where(use_pos, diag_u, diag_u - 65536)
    neg = cand < 0
    dist_c = np.abs(cand)
    valid = np.where(neg, dist_c < tlen, dist_c < qlen)
    min_len = np.where(neg, np.minimum(tlen - dist_c, qlen),
                       np.minimum(tlen, qlen - dist_c))
    min_len = np.where(valid, min_len, 0)

    got = score > 0
    start = np.where(got, 0, -1)
    end = np.where(got, min_len - 1, -1)
    dist = np.where(got, dist_c, 0)
    dneg = got & neg
    qstart = np.where(dneg, start, start + dist)
    tstart = np.where(dneg, start + dist, start)
    aln_len = end - start + 1
    return {"score": score, "qstart": qstart, "tstart": tstart,
            "aln_len": aln_len, "id_cnt": id_cnt,
            "qend": qstart + aln_len - 1, "tend": tstart + aln_len - 1,
            "qlen": qlen, "tlen": tlen}


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


# device length levels: pairs are scored in the narrowest level that
# holds both sequences; beyond the last level the native host scorer
# takes over (VMEM bound: _pair_block(L) rows of ~10 (B, L) int32
# intermediates must fit).
LEN_LEVELS = (512, 2048, 8192, 16384)


def rescorediagonal_pallas(seqdb, pref, seq_id_thr, eval_thr=0.001,
                           aln_len_thr=0, planes=None, lengths=None):
    """Pallas drop-in for stages.rescorediagonal.rescorediagonal (same
    host-side assembly/filter path as ops.rescore_tpu.rescorediagonal_tpu).

    Pairs are partitioned by length level (max of the two sequence
    lengths): the shared whole-DB planes serve the <= 512 level, longer
    levels pack per-bucket planes holding only the referenced sequences
    (contig-phase sequences run on device up to 16 kbp; the rare longer
    ones fall back to the native host scorer, bit-identically)."""
    from ..stages.rescorediagonal import (_score_pairs_native,
                                          _score_pairs_numpy,
                                          assemble_alndb)
    from ..utils import bucket_len, bucket_pairs, subtimer
    from .rescore_tpu import device_planes

    with subtimer("rescore.host_prep"):
        n = len(pref.qkey)
        qidx_all = seqdb.lookup_keys(pref.qkey).astype(np.int32)
        tidx_all = seqdb.lookup_keys(pref.tkey).astype(np.int32)
        qlen_all = seqdb.lengths[qidx_all].astype(np.int64)
        tlen_all = seqdb.lengths[tidx_all].astype(np.int64)
        pair_max = np.maximum(qlen_all, tlen_all)
        diag_all = pref.diag.astype(np.int32)
        rev_all = pref.score < 0

        raw = {f: np.zeros(n, dtype=np.int64) for f in
               ("score", "qstart", "qend", "tstart", "tend", "aln_len",
                "id_cnt")}
        raw["qlen"] = qlen_all
        raw["tlen"] = tlen_all

    done = np.zeros(n, dtype=bool)
    for lvl in LEN_LEVELS:
        rows = np.nonzero(~done & (pair_max <= lvl))[0]
        done |= pair_max <= lvl
        if not len(rows):
            continue
        if lvl == LEN_LEVELS[0] and planes is not None:
            pl_b, len_b = planes, np.asarray(lengths)
            q_b, t_b = qidx_all[rows], tidx_all[rows]
        else:
            with subtimer(f"rescore.planes_lvl{lvl}"):
                sub = np.unique(np.concatenate([qidx_all[rows],
                                                tidx_all[rows]]))
                remap = np.full(len(seqdb), -1, dtype=np.int32)
                remap[sub] = np.arange(len(sub), dtype=np.int32)
                pl_b, len_b = device_planes(
                    seqdb, max_len=bucket_len(min(lvl, int(pair_max[rows]
                                                           .max()))),
                    ids=sub)
                q_b, t_b = remap[qidx_all[rows]], remap[tidx_all[rows]]
        with subtimer(f"rescore.pad_lvl{lvl}"):
            m = len(rows)
            mp = bucket_pairs(m)
            pairs = np.zeros((mp, 3), dtype=np.int32)
            pairs[:m, 0] = q_b
            pairs[:m, 0] |= np.where(rev_all[rows], np.int32(-2147483648),
                                     np.int32(0))
            pairs[:m, 1] = t_b
            pairs[:m, 2] = diag_all[rows]
        with subtimer(f"rescore.device_lvl{lvl}"):
            len_dev = pl_b.get("len")
            if len_dev is None:
                len_dev = len_b.astype(np.int32)
            out = rescore_pairs_pallas(pl_b["code"], pl_b["sym"],
                                       len_dev, pairs,
                                       max_len=pl_b["code"].shape[1],
                                       interpret=_use_interpret())
            out.block_until_ready()
        with subtimer(f"rescore.pull_lvl{lvl}"):
            packed = np.asarray(out)[:m]
        with subtimer(f"rescore.unpack_lvl{lvl}"):
            sraw = unpack_rescore(packed, seqdb.lengths, qidx_all[rows],
                                  tidx_all[rows], diag_all[rows])
            for f in raw:
                if f not in ("qlen", "tlen"):
                    raw[f][rows] = sraw[f]

    rest = np.nonzero(~done)[0]
    from ..utils import coverage_add
    coverage_add("rescorediagonal", n - len(rest), len(rest))
    if len(rest):
        # beyond the device levels: native host scorer on those rows only
        sub_pref = type(pref)(qkey=pref.qkey[rest], tkey=pref.tkey[rest],
                              score=pref.score[rest], diag=pref.diag[rest],
                              starts=np.array([0, len(rest)], np.int64),
                              qkeys=pref.qkeys[:1], qext=pref.qext[:1])
        sraw = _score_pairs_native(seqdb, sub_pref)
        if sraw is None:
            sraw = _score_pairs_numpy(seqdb, sub_pref)
        for f in raw:
            raw[f][rest] = sraw[f].astype(np.int64)
    with subtimer("rescore.assemble"):
        return assemble_alndb(seqdb, pref, raw, seq_id_thr, eval_thr,
                              aln_len_thr)
