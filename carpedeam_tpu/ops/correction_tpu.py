"""TPU correction kernel: whole-database Bayesian polishing, no per-query loop.

Device-side formulation of stages/correction.py:

  1. per-record RY-identity filter as (R, Lmax) masked window reductions
     over the packed symbol planes (same shape as the rescoring kernel);
  2. one global scatter-add of all alignment columns into a flat
     (total_len * 4 targetBase * 11 damageLayer) coverage vector (plus a
     reverse-strand copy), indexed by global query position;
  3. one einsum against the damage/error log-tables + argmax per position.

Host prepares per-record candidates (canonicalised coords, contig filter,
avCov gate, seqId/alnLen gates) and per-position metadata (observed base,
own damage layer, wasExtended) — all cheap vectorised host work.  The
device does the dense math.  f32 likelihood sums (vs the oracle's f64 /
the reference's long double): argmax ties can differ in principle;
measured 0 position differences on the example dataset.

Threshold comparisons on device are INTEGER-exact, never float ratios:
XLA rewrites f32 division as multiply-by-reciprocal (1 ulp off IEEE), so
`matches/alnLen >= thr` flips for records sitting exactly at the
threshold (e.g. 49/50 vs 0.980).  The host — which knows alnLen and thr —
precomputes the smallest integer match count that passes under numpy's
IEEE f32 division (`rec_ry_smin`), and the device compares ints.  The
ct/ga >= 0.4 ratio exits likewise run as `5*count >= 2*total` (exact for
the oracle's f64 semantics since counts are tiny vs 2^52).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..aligndb import AlnDB
from ..constants import CHAR_TO_ACGT, CHAR_TO_RY, SMOOTHING_VALUE
from ..damage import DamageModel, layer_index, seq_error_profile
from ..io.seqdb import SeqDB


def _sym_to_acgt(b):
    out = jnp.zeros(b.shape, dtype=jnp.int32)
    out = jnp.where(b == ord("C"), 1, out)
    out = jnp.where(b == ord("G"), 2, out)
    out = jnp.where(b == ord("T"), 3, out)
    return out


def _sym_to_ry(b):
    return ((b == ord("C")) | (b == ord("T"))).astype(jnp.int32)


def correction_scatter(sym2, lengths,
                       rec_q, rec_t_row, rec_qstart, rec_tstart, rec_alen,
                       rec_is_rev, rec_keep_pre, rec_ry_smin, rec_goffset,
                       max_len: int, total_len: int):
    """RY filter + coverage scatter over one batch of alignment records.
    Returns flat (total_len*44,) int32 count vectors (fwd+rev, rev-only) —
    additive across record shards, so the multi-chip path just psums them.
    """
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    in_win = pos < rec_alen[:, None]

    t_win = jnp.take_along_axis(
        sym2[rec_t_row], jnp.clip(rec_tstart[:, None] + pos, 0, max_len - 1),
        axis=1)
    q_win = jnp.take_along_axis(
        sym2[rec_q], jnp.clip(rec_qstart[:, None] + pos, 0, max_len - 1),
        axis=1)

    ry_match = (_sym_to_ry(q_win) == _sym_to_ry(t_win)) & in_win
    keep = rec_keep_pre & (ry_match.sum(axis=1) >= rec_ry_smin)

    # scatter all columns
    g_pos = rec_goffset[:, None] + rec_qstart[:, None] + pos
    t_base = _sym_to_acgt(t_win)
    tlen_of = lengths[rec_t_row % lengths.shape[0]]
    t_real = rec_tstart[:, None] + pos
    layers = jnp.full(t_real.shape, 5, dtype=jnp.int32)
    layers = jnp.where(t_real < 5, t_real, layers)
    from_end = t_real - (tlen_of[:, None] - 5)
    layers = jnp.where(from_end >= 0, 6 + from_end, layers)

    use = in_win & keep[:, None]
    flat = jnp.where(use, g_pos * 44 + t_base * 11 + layers, total_len * 44)
    w = use.astype(jnp.int32)
    acc = jnp.zeros(total_len * 44 + 1, dtype=jnp.int32)
    counts = acc.at[flat.reshape(-1)].add(w.reshape(-1))[:-1]
    w_rev = (use & rec_is_rev[:, None]).astype(jnp.int32)
    acc2 = jnp.zeros(total_len * 44 + 1, dtype=jnp.int32)
    rev_counts = acc2.at[flat.reshape(-1)].add(w_rev.reshape(-1))[:-1]
    return counts, rev_counts


def correction_argmax(counts, rev_counts, obs, own_layer, was_ext_pos,
                      log_err, log_deam_f, log_deam_r, raw_deam_f):
    """Per-position Bayesian argmax over (n_pos, 4, 11) coverage stacks.
    Elementwise over positions, so the multi-chip path shards positions."""
    counts = counts.reshape(-1, 4, 11)
    rev_counts = rev_counts.reshape(-1, 4, 11)
    base_covs = counts.sum(axis=2)
    tot = base_covs.sum(axis=1)

    log_q_err = log_err[:, obs].T
    log_q_dam = jnp.log(jnp.maximum(
        raw_deam_f[own_layer[:, None], jnp.arange(4)[None, :], obs[:, None]],
        SMOOTHING_VALUE))
    log_q = jnp.where(was_ext_pos[:, None], log_q_err, log_q_dam)

    # term_obs (sum of count*log_t) is constant across candidate bases q and
    # cannot change the argmax; dropping it removes the dominant-magnitude
    # term and keeps f32 sums well inside the decision margins.
    fdt = log_deam_f.dtype  # f64 when the caller enables x64, else f32
    fwd_minus = (counts - rev_counts).astype(fdt)
    term_q = tot[:, None].astype(fdt) * log_q.astype(fdt)
    term_f = jnp.einsum("ptl,lqt->pq", fwd_minus, log_deam_f)
    term_r = jnp.einsum("ptl,lqt->pq", rev_counts.astype(fdt), log_deam_r)
    lik = term_q + term_f + term_r
    new_base = jnp.argmax(lik, axis=1)

    # c/t >= 0.4 in the oracle's f64 semantics == exact rational compare
    # (counts are exact in f64; f64(0.4) > 2/5, see module docstring)
    ratio_exit = (~was_ext_pos) & ((5 * base_covs[:, 3] >= 2 * tot)
                                   | (5 * base_covs[:, 0] >= 2 * tot))
    corrected = jnp.where(ratio_exit, obs, new_base)
    return corrected, tot


@partial(jax.jit, static_argnames=("max_len", "total_len"))
def correction_device(sym2, lengths,
                      rec_q, rec_t_row, rec_qstart, rec_tstart, rec_alen,
                      rec_is_rev, rec_keep_pre, rec_ry_smin,
                      rec_goffset,
                      obs, own_layer, was_ext_pos,
                      log_err, log_deam_f, log_deam_r, raw_deam_f,
                      max_len: int, total_len: int):
    """Single-device fused stage: returns (corrected_base (total_len,),
    total_cov (total_len,)).

    sym2: (2N, Lmax) stacked symbol planes (fwd; row-reversed revcomp).
    rec_t_row: target plane row (tidx + N*is_rev).  rec_goffset: global
    position of the query's base 0.  obs/own_layer/was_ext_pos: per global
    position.  rec_ry_smin: per-record minimal RY match count (integer
    form of the dynamic RY-identity threshold, precomputed on host).
    """
    counts, rev_counts = correction_scatter(
        sym2, lengths, rec_q, rec_t_row, rec_qstart, rec_tstart, rec_alen,
        rec_is_rev, rec_keep_pre, rec_ry_smin, rec_goffset,
        max_len=max_len, total_len=total_len)
    return correction_argmax(counts, rev_counts, obs, own_layer, was_ext_pos,
                             log_err, log_deam_f, log_deam_r, raw_deam_f)


def prepare_correction_inputs(seqdb: SeqDB, aln: AlnDB, sym2_shape_n: int,
                              corr_reads_ry_seq_id: float, seq_id_thr: float):
    """Host-side: canonicalise records, apply sequence-free filters, build
    per-record arrays for correction_device.  Mirrors stages/correction.py's
    filtering exactly (terminal/avCov gates, contig exclusion, seqId and
    alnLen gates; the RY gate runs on device)."""
    n = len(aln.qkey)
    qid = seqdb.lookup_keys(aln.qkey)
    tid = seqdb.lookup_keys(aln.cols["tkey"])
    qs = aln.cols["qstart"].astype(np.int64).copy()
    qe = aln.cols["qend"].astype(np.int64).copy()
    ts = aln.cols["dbstart"].astype(np.int64).copy()
    te = aln.cols["dbend"].astype(np.int64).copy()
    tl = aln.cols["dblen"].astype(np.int64)
    rev = qs > qe
    qs2 = np.where(rev, qe, qs)
    qe2 = np.where(rev, qs, qe)
    ts2 = np.where(rev, tl - te - 1, ts)
    te2 = np.where(rev, tl - ts - 1, te)
    alen = aln.aln_len.astype(np.int64)
    qlen = seqdb.lengths[qid]

    # avCov per query, broadcast per record
    av_num = np.zeros(len(seqdb), dtype=np.float64)
    np.add.at(av_num, qid, alen)
    av_cov = (av_num[qid] / seqdb.lengths[qid]).astype(np.float32)

    is_contig_t = seqdb.ext[tid]
    is_right = (ts2 == 0) & (qe2 == qlen - 1)
    is_left = (qs2 == 0) & (te2 == tl - 1)
    keep_pre = (~is_contig_t) & (is_right | is_left | (av_cov < 50)) \
        & (aln.cols["seq_id"] >= np.float32(seq_id_thr)) & (alen >= 30)

    thr = np.full(n, np.float32(corr_reads_ry_seq_id), dtype=np.float32)
    small = alen <= 100
    dyn = (alen[small].astype(np.float32) - 1) / alen[small].astype(np.float32)
    thr[small] = np.floor(dyn * np.float32(1000.0)) / np.float32(1000.0)

    # integer form of `f32(matches)/f32(alen) >= thr` (IEEE semantics): the
    # smallest match count that passes, found by probing numpy's f32
    # division around thr*alen.  The device then compares integers — immune
    # to XLA's reciprocal-multiply division (1 ulp off IEEE).
    base = np.floor(thr.astype(np.float64) * alen).astype(np.int64) - 2
    s_min = (alen + 1).astype(np.int64)          # "never passes" default
    al_f = alen.astype(np.float32)
    for d in range(6):
        cand = np.clip(base + d, 0, None)
        ok = (cand.astype(np.float32) / al_f) >= thr
        s_min = np.where(ok & (cand < s_min), cand, s_min)

    offsets = seqdb.offsets.astype(np.int64)
    return {
        "rec_q": qid.astype(np.int32),
        "rec_t_row": (tid + np.where(rev, sym2_shape_n, 0)).astype(np.int32),
        "rec_qstart": qs2.astype(np.int32),
        "rec_tstart": ts2.astype(np.int32),
        "rec_alen": alen.astype(np.int32),
        "rec_is_rev": rev,
        "rec_keep_pre": keep_pre,
        "rec_ry_smin": s_min.astype(np.int32),
        "rec_goffset": offsets[qid].astype(np.int32),
    }


def correction_tpu(seqdb: SeqDB, aln: AlnDB, damage: DamageModel,
                   corr_reads_ry_seq_id: float, seq_id_thr: float,
                   planes=None, lengths=None) -> SeqDB:
    """Device-path drop-in for stages.correction.correction.  Record and
    position axes are padded to bucket boundaries (padding records carry
    keep_pre=False, padded positions get zero coverage and pass through),
    so the executable is reused across assembly iterations."""
    from ..utils import bucket_len, bucket_pairs, bucket_positions
    from .rescore_tpu import pack_sequences

    if planes is None:
        planes, lengths = pack_sequences(seqdb, max_len=bucket_len(
            int(seqdb.lengths.max()) if len(seqdb) else 1))
    n = len(seqdb)
    max_len = planes["sym"].shape[1]
    total_len = int(seqdb.lengths.sum())
    pad_total = bucket_positions(total_len)

    rec = prepare_correction_inputs(seqdb, aln, n, corr_reads_ry_seq_id,
                                    seq_id_thr)
    nrec = len(rec["rec_q"])
    pad_rec = bucket_pairs(nrec)
    recp = {}
    for name, arr in rec.items():
        out = np.zeros(pad_rec, dtype=arr.dtype)
        out[:nrec] = arr
        recp[name] = out
    recp["rec_ry_smin"][nrec:] = 1       # sum 0 >= 1 never holds
    # (rec_keep_pre padding is already False)

    # per-position metadata, padded
    offsets = seqdb.offsets.astype(np.int64)
    obs = np.zeros(pad_total, dtype=np.int32)
    obs[:total_len] = CHAR_TO_ACGT[seqdb.data[:total_len]]
    own_layer = np.zeros(pad_total, dtype=np.int32)
    if n:
        own_layer[:total_len] = np.concatenate([
            layer_index(np.arange(int(L)), int(L)) for L in seqdb.lengths])
    was_ext_pos = np.zeros(pad_total, dtype=bool)
    was_ext_pos[:total_len] = np.repeat(seqdb.ext, seqdb.lengths)

    seq_err = seq_error_profile(0.01)
    log_err = np.log(seq_err).astype(np.float32)
    log_f = np.log(np.maximum(damage.fwd, SMOOTHING_VALUE))
    log_r = np.log(np.maximum(damage.rev, SMOOTHING_VALUE))

    corrected, tot = correction_device(
        planes["sym"], lengths.astype(np.int32),
        recp["rec_q"], recp["rec_t_row"], recp["rec_qstart"],
        recp["rec_tstart"], recp["rec_alen"], recp["rec_is_rev"],
        recp["rec_keep_pre"], recp["rec_ry_smin"], recp["rec_goffset"],
        obs, own_layer, was_ext_pos,
        log_err, log_f, log_r, damage.fwd.astype(np.float32),
        max_len=max_len, total_len=pad_total)
    corrected = np.asarray(corrected)[:total_len]
    tot = np.asarray(tot)[:total_len]

    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    out_flat = np.where(tot <= 1, seqdb.data[:total_len],
                        acgt[corrected])
    return SeqDB.from_flat(out_flat, seqdb.lengths.copy(),
                           keys=seqdb.keys.copy(), ext=seqdb.ext.copy(),
                           headers=seqdb.headers)
