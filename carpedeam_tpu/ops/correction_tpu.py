"""TPU correction kernel: whole-database Bayesian polishing in 3 fused ops.

Device-side formulation of stages/correction.py with NO per-query loop:

  1. per-record filters (RY identity, terminal/coverage conditions) as
     (R, Lmax) masked window reductions (same gather pattern as rescoring);
  2. one global scatter-add of all alignment columns into a flat
     (total_len, 4-targetBase, 11-damageLayer, 2-strand) coverage tensor,
     indexed by global query position (CSR offsets);
  3. one einsum against the damage/error log-tables + argmax per position.

The per-position likelihood is
  lik[p,q] = tot[p] * logQ[p,q] + sum_tl count*logT
           + (count-rev) . logF[l,q,t] + rev . logR[l,q,t]
exactly as in the host oracle (golden-tested; oracle bit-exact vs the
reference).  All heavy math is the (total_len, 4, 11) einsum -- VPU work
with perfect fusion potential on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SMOOTHING_VALUE

# ACGT map with the reference's N->A quirk
_ACGT = np.zeros(256, dtype=np.uint8)
for _c, _v in zip(b"ACGT", range(4)):
    _ACGT[_c] = _v
_RY = np.zeros(256, dtype=np.uint8)
_RY[ord("C")] = 1
_RY[ord("T")] = 1

_LUT_ACGT = jnp.asarray(_ACGT)
_LUT_RY = jnp.asarray(_RY)


def layer_index_dev(positions, length):
    idx = jnp.full(positions.shape, 5, dtype=jnp.int32)
    idx = jnp.where(positions < 5, positions.astype(jnp.int32), idx)
    from_end = positions - (length - 5)
    return jnp.where(from_end >= 0, 6 + from_end.astype(jnp.int32), idx)


@partial(jax.jit, static_argnames=("max_len", "total_len"))
def correction_device(seq_bytes, lengths, offsets,
                      rec_q, rec_t, rec_qstart, rec_tstart, rec_alen,
                      rec_is_rev, rec_seq_id, rec_keep_pre, rec_left_right,
                      av_cov_per_rec,
                      q_was_ext,
                      log_err, log_deam_f, log_deam_r, log_q_tables,
                      max_len: int, total_len: int,
                      corr_ry_thr, seq_id_thr):
    """Corrects the whole DB.

    seq_bytes (N, Lmax) uint8; lengths (N,); offsets (N,) global position
    offsets.  rec_* are per accepted-candidate-record arrays (R,) — already
    excluding contig targets; rec_keep_pre carries host-side filters that
    don't need sequence access; rec_left_right is True when the record is a
    terminal (left/right) overlap.  log_q_tables: (2, N?, ...) not used —
    the query prior term is computed positionally below.
    Returns corrected (total_len,) base indices + passthrough mask.
    """
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    R = rec_q.shape[0]
    qlen = lengths[rec_q]
    tlen = lengths[rec_t]

    # target window bytes, strand corrected (reverse = revcomp of target)
    tpos = rec_tstart[:, None] + pos
    t_idx = jnp.where(rec_is_rev[:, None], tlen[:, None] - 1 - tpos, tpos)
    t_idx = jnp.clip(t_idx, 0, max_len - 1)
    t_raw = jnp.take_along_axis(seq_bytes[rec_t], t_idx, axis=1)
    # reverse complement bytes via LUT (X -> 'N' like getNuclRevFragment)
    comp = jnp.asarray(np.frombuffer(b"ACTGN", dtype=np.uint8))
    from ..constants import CHAR_TO_CODE, COMPLEMENT_CODE
    revcomp_lut = jnp.asarray(
        np.frombuffer(b"ACTGN", dtype=np.uint8)[
            COMPLEMENT_CODE[CHAR_TO_CODE]])
    t_bytes = jnp.where(rec_is_rev[:, None], revcomp_lut[t_raw], t_raw)

    qpos = rec_qstart[:, None] + pos
    q_idx = jnp.clip(qpos, 0, max_len - 1)
    q_bytes = jnp.take_along_axis(seq_bytes[rec_q], q_idx, axis=1)

    in_win = pos < rec_alen[:, None]

    # RY identity + dynamic threshold
    ry_match = (_LUT_RY[q_bytes] == _LUT_RY[t_bytes]) & in_win
    ry_id = ry_match.sum(axis=1).astype(jnp.float32) \
        / jnp.maximum(rec_alen, 1).astype(jnp.float32)
    a_f = rec_alen.astype(jnp.float32)
    dyn_thr = jnp.floor((a_f - 1) / a_f * 1000.0) / 1000.0
    thr = jnp.where(rec_alen <= 100, dyn_thr, jnp.float32(corr_ry_thr))
    keep = rec_keep_pre & (ry_id >= thr)
    keep &= rec_left_right | (av_cov_per_rec < 50)
    keep &= (rec_seq_id >= jnp.float32(seq_id_thr)) & (rec_alen >= 30)

    # scatter columns into (total_len, 4, 11, 2)
    g_pos = offsets[rec_q][:, None] + qpos                       # (R, L)
    t_base = _LUT_ACGT[t_bytes].astype(jnp.int32)
    t_real_pos = rec_tstart[:, None] + pos
    layers = layer_index_dev(t_real_pos, tlen[:, None])
    use = in_win & keep[:, None]
    flat_idx = (g_pos * 44 + t_base * 11 + layers).reshape(-1)
    w = use.reshape(-1).astype(jnp.int32)
    counts = jnp.zeros(total_len * 44, dtype=jnp.int32).at[flat_idx].add(w)
    w_rev = (use & rec_is_rev[:, None]).reshape(-1).astype(jnp.int32)
    counts_rev = jnp.zeros(total_len * 44, dtype=jnp.int32) \
        .at[flat_idx].add(w_rev)
    count = counts.reshape(total_len, 4, 11)
    rev_count = counts_rev.reshape(total_len, 4, 11)

    # per-position math
    # obs base of every global position
    all_pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    g_all = offsets[:, None] + all_pos
    valid_all = all_pos < lengths[:, None]
    obs_flat = jnp.zeros(total_len, dtype=jnp.uint8).at[
        jnp.where(valid_all, g_all, total_len - 1).reshape(-1)].max(
        jnp.where(valid_all, seq_bytes, 0).reshape(-1))
    obs = _LUT_ACGT[obs_flat].astype(jnp.int32)

    base_covs = count.sum(axis=2)                                # (T, 4)
    tot = base_covs.sum(axis=1)
    totf = jnp.maximum(tot, 1).astype(jnp.float32)
    ct_ratio = base_covs[:, 3] / totf
    ga_ratio = base_covs[:, 0] / totf

    # per-position damage layer of the query itself
    own_pos = jnp.where(valid_all, all_pos, 0)
    own_layer_rows = layer_index_dev(own_pos, lengths[:, None])
    own_layer = jnp.zeros(total_len, dtype=jnp.int32).at[
        jnp.where(valid_all, g_all, total_len - 1).reshape(-1)].max(
        jnp.where(valid_all, own_layer_rows, 0).reshape(-1))

    was_ext_flat = jnp.zeros(total_len, dtype=bool).at[
        jnp.where(valid_all, g_all, total_len - 1).reshape(-1)].max(
        (jnp.zeros_like(valid_all, dtype=bool) | q_was_ext[:, None])
        .reshape(-1) & valid_all.reshape(-1))

    # logQ[p, q]: seq-err prior if the query was extended, damage prior else
    log_q_err = log_err[:, obs].T                                # (T, 4)
    log_q_dam = jnp.log(jnp.maximum(
        log_deam_f_raw_lookup(log_q_tables, own_layer, obs), SMOOTHING_VALUE))
    log_q = jnp.where(was_ext_flat[:, None], log_q_err, log_q_dam)
    log_t = log_err[:, obs].T                                    # (T, t)

    fwd_minus = (count - rev_count).astype(jnp.float32)
    term_obs = jnp.einsum("ptl,pt->p", count.astype(jnp.float32), log_t)
    term_q = tot[:, None].astype(jnp.float32) * log_q
    term_f = jnp.einsum("ptl,lqt->pq", fwd_minus, log_deam_f)
    term_r = jnp.einsum("ptl,lqt->pq", rev_count.astype(jnp.float32),
                        log_deam_r)
    lik = term_obs[:, None] + term_q + term_f + term_r
    new_base = jnp.argmax(lik, axis=1)

    ratio_exit = (~was_ext_flat) & ((ct_ratio >= 0.4) | (ga_ratio >= 0.4))
    corrected = jnp.where(ratio_exit, obs, new_base)
    passthrough = tot <= 1
    return corrected, passthrough


def log_q_tables_make(damage_fwd):
    """(11, 4, 4) raw damage tensor used for positional query priors."""
    return jnp.asarray(damage_fwd)


def log_deam_f_raw_lookup(raw, own_layer, obs):
    """raw[own_layer, q, obs] -> (T, 4)."""
    return raw[own_layer[:, None],
               jnp.arange(4)[None, :],
               obs[:, None]]
