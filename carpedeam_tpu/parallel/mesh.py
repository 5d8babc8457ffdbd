"""Device-mesh sharding of the assembly iteration.

The reference scales with MPI by splitting the k-mer hash range across
ranks (kmermatcher.cpp:636-664) and record row-ranges for rescoring
(rescorediagonal.cpp:400-422), merging results through the shared
filesystem.  The TPU-native equivalent keeps everything on the mesh:

* candidate pairs / alignment records shard over the `dp` axis (the
  row-range analogue);
* the packed sequence planes are replicated (they are small relative to
  the pair table; row-sharding + all_gather is the escape hatch for
  giant inputs);
* the correction coverage tensor is scatter-added per record shard and
  merged with ONE psum over `dp` — the reference's "merge corrected
  bases through the filesystem" becomes one ICI collective — after
  which each device runs the per-position argmax on its own position
  slice (positions shard over the same axis);
* the k-mer table itself shards by 16-bit hash prefix
  (`extract_selected_kmers(hash_range=...)`), identical ranges to the
  reference's MPI splits, so each host sorts a disjoint slice.

The sharded stages are bit-identical drop-ins for the single-device
wrappers (ops/rescore_tpu.rescorediagonal_tpu, ops/correction_tpu.
correction_tpu): same host filter/assembly code, same kernels, with
shard_map supplying the data parallelism.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from ..constants import CHAR_TO_ACGT, SMOOTHING_VALUE
from ..damage import layer_index, seq_error_profile
from ..ops.correction_tpu import (correction_argmax, correction_scatter,
                                  prepare_correction_inputs)
from ..ops.rescore_tpu import pack_sequences, rescore_pairs_device
from ..utils import bucket, bucket_len, bucket_pairs, bucket_positions


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_to(arrs: dict, n_pad: int) -> dict:
    out = {}
    for name, a in arrs.items():
        b = np.zeros((n_pad,) + a.shape[1:], dtype=a.dtype)
        b[:len(a)] = a
        out[name] = b
    return out


# --------------------------------------------------------------- rescore
def make_sharded_rescore(mesh: Mesh, max_len: int):
    """Jitted shard_map of the pair-scoring kernel: pairs shard over dp,
    sequence planes replicated."""
    fn = partial(rescore_pairs_device, max_len=max_len)
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs={k: P("dp") for k in
                   ("score", "qstart", "qend", "tstart", "tend", "aln_len",
                    "id_cnt", "qlen", "tlen")})
    return jax.jit(sharded)


def rescorediagonal_sharded(mesh: Mesh):
    """Returns a drop-in stage fn(seqdb, pref, seq_id_thr, eval_thr,
    aln_len_thr) running the window scans data-parallel over the mesh."""
    d = mesh.devices.size
    cache: dict = {}

    def stage(seqdb, pref, seq_id_thr, eval_thr=0.001, aln_len_thr=0,
              planes=None, lengths=None):
        from ..stages.rescorediagonal import assemble_alndb

        if planes is None:
            planes, lengths = pack_sequences(seqdb, max_len=bucket_len(
                int(seqdb.lengths.max()) if len(seqdb) else 1))
        max_len = planes["code"].shape[1]
        key2id = seqdb.key_to_id()
        n = len(pref.qkey)
        n_pad = bucket(bucket_pairs(n), d)
        rec = _pad_to({
            "qidx": seqdb.lookup_keys(pref.qkey).astype(np.int32),
            "tidx": seqdb.lookup_keys(pref.tkey).astype(np.int32),
            "diag": pref.diag.astype(np.int32),
            "is_rev": (pref.score < 0),
        }, n_pad)
        if max_len not in cache:
            cache[max_len] = make_sharded_rescore(mesh, max_len)
        out = cache[max_len](planes["code"], planes["sym"],
                             lengths.astype(np.int32), rec["qidx"],
                             rec["tidx"], rec["diag"], rec["is_rev"])
        raw = {k: np.asarray(v)[:n] for k, v in out.items()}
        return assemble_alndb(seqdb, pref, raw, seq_id_thr, eval_thr,
                              aln_len_thr)

    return stage


# ------------------------------------------------------------ correction
def make_sharded_correction(mesh: Mesh, max_len: int, total_len: int):
    """Jitted shard_map of the correction kernels: records shard over dp
    and scatter locally; count vectors merge with one psum; positions
    shard over dp for the argmax."""

    def local(sym2, lengths, rec_q, rec_t_row, rec_qstart, rec_tstart,
              rec_alen, rec_is_rev, rec_keep_pre, rec_ry_smin, rec_goffset,
              obs, own_layer, was_ext_pos,
              log_err, log_deam_f, log_deam_r, raw_deam_f):
        counts, rev_counts = correction_scatter(
            sym2, lengths, rec_q, rec_t_row, rec_qstart, rec_tstart,
            rec_alen, rec_is_rev, rec_keep_pre, rec_ry_smin, rec_goffset,
            max_len=max_len, total_len=total_len)
        counts = jax.lax.psum(counts, axis_name="dp")
        rev_counts = jax.lax.psum(rev_counts, axis_name="dp")
        # this device's position slice (positions shard over dp)
        n_loc = obs.shape[0]  # already sharded by shard_map
        i = jax.lax.axis_index("dp")
        sl = jax.lax.dynamic_slice_in_dim(counts.reshape(-1, 44),
                                          i * n_loc, n_loc, axis=0)
        sl_rev = jax.lax.dynamic_slice_in_dim(rev_counts.reshape(-1, 44),
                                              i * n_loc, n_loc, axis=0)
        return correction_argmax(sl, sl_rev, obs, own_layer, was_ext_pos,
                                 log_err, log_deam_f, log_deam_r, raw_deam_f)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp"), P("dp"), P(), P(), P(), P()),
        out_specs=(P("dp"), P("dp")))
    return jax.jit(sharded)


def correction_sharded(mesh: Mesh):
    """Returns a drop-in stage fn(seqdb, aln, damage, corr_reads_ry_seq_id,
    seq_id_thr) with records and positions sharded over the mesh."""
    from ..io.seqdb import SeqDB

    d = mesh.devices.size
    cache: dict = {}

    def stage(seqdb, aln, damage, corr_reads_ry_seq_id, seq_id_thr,
              planes=None, lengths=None):
        if planes is None:
            planes, lengths = pack_sequences(seqdb, max_len=bucket_len(
                int(seqdb.lengths.max()) if len(seqdb) else 1))
        n = len(seqdb)
        max_len = planes["sym"].shape[1]
        total_len = int(seqdb.lengths.sum())
        pad_total = bucket(bucket_positions(total_len), d)

        rec = prepare_correction_inputs(seqdb, aln, n, corr_reads_ry_seq_id,
                                        seq_id_thr)
        nrec = len(rec["rec_q"])
        recp = _pad_to(rec, bucket(bucket_pairs(nrec), d))
        recp["rec_ry_smin"][nrec:] = 1

        offsets = seqdb.offsets.astype(np.int64)
        obs = np.zeros(pad_total, dtype=np.int32)
        obs[:total_len] = CHAR_TO_ACGT[seqdb.data[:total_len]]
        own_layer = np.zeros(pad_total, dtype=np.int32)
        if n:
            own_layer[:total_len] = np.concatenate([
                layer_index(np.arange(int(L)), int(L))
                for L in seqdb.lengths])
        was_ext_pos = np.zeros(pad_total, dtype=bool)
        was_ext_pos[:total_len] = np.repeat(seqdb.ext, seqdb.lengths)

        seq_err = seq_error_profile(0.01)
        log_err = np.log(seq_err).astype(np.float32)
        log_f = np.log(np.maximum(damage.fwd, SMOOTHING_VALUE))
        log_r = np.log(np.maximum(damage.rev, SMOOTHING_VALUE))

        sig = (max_len, pad_total)
        if sig not in cache:
            cache[sig] = make_sharded_correction(mesh, max_len, pad_total)
        corrected, tot = cache[sig](
            planes["sym"], lengths.astype(np.int32),
            recp["rec_q"], recp["rec_t_row"], recp["rec_qstart"],
            recp["rec_tstart"], recp["rec_alen"], recp["rec_is_rev"],
            recp["rec_keep_pre"], recp["rec_ry_smin"], recp["rec_goffset"],
            obs, own_layer, was_ext_pos,
            log_err, log_f, log_r, damage.fwd.astype(np.float32))
        corrected = np.asarray(corrected)[:total_len]
        tot = np.asarray(tot)[:total_len]

        acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
        out_flat = np.where(tot <= 1, seqdb.data[:total_len], acgt[corrected])
        return SeqDB.from_flat(out_flat, seqdb.lengths.copy(),
                               keys=seqdb.keys.copy(), ext=seqdb.ext.copy(),
                               headers=seqdb.headers)

    return stage


def kmer_hash_ranges(n_shards: int):
    """Disjoint 16-bit hash ranges per shard (the reference's MPI split
    scheme, kmermatcher.cpp:636-664; uniform here — the reference sizes
    splits from the measured hash histogram)."""
    edges = np.linspace(0, 65536, n_shards + 1).astype(np.int64)
    return [(int(edges[i]), int(edges[i + 1] - 1)) for i in range(n_shards)]
