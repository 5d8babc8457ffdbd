"""Multi-host distribution of the assembly pipeline.

The reference distributes with MPI over a shared filesystem
(lib/mmseqs/src/commons/MMseqsMPI.{h,cpp}):

* kmermatcher: the 16-bit hash space is split into ranges, ranges are
  assigned round-robin over ranks (kmermatcher.cpp:636-664), every rank
  writes its sorted entry spill files, and rank 0 k-way merges them back
  into one globally sorted stream before the group/scan phase
  (mergeKmerFilesAndOutput, :957) — so the distributed result is
  bit-identical to the single-node run.
* rescorediagonal: record ranges per rank (decomposeDomainByAminoAcid)
  with a rank-0 result merge (rescorediagonal.cpp:400-422).

The TPU-native equivalent keeps the same two axes:

* across *hosts* (DCN): `jax.distributed` process groups; each process
  owns a round-robin subset of hash ranges / record ranges and the merge
  happens on process 0 through the shared filesystem (`shard_dir`),
  preserving the reference's exact merge contract (bit-identical output,
  tested in tests/test_distributed.py);
* across *devices within a host* (ICI): `parallel.mesh` shard_map stages
  (pairs/records data-parallel, coverage psum).

`kmermatcher_sharded` is the single-process form of the same contract
(compute shard entry tables independently, merge, group once) and is the
unit each process executes.
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from ..io.seqdb import SeqDB
from ..kmer.matcher import (BIT63, assign_groups, build_pref_db,
                            extract_selected_kmers_batched)
from .mesh import kmer_hash_ranges


def shards_for_process(n_shards: int, process_id: int,
                       num_processes: int) -> list[int]:
    """Round-robin shard assignment (kmermatcher.cpp:642-651)."""
    return [s for s in range(n_shards) if s % num_processes == process_id]


def extract_shard_entries(seqdb: SeqDB, k: int, kmers_per_sequence: int,
                          kmers_per_sequence_scale: float, hash_shift: int,
                          shard: int, n_shards: int) -> dict:
    """One hash-range shard's selected k-mer entries, pre-sorted by the
    global sort key (the reference's per-split spill file)."""
    lo, hi = kmer_hash_ranges(n_shards)[shard]
    ent = extract_selected_kmers_batched(
        seqdb, k, kmers_per_sequence, kmers_per_sequence_scale, hash_shift,
        hash_range=(lo, hi))
    order = np.lexsort((ent["pos"], ent["id"],
                        -ent["seq_len"].astype(np.int64),
                        ent["kmer"] | BIT63))
    return {k_: v[order] for k_, v in ent.items()}


def merge_shard_entries(shards: list[dict]) -> dict:
    """Merge per-shard sorted entry tables back into one global order
    (mergeKmerFilesAndOutput analogue).  The hash ranges are disjoint but
    not contiguous in k-mer space, so a full merge by the global key is
    required; the merged multiset equals the single-shard table, making
    the downstream group/scan output bit-identical."""
    cat = {k: np.concatenate([s[k] for s in shards]) for k in shards[0]}
    order = np.lexsort((cat["pos"], cat["id"],
                        -cat["seq_len"].astype(np.int64),
                        cat["kmer"] | BIT63))
    return {k: v[order] for k, v in cat.items()}


def kmermatcher_sharded(seqdb: SeqDB, k: int, kmers_per_sequence: int,
                        kmers_per_sequence_scale: float,
                        include_only_extendable: bool, hash_shift: int = 67,
                        n_shards: int = 4, cov_mode: int = 0,
                        cov_thr: float = 0.0):
    """Hash-range-sharded kmermatcher: per-shard extraction + sort, one
    merge, one group/scan.  Bit-identical to the unsharded stage."""
    shards = [extract_shard_entries(seqdb, k, kmers_per_sequence,
                                    kmers_per_sequence_scale, hash_shift,
                                    s, n_shards)
              for s in range(n_shards)]
    ent = merge_shard_entries(shards)
    centre_id, centre_fwd, member_id, diagonal, _ = assign_groups(
        ent["kmer"], ent["id"], ent["pos"], ent["seq_len"],
        include_only_extendable, cov_mode, cov_thr)
    return build_pref_db(seqdb, centre_id, centre_fwd, member_id, diagonal)


# ---------------------------------------------------------------- processes
def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: int | None = None) -> None:
    """jax.distributed process-group init (the MMseqsMPI::init analogue).

    On CPU test rigs pass local_device_count to give each process its own
    virtual devices; on real TPU pods jax discovers topology itself."""
    import jax

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{local_device_count}").strip()
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


N_KRANGES = 64     # kmer-value ranges (phase A -> B routing)
N_CBUCKETS = 128   # centre-id buckets (phase B -> C routing)
_ENT_FIELDS = ("kmer", "id", "pos", "seq_len")

# Cumulative spill traffic (bytes written + bytes read through the
# exchange files) for the SCALING artifacts' bytes-per-iteration metric.
SPILL_BYTES = {"write": 0, "read": 0}


def _dump(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(obj, fh, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def _load(path: str):
    with open(path, "rb") as fh:
        return pickle.load(fh)


# ---- flat binary spill files (the reference's raw sorted spill files,
# kmermatcher.cpp:622-706: plain struct streams, no serialisation layer).
# One file per (rank, field) holding that rank's entries/pairs sorted by
# partition id, plus one small .npy of partition boundaries; readers
# np.memmap the span they own — no pickle deserialisation copies and no
# per-(partition, rank) file explosion.
def _spill_flat(dirpath: str, name: str, rank: int, bounds: np.ndarray,
                **fields) -> None:
    np.save(os.path.join(dirpath, f"{name}_{rank}_bounds.npy"),
            np.asarray(bounds, dtype=np.int64))
    for f, a in fields.items():
        a = np.ascontiguousarray(a)
        a.tofile(os.path.join(dirpath, f"{name}_{rank}_{f}.bin"))
        SPILL_BYTES["write"] += a.nbytes


def _spill_bounds(dirpath: str, name: str, rank: int) -> np.ndarray:
    return np.load(os.path.join(dirpath, f"{name}_{rank}_bounds.npy"))


def _spill_map(dirpath: str, name: str, rank: int, field: str,
               dtype) -> np.ndarray:
    path = os.path.join(dirpath, f"{name}_{rank}_{field}.bin")
    if os.path.getsize(path) == 0:
        return np.zeros(0, dtype=dtype)
    return np.memmap(path, dtype=dtype, mode="r")


def _gather_spans(maps: list[np.ndarray], bounds: list[np.ndarray],
                  parts: range, out_dtype) -> np.ndarray:
    """Concatenate spans in (partition, source-rank) interleave order —
    the order that reproduces the single-process stream exactly (within a
    partition, source ranks own ascending sequence ranges)."""
    total = sum(int(b[parts.stop] - b[parts.start]) for b in bounds)
    out = np.empty(total, dtype=out_dtype)
    o = 0
    for p in parts:
        for m, b in zip(maps, bounds):
            lo, hi = int(b[p]), int(b[p + 1])
            out[o:o + hi - lo] = m[lo:hi]
            SPILL_BYTES["read"] += m[lo:hi].nbytes
            o += hi - lo
    return out


def _contiguous_partition(counts: np.ndarray, world: int) -> list[int]:
    """Deterministic contiguous split of len(counts) slots into `world`
    parts balanced by cumulative count; returns boundary slot indices
    (len world+1)."""
    cum = np.concatenate([[0], np.cumsum(counts.astype(np.float64))])
    total = cum[-1]
    bounds = [0]
    for r in range(1, world):
        bounds.append(int(np.searchsorted(cum, total * r / world)))
    bounds.append(len(counts))
    for r in range(1, world + 1):   # keep boundaries monotone
        if bounds[r] < bounds[r - 1]:
            bounds[r] = bounds[r - 1]
    return bounds


def process_kmermatcher(seqdb: SeqDB, params_tuple, shard_dir: str,
                        process_id: int, num_processes: int,
                        n_shards: int = 0, barrier=None,
                        local: bool = False):
    """Fully distributed kmermatcher (no rank-0 serial phase):

    * phase A: each rank extracts ITS OWN sequence range (equal residue
      split) and spills the entries partitioned into N_KRANGES
      contiguous k-mer value ranges — the reference's hash-space splits
      (kmermatcher.cpp:636-664) re-cut so the pair-emission order stays
      reproducible.  Spills are flat binary field files (the reference's
      raw struct spill format, kmermatcher.cpp:622-706): kmer u64 +
      id u32 + pos u32 = 16 B/entry (seq_len re-derives from the global
      lengths array on read);
    * phase B: ranks take contiguous k-mer ranges balanced by entry
      count, memmap + gather their spans in (range, source-rank) order —
      which reproduces the single-process entry order exactly, because
      source ranks own ascending sequence ranges — run the native
      group-walk pair emission, and spill pairs into N_CBUCKETS
      contiguous centre-id buckets (pk1 u64 + pk2 u32 + fwd u8);
    * phase C: ranks take contiguous centre buckets balanced by pair
      count, gather spans in (bucket, source-rank) order, and run the
      native stable pair-sort + result scan over their centre span.

    With `local=True` (the pipeline's mode) each rank returns ONLY its
    own centre span as `(PrefDB, (qlo, qhi))` — the downstream rescore /
    correction / extension stages are per-query, so they consume the
    local slice directly and nothing else ever crosses ranks (the old
    design spilled the full scan and had every rank assemble the full
    PrefDB: world x the result bytes through the page cache for data
    the other ranks never used).  With local=False every rank assembles
    and returns the identical full PrefDB (kept for the standalone
    stage API and tests).

    Bit-identical to the single-process stage (the concatenation of the
    local slices equals the full PrefDB up to empty-group placement,
    and every per-query group is exact).  `barrier` blocks until all
    ranks arrive."""
    from .. import native
    from ..kmer.matcher import _pref_from_scan, pref_from_entries

    k, kps, scale, ioe, hash_shift = params_tuple
    os.makedirs(shard_dir, exist_ok=True)
    world = num_processes
    n_seq = len(seqdb)
    if native.get_lib() is None or world <= 1:
        # fallback: single-rank semantics (rank 0 computes, all return)
        if process_id == 0:
            ent = extract_selected_kmers_batched(seqdb, k, kps, scale,
                                                 hash_shift)
            pref = pref_from_entries(seqdb, ent, ioe)
            from ..aligndb import PrefDB
            pref.save(os.path.join(shard_dir, "pref"))
        if barrier is not None:
            barrier()
        if process_id != 0:
            from ..aligndb import PrefDB
            pref = PrefDB.load(os.path.join(shard_dir, "pref"))
        return (pref, (0, n_seq)) if local else pref

    # ---- phase A: extract own sequence range, spill by k-mer range ----
    from ..utils import subtimer
    _stA = subtimer("km.phaseA"); _stA.__enter__()
    seq_bounds = _contiguous_partition(seqdb.lengths, world)
    lo, hi = seq_bounds[process_id], seq_bounds[process_id + 1]
    sub_db = SeqDB(seqdb.data, seqdb.offsets[lo:hi], seqdb.lengths[lo:hi],
                   seqdb.keys[lo:hi], seqdb.ext[lo:hi], None,
                   seqdb.dbtype) if hi > lo else None
    if sub_db is not None and len(sub_db):
        ent = extract_selected_kmers_batched(sub_db, k, kps, scale,
                                             hash_shift)
        ent["id"] = ent["id"] + lo
    else:
        ent = {f: np.zeros(0, dtype=np.uint64 if f == "kmer" else
                           np.int64 if f == "id" else np.int32)
               for f in _ENT_FIELDS}
    # k-mer range id from the top bits of the 2k-bit canonical value
    # (bit 63 is the strand flag; the payload is only 2k bits wide)
    shift = max(0, 2 * k - 6)
    kr = (np.asarray(ent["kmer"], dtype=np.uint64)
          & np.uint64((1 << 63) - 1)) >> np.uint64(shift)
    kr = np.minimum(kr, N_KRANGES - 1)
    order = np.argsort(kr, kind="stable")
    kr_sorted = kr[order]
    bounds = np.searchsorted(kr_sorted, np.arange(N_KRANGES + 1))
    _spill_flat(shard_dir, "entA", process_id, bounds,
                kmer=ent["kmer"][order],
                id=ent["id"][order].astype(np.uint32),
                pos=ent["pos"][order].astype(np.uint32))
    del ent, kr, order, kr_sorted
    _stA.__exit__()
    with subtimer("km.barrierA"):
        barrier()
    _stB = subtimer("km.phaseB"); _stB.__enter__()

    # ---- phase B: pair emission over contiguous k-mer ranges ----------
    a_bounds = [_spill_bounds(shard_dir, "entA", src)
                for src in range(world)]
    totals = np.sum([np.diff(b) for b in a_bounds], axis=0)
    kbounds = _contiguous_partition(totals, world)
    my_ranges = range(kbounds[process_id], kbounds[process_id + 1])
    ids64 = _gather_spans(
        [_spill_map(shard_dir, "entA", src, "id", np.uint32)
         for src in range(world)], a_bounds, my_ranges, np.int64)
    ent_b = {
        "kmer": _gather_spans(
            [_spill_map(shard_dir, "entA", src, "kmer", np.uint64)
             for src in range(world)], a_bounds, my_ranges, np.uint64),
        "id": ids64,
        "pos": _gather_spans(
            [_spill_map(shard_dir, "entA", src, "pos", np.uint32)
             for src in range(world)], a_bounds, my_ranges, np.int32),
        "seq_len": seqdb.lengths[ids64].astype(np.int32),
    }
    pk1, pk2, fwd = native.kmer_emit_pairs(ent_b, ioe)
    del ent_b, ids64
    # centre buckets (contiguous id ranges)
    per = max(1, -(-n_seq // N_CBUCKETS))
    cb = (pk1 >> np.uint64(32)).astype(np.int64) // per
    orderp = np.argsort(cb, kind="stable")
    cb_sorted = cb[orderp]
    pb = np.searchsorted(cb_sorted, np.arange(N_CBUCKETS + 1))
    _spill_flat(shard_dir, "pairB", process_id, pb,
                pk1=pk1[orderp], pk2=pk2[orderp], fwd=fwd[orderp])
    del pk1, pk2, fwd, cb, orderp, cb_sorted
    _stB.__exit__()
    with subtimer("km.barrierB"):
        barrier()
    _stC = subtimer("km.phaseC"); _stC.__enter__()

    # ---- phase C: stable pair sort + result scan per centre span ------
    b_bounds = [_spill_bounds(shard_dir, "pairB", src)
                for src in range(world)]
    ptotals = np.sum([np.diff(b) for b in b_bounds], axis=0)
    cbounds = _contiguous_partition(ptotals, world)
    my_buckets = range(cbounds[process_id], cbounds[process_id + 1])
    p1 = _gather_spans([_spill_map(shard_dir, "pairB", src, "pk1",
                                   np.uint64) for src in range(world)],
                       b_bounds, my_buckets, np.uint64)
    p2 = _gather_spans([_spill_map(shard_dir, "pairB", src, "pk2",
                                   np.uint32) for src in range(world)],
                       b_bounds, my_buckets, np.uint32)
    fw = _gather_spans([_spill_map(shard_dir, "pairB", src, "fwd",
                                   np.uint8) for src in range(world)],
                       b_bounds, my_buckets, np.uint8)
    if len(p1):
        scan = native.kmer_pairs_to_pref(p1, p2, fw, seqdb.keys)
    else:
        scan = (np.zeros(0, np.uint32), np.zeros(0, np.uint32),
                np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.int64), np.zeros(0, np.int64))
    del p1, p2, fw
    qlo = min(n_seq, cbounds[process_id] * per)
    qhi = min(n_seq, cbounds[process_id + 1] * per)
    if local:
        # each rank keeps only its centre span; downstream stages are
        # per-query, so nothing more ever crosses ranks
        out = _pref_from_scan(seqdb, scan, row_range=(qlo, qhi))
        _stC.__exit__()
        return out, (qlo, qhi)
    _dump(os.path.join(shard_dir, f"scanC_{process_id}.pkl"), scan)
    _stC.__exit__()
    with subtimer("km.barrierC"):
        barrier()
    _stD = subtimer("km.assemble"); _stD.__enter__()

    # ---- assemble the full PrefDB on every rank -----------------------
    qk, tk, sc, dg, grs, gc = [], [], [], [], [], []
    row_off = 0
    for src in range(world):
        s = _load(os.path.join(shard_dir, f"scanC_{src}.pkl"))
        qk.append(s[0])
        tk.append(s[1])
        sc.append(s[2])
        dg.append(s[3])
        grs.append(s[4] + row_off)
        gc.append(s[5])
        row_off += len(s[0])
    merged = (np.concatenate(qk), np.concatenate(tk), np.concatenate(sc),
              np.concatenate(dg), np.concatenate(grs).astype(np.int64),
              np.concatenate(gc).astype(np.int64))
    out = _pref_from_scan(seqdb, merged)
    _stD.__exit__()
    return out


def psum_barrier() -> None:
    """Cross-process barrier via one global psum over the process group."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("carpedeam_barrier")


def decompose_by_residue_count(lengths: np.ndarray,
                               num_processes: int) -> list[tuple[int, int]]:
    """Util::decomposeDomainByAminoAcid analogue: split the query index
    range into `num_processes` contiguous chunks of roughly equal total
    residue count (rescorediagonal.cpp:400-422's domain decomposition)."""
    total = int(lengths.sum())
    target = total / max(num_processes, 1)
    bounds = []
    start = 0
    acc = 0
    for i, L in enumerate(lengths):
        acc += int(L)
        if acc >= target * (len(bounds) + 1) and len(bounds) < num_processes - 1:
            bounds.append((start, i + 1))
            start = i + 1
    bounds.append((start, len(lengths)))
    while len(bounds) < num_processes:
        bounds.append((len(lengths), len(lengths)))
    return bounds


def rescorediagonal_range(seqdb: SeqDB, pref, seq_id_thr: float,
                          q_range: tuple[int, int], eval_thr: float = 0.001,
                          aln_len_thr: int = 0):
    """Rescore only the prefilter records of queries [q_range) — one
    process's share.  Per-query work is independent, so concatenating the
    per-range results in range order is bit-identical to the full run
    (the reference's rank-0 DBWriter::mergeResults contract)."""
    from ..aligndb import PrefDB
    from ..stages.rescorediagonal import rescorediagonal

    lo, hi = q_range
    s, e = int(pref.starts[lo]), int(pref.starts[hi])
    sub = PrefDB(qkey=pref.qkey[s:e], tkey=pref.tkey[s:e],
                 score=pref.score[s:e], diag=pref.diag[s:e],
                 starts=pref.starts[lo:hi + 1] - pref.starts[lo],
                 qkeys=pref.qkeys[lo:hi],
                 qext=pref.qext[lo:hi] if pref.qext is not None else None)
    return rescorediagonal(seqdb, sub, seq_id_thr, eval_thr, aln_len_thr)


def merge_aln_ranges(parts: list):
    """Concatenate per-range alignment DBs in range order."""
    from ..aligndb import ALN_FIELDS, AlnDB

    qkey = np.concatenate([p.qkey for p in parts])
    cols = {name: np.concatenate([p.cols[name] for p in parts])
            for name, _ in ALN_FIELDS}
    starts = [np.zeros(1, dtype=np.int64)]
    off = 0
    for p in parts:
        starts.append(p.starts[1:] + off)
        off += int(p.starts[-1])
    return AlnDB(qkey, cols, np.concatenate(starts),
                 np.concatenate([p.qkeys for p in parts]))
