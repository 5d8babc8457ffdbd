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


def process_kmermatcher(seqdb: SeqDB, params_tuple, shard_dir: str,
                        process_id: int, num_processes: int,
                        n_shards: int, barrier=None):
    """Per-process kmermatcher step: ONE extraction pass per rank
    partitioned into this rank's hash-range shards (raw, unsorted),
    spill to the shared filesystem, and on process 0 a concat + the
    fused native sort/group/scan (kmer.matcher.pref_from_entries).

    The merged multiset equals the single-shard entry table, so the
    result is bit-identical to the single-process stage regardless of
    spill order.  Returns the PrefDB on process 0, None elsewhere.
    `barrier` is any callable that blocks until all processes reach it
    (on a jax.distributed process group use psum_barrier)."""
    from ..kmer.matcher import pref_from_entries

    k, kps, scale, ioe, hash_shift = params_tuple
    os.makedirs(shard_dir, exist_ok=True)
    mine = shards_for_process(n_shards, process_id, num_processes)
    if mine:
        ent = extract_selected_kmers_batched(seqdb, k, kps, scale,
                                             hash_shift)
        ranges = kmer_hash_ranges(n_shards)
        for s in mine:
            lo, hi = ranges[s]
            m = (ent["h16"] >= lo) & (ent["h16"] <= hi)
            sub = {k_: v[m] for k_, v in ent.items()}
            tmp = os.path.join(shard_dir, f"split_{s}.pkl.tmp")
            with open(tmp, "wb") as fh:
                pickle.dump(sub, fh)
            os.replace(tmp, os.path.join(shard_dir, f"split_{s}.pkl"))
    if barrier is not None:
        barrier()
    if process_id != 0:
        return None
    shards = []
    for s in range(n_shards):
        with open(os.path.join(shard_dir, f"split_{s}.pkl"), "rb") as fh:
            shards.append(pickle.load(fh))
    ent = {k_: np.concatenate([sh[k_] for sh in shards])
           for k_ in shards[0]}
    return pref_from_entries(seqdb, ent, ioe)


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
