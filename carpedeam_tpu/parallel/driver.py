"""Pipeline-level multi-process distribution (the `--mpi-runner` role).

The reference drives the whole binary under mpirun
(lib/mmseqs/src/commons/Parameters.cpp:150 RUNNER); the two stages with
MPI hooks split their work by rank — kmermatcher by 16-bit hash ranges
(kmermatcher.cpp:636-664) and rescorediagonal by query record ranges
(rescorediagonal.cpp:400-422) — with rank 0 merging results through the
shared filesystem; every other stage's output is produced once and
shared.  This module is the jax.distributed equivalent: every process
runs `ancient_assemble` with the same arguments plus
CARPEDEAM_RANK/CARPEDEAM_WORLD (+ CARPEDEAM_COORD host:port), the
sharded stages split exactly like the reference, and non-zero ranks
resume each iteration from rank 0's stage checkpoints.  The distributed
output is bit-identical to the single-process run
(tests/test_distributed.py::test_two_process_pipeline).
"""
from __future__ import annotations

import os
import pickle
import time

import numpy as np

from . import distributed as D


class DistContext:
    """Process-group context for the distributed pipeline.

    `barrier()` blocks until every rank arrives.  With a coordinator the
    barrier is jax.distributed's global device sync; without one (single
    host, plain multi-process launch) a shared-filesystem counter
    barrier in `shard_dir` is used.
    """

    def __init__(self, rank: int, world: int, shard_dir: str,
                 use_jax: bool = False):
        self.rank = rank
        self.world = world
        self.shard_dir = shard_dir
        self._use_jax = use_jax
        self._epoch = 0
        os.makedirs(shard_dir, exist_ok=True)

    @classmethod
    def from_env(cls, shard_dir: str) -> "DistContext | None":
        world = int(os.environ.get("CARPEDEAM_WORLD", "1"))
        if world <= 1:
            return None
        rank = int(os.environ.get("CARPEDEAM_RANK", "0"))
        coord = os.environ.get("CARPEDEAM_COORD")
        if coord:
            D.initialize(coord, world, rank)
            return cls(rank, world, shard_dir, use_jax=True)
        return cls(rank, world, shard_dir, use_jax=False)

    def barrier(self, timeout: float = 600.0) -> None:
        if self._use_jax:
            D.psum_barrier()
            return
        # shared-filesystem counter barrier (one marker per rank/epoch)
        self._epoch += 1
        me = os.path.join(self.shard_dir,
                          f"barrier_{self._epoch}.{self.rank}")
        with open(me, "w"):
            pass
        deadline = time.monotonic() + timeout
        while True:
            n = sum(os.path.exists(os.path.join(
                self.shard_dir, f"barrier_{self._epoch}.{r}"))
                for r in range(self.world))
            if n == self.world:
                return
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"rank {self.rank}: barrier {self._epoch} timed out "
                    f"({n}/{self.world})")
            time.sleep(0.02)


def dist_kmermatcher(dist: DistContext, seqdb, k: int, kps: int,
                     scale: float, only_ext: bool, hash_shift: int,
                     step: int, n_shards: int | None = None):
    """Distributed kmermatcher: hash-range shards round-robin over
    ranks, spill to the shared dir, rank 0 merges + groups/scans, every
    rank loads the resulting PrefDB (all ranks need it for the rescore
    range split)."""
    from ..aligndb import PrefDB

    from ..utils import subtimer
    sub = os.path.join(dist.shard_dir, f"km_{step}")
    with subtimer("dist.km_process"):
        # fully distributed three-phase kmermatcher; every rank returns
        # the identical full PrefDB (no rank-0 merge bottleneck)
        pref = D.process_kmermatcher(seqdb, (k, kps, scale, only_ext,
                                             hash_shift), sub,
                                     dist.rank, dist.world,
                                     barrier=dist.barrier)
    return pref


def dist_rescorediagonal(dist: DistContext, seqdb, pref, seq_id_thr,
                         eval_thr, aln_len_thr, step: int):
    """Distributed rescorediagonal: query ranges of ~equal residue
    count per rank (Util::decomposeDomainByAminoAcid), spill, rank-0
    merge in range order — bit-identical to the full run.  Returns the
    merged AlnDB on rank 0, None elsewhere."""
    # balance by candidate-pair count per query (the stage cost), not
    # query residues — prefilter hits are far from uniform per query
    counts = (pref.starts[1:] - pref.starts[:-1]).astype(np.int64)
    ranges = D.decompose_by_residue_count(counts, dist.world)
    sub = os.path.join(dist.shard_dir, f"aln_{step}")
    os.makedirs(sub, exist_ok=True)
    lo, hi = ranges[dist.rank]
    from ..utils import subtimer
    with subtimer("dist.rescore_range"):
        if lo < hi:
            part = D.rescorediagonal_range(seqdb, pref, seq_id_thr,
                                           (lo, hi), eval_thr, aln_len_thr)
            tmp = os.path.join(sub, f"part_{dist.rank}.pkl.tmp")
            with open(tmp, "wb") as fh:
                pickle.dump(part, fh)
            os.replace(tmp, os.path.join(sub, f"part_{dist.rank}.pkl"))
    with subtimer("dist.rescore_barrier"):
        dist.barrier()
    with subtimer("dist.rescore_merge"):
        # EVERY rank merges the spilled parts itself (the merge is a
        # cheap deterministic concat; duplicating it in parallel beats
        # the old rank-0-merge + full-AlnDB save/reload round trip)
        parts = []
        for r in range(dist.world):
            p = os.path.join(sub, f"part_{r}.pkl")
            if os.path.exists(p):
                with open(p, "rb") as fh:
                    parts.append(pickle.load(fh))
        return D.merge_aln_ranges(parts)


def dist_broadcast_aln(dist: DistContext, aln, step: int):
    """Every rank already holds the merged AlnDB (dist_rescorediagonal
    merges the spilled parts on all ranks); kept for the pipeline's
    call shape."""
    return aln


def dist_apply_by_query_range(dist: DistContext, step: int, tag: str,
                              seqdb, aln, apply_fn):
    """Distribute a per-query SeqDB -> SeqDB stage (correction,
    read_assembly, contig_merge: each query's output depends only on its
    own alignment group + the FULL input DB) across ranks:

      * query groups split into ~equal-residue ranges
        (Util::decomposeDomainByAminoAcid, the reference's MPI split);
      * each rank runs the stage on its group slice (queries outside the
        slice pass through untouched) and spills only the rows whose
        bytes/ext actually changed;
      * every rank assembles the identical merged result (rank-order
        deterministic; ranges are disjoint so no row conflicts).
    """
    key2id = seqdb.key_to_id()
    qrows = np.array([key2id[int(kk)] for kk in aln.qkeys], dtype=np.int64)
    # balance by alignment-record count per query group (the dominant
    # per-query cost in correction/extension/merging), not residues
    counts = (aln.starts[1:] - aln.starts[:-1]).astype(np.int64) + 1
    ranges = D.decompose_by_residue_count(counts, dist.world)
    sub = os.path.join(dist.shard_dir, f"{tag}_{step}")
    os.makedirs(sub, exist_ok=True)
    lo, hi = ranges[dist.rank]
    changed: dict[int, tuple[bytes, bool]] = {}
    from ..utils import subtimer
    _st = subtimer(f"dist.apply_{tag}")
    _st.__enter__()
    if lo < hi:
        out = apply_fn(seqdb, aln.slice_queries(lo, hi))
        for r in qrows[lo:hi]:
            r = int(r)
            nb = bytes(out.seq_bytes(r))
            ne = bool(out.ext[r])
            if nb != bytes(seqdb.seq_bytes(r)) or ne != bool(seqdb.ext[r]):
                changed[r] = (nb, ne)
    tmp = os.path.join(sub, f"part_{dist.rank}.pkl.tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(changed, fh)
    os.replace(tmp, os.path.join(sub, f"part_{dist.rank}.pkl"))
    _st.__exit__()
    with subtimer(f"dist.apply_{tag}_barrier"):
        dist.barrier()
    merged: dict[int, tuple[bytes, bool]] = {}
    for r in range(dist.world):
        with open(os.path.join(sub, f"part_{r}.pkl"), "rb") as fh:
            merged.update(pickle.load(fh))
    if not merged:
        return seqdb
    from ..io.seqdb import SeqDB
    n = len(seqdb)
    new_lengths = seqdb.lengths.astype(np.int64).copy()
    new_ext = seqdb.ext.copy()
    parts = []
    prev = 0
    total_in = int(seqdb.offsets[-1] + seqdb.lengths[-1]) if n else 0
    for i in sorted(merged):
        o = int(seqdb.offsets[i])
        if o > prev:
            parts.append(seqdb.data[prev:o])
        nb, ne = merged[i]
        rec = np.frombuffer(nb, dtype=np.uint8)
        parts.append(rec)
        new_lengths[i] = len(rec)
        new_ext[i] = ne
        prev = o + int(seqdb.lengths[i])
    if total_in > prev:
        parts.append(seqdb.data[prev:total_in])
    new_data = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    new_offsets = np.concatenate([[0], np.cumsum(new_lengths[:-1])]) \
        .astype(np.int64)
    return SeqDB(new_data, new_offsets, new_lengths, seqdb.keys.copy(),
                 new_ext, seqdb.headers, seqdb.dbtype)
