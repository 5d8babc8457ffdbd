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
    """Distributed kmermatcher, range-local: each rank computes and
    KEEPS only its own centre span of the prefilter result (the
    downstream per-query stages consume exactly that span, so no rank
    ever materialises the full PrefDB).  Returns (pref_local,
    (qlo, qhi))."""
    from ..utils import subtimer
    sub = os.path.join(dist.shard_dir, f"km_{step}")
    with subtimer("dist.km_process"):
        pref, qrange = D.process_kmermatcher(
            seqdb, (k, kps, scale, only_ext, hash_shift), sub,
            dist.rank, dist.world, barrier=dist.barrier, local=True)
    return pref, qrange


def dist_rescorediagonal(dist: DistContext, seqdb, pref_local, seq_id_thr,
                         eval_thr, aln_len_thr, step: int):
    """Range-local rescorediagonal: the rank's prefilter slice rescored
    in memory — per-query work is independent, so no exchange, no spill,
    no merge (the old design pickled full AlnDBs through the shared
    filesystem on every rank).  Returns the LOCAL AlnDB slice."""
    from ..stages.rescorediagonal import rescorediagonal
    from ..utils import subtimer
    with subtimer("dist.rescore_range"):
        return rescorediagonal(seqdb, pref_local, seq_id_thr, eval_thr,
                               aln_len_thr)


def dist_apply_by_query_range(dist: DistContext, step: int, tag: str,
                              seqdb, aln, apply_fn, local: bool = False):
    """Distribute a per-query SeqDB -> SeqDB stage (correction,
    read_assembly, contig_merge: each query's output depends only on its
    own alignment group + the FULL input DB) across ranks:

      * query groups split into ~equal-residue ranges
        (Util::decomposeDomainByAminoAcid, the reference's MPI split) —
        or, with `local=True`, `aln` is already this rank's own slice
        (the range-local pipeline) and is consumed whole;
      * each rank runs the stage on its group slice (queries outside the
        slice pass through untouched) and spills only the rows whose
        bytes/ext actually changed;
      * every rank assembles the identical merged result (rank-order
        deterministic; ranges are disjoint so no row conflicts).
    """
    key2id = seqdb.key_to_id()
    qrows = np.array([key2id[int(kk)] for kk in aln.qkeys], dtype=np.int64)
    if local:
        lo, hi = 0, len(aln.qkeys)
    else:
        # balance by alignment-record count per query group (the dominant
        # per-query cost in correction/extension/merging), not residues
        counts = (aln.starts[1:] - aln.starts[:-1]).astype(np.int64) + 1
        ranges = D.decompose_by_residue_count(counts, dist.world)
        lo, hi = ranges[dist.rank]
    sub = os.path.join(dist.shard_dir, f"{tag}_{step}")
    os.makedirs(sub, exist_ok=True)
    changed: dict[int, tuple[bytes, bool]] = {}
    from ..utils import subtimer
    _st = subtimer(f"dist.apply_{tag}")
    _st.__enter__()
    if lo < hi:
        out = apply_fn(seqdb, aln if local
                       else aln.slice_queries(lo, hi))
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
