"""Assembly pipeline drivers: nuclassemble and ancient_assemble.

Python re-design of the reference's shell-script orchestration
(data/nuclassemble.sh, data/guidedNuclAssemble.sh): the same iterative
loop, with on-disk stage checkpoints (.done-file contract) so interrupted
runs resume at stage granularity.

ancient_assemble == guidedNuclAssemble: mergereads/createdb -> nuclassemble
(N iterations: read phase then contig phase with cycle detection) ->
linclust redundancy reduction -> result2repseq -> headers -> FASTA.
"""
from __future__ import annotations

import os

import numpy as np

from .aligndb import AlnDB, PrefDB
from .damage import DamageModel
from .io.seqdb import SeqDB
from .kmer.matcher import kmermatcher
from .params import Params
from .stages.contig_merge import contig_merge
from .stages.correction import correction
from .stages.cyclecheck import cyclecheck
from .stages.read_assembly import read_assembly
from .stages.rescorediagonal import rescorediagonal


class Checkpointer:
    """Stage-granular checkpoints: each stage saves under tmp/<name> and a
    <name>.done marker (the reference's notExists/.done contract)."""

    def __init__(self, tmp_dir: str | None):
        self.tmp = tmp_dir
        if tmp_dir:
            os.makedirs(tmp_dir, exist_ok=True)

    def path(self, name):
        return os.path.join(self.tmp, name) if self.tmp else None

    def done(self, name):
        return self.tmp and os.path.exists(self.path(name) + ".done")

    def mark(self, name):
        if self.tmp:
            with open(self.path(name) + ".done", "w"):
                pass

    def run(self, name, fn, loader, saver):
        """Run `fn` unless checkpointed; (loader/saver)(prefix)."""
        if self.done(name):
            return loader(self.path(name))
        result = fn()
        if self.tmp:
            saver(result, self.path(name))
            self.mark(name)
        return result


def _pick_stage_impls(params: Params):
    """Choose host-oracle, device-kernel or mesh-sharded implementations
    for the batched stages (all bit-identical; accelerator paths pay
    per-shape compilation, amortised by shape bucketing).

    use_device: "0" host, "1" single device (XLA kernels), "pallas"
    single device with the Pallas rescoring kernel (TPU-optimal: the
    window extraction runs as vectorised lane rotations instead of XLA
    gathers), "mesh" shard_map over all local devices, "auto" = "pallas"
    on TPU, "1" on other accelerators (the Pallas kernels use pltpu
    memory spaces and only run interpreted on CPU), else "0".

    Returns (kmermatcher_fn, rescore_fn, correction_fn, wants_planes).
    The device kmermatcher (ops/kmer_tpu.py) joins the device paths
    under `kmer_device` ("auto": device on TPU backends when the
    workload is large enough that the measured device win beats the
    per-dispatch tunnel overhead; see CARPEDEAM_KMER_DEVICE)."""
    use = params.use_device
    if use == "auto":
        from .utils import device_is_accelerator, device_is_tpu
        use = ("pallas" if device_is_tpu()
               else "1" if device_is_accelerator() else "0")
    km = _pick_kmermatcher(use, params)
    if use == "mesh":
        import jax

        from .parallel.mesh import (correction_sharded, make_mesh,
                                    rescorediagonal_sharded)
        mesh = make_mesh(len(jax.devices()))
        return (km, rescorediagonal_sharded(mesh), correction_sharded(mesh),
                False)
    if use == "pallas":
        from .ops.correction_pallas import correction_pallas
        from .ops.rescore_pallas import rescorediagonal_pallas
        return km, rescorediagonal_pallas, correction_pallas, True
    if use == "1":
        from .ops.correction_tpu import correction_tpu
        from .ops.rescore_tpu import rescorediagonal_tpu
        return km, rescorediagonal_tpu, correction_tpu, True
    return km, rescorediagonal, correction, False


def _pick_kmermatcher(use: str, params: Params):
    """kmermatcher routing.  The device implementation (ops/kmer_tpu.py)
    is bit-identical and fully wired, but kmermatcher is SORT-bound and
    a v5e's sort/gather throughput loses to the native host path at
    every measured size (120k reads: 5.0s device vs 1.5s host; 1M:
    66s vs 21s — XLA:TPU 1D gathers run ~60M elem/s), so "auto" keeps
    the host path and CARPEDEAM_KMER_DEVICE=1 opts in.  The dense
    likelihood stages are where the TPU wins; see BENCH notes."""
    mode = os.environ.get("CARPEDEAM_KMER_DEVICE", "auto")
    # --split-memory-limit caps the extraction working set like the
    # reference caps its k-mer array splits (kmermatcher.cpp:615-624);
    # ~50 bytes of temporary window state per residue per block
    from .params import parse_byte_size
    limit = parse_byte_size(params.split_memory_limit) or 0
    mbr = max(limit // 50, 1 << 20) if limit else None

    def km(seqdb, k, kps, scale, only_ext, hash_shift=67,
           cov_mode=0, cov_thr=0.0):
        from .utils import device_is_tpu
        dev = mode == "1" and device_is_tpu()
        if dev:
            from .ops.kmer_tpu import kmermatcher_device
            try:
                return kmermatcher_device(seqdb, k, kps, scale, only_ext,
                                          hash_shift, cov_mode, cov_thr)
            except ValueError:
                pass        # packing budget exceeded: host path below
        return kmermatcher(seqdb, k, kps, scale, only_ext, hash_shift,
                           cov_mode, cov_thr, max_block_residues=mbr)
    return km


def nuclassemble(reads: SeqDB, params: Params, damage: DamageModel,
                 tmp_dir: str | None = None, progress=None, dist=None):
    """The inner assembly loop (data/nuclassemble.sh:97-233).

    Returns (result SeqDB, cycle_all keys set, source SeqDB).

    `dist` (parallel.driver.DistContext) runs the loop across a process
    group: kmermatcher splits by hash ranges, rescorediagonal by query
    record ranges, and correction / extension / contig merging by
    query-group ranges (each query's output depends only on its own
    alignment group), exactly like the reference's MPI hooks; every
    rank assembles the identical merged DB after each stage (requires
    a shared `tmp_dir`).  Bit-identical to the single-process run.
    """
    if dist is not None and not tmp_dir:
        raise ValueError("distributed mode requires a shared tmp_dir")
    if tmp_dir:
        # key the checkpoint dir by the parameter + input fingerprint
        # (par.hashParameter, GuidedNuclassembler.cpp:106-110): re-running
        # with ANY changed flag or different input lands in a fresh
        # subdirectory and can never resume stale stage results
        tmp_dir = os.path.join(
            tmp_dir, "p" + params.hash(len(reads),
                                       int(reads.lengths.sum())))
    ck = Checkpointer(tmp_dir)
    log = progress or (lambda *_: None)
    kmermatcher_fn, rescore_fn, correction_fn, wants_planes = \
        _pick_stage_impls(params)

    def _planes_prefetch(db):
        """Start the per-iteration plane pack + H2D before the (host)
        kmermatcher runs; the tunnel transfer overlaps the k-mer scan
        and `_shared_from` below collects the finished planes."""
        if not wants_planes or not len(db):
            return None
        from .ops.rescore_tpu import PlanesPrefetch
        from .utils import bucket_len
        # plane width is capped at 512: the short-read bulk stays device-
        # resident in every phase; stages route records touching longer
        # sequences to wider per-bucket planes or the host oracles
        max_len = bucket_len(min(512, int(db.lengths.max())))
        return PlanesPrefetch(db, max_len=max_len)

    def _shared_from(pf):
        if pf is None:
            return {}
        planes, lengths = pf.get()
        return {"planes": planes, "lengths": lengths}

    def _shared_planes(db):
        """Pack + device_put the sequence planes ONCE per iteration; the
        rescoring and correction device stages then reuse the same
        device-resident arrays (the tunnel H2D path is slow enough that a
        re-upload per stage is measurable)."""
        return _shared_from(_planes_prefetch(db))
    from .utils import StageTimer
    timer = StageTimer(
        log if (params.verbosity >= 4
                or os.environ.get("CARPEDEAM_SUBTIMING", "0") != "0")
        else None)
    cur = reads
    cycle_all: dict[int, bytes] = {}   # accumulated circular contigs
    cycle_ext: dict[int, bool] = {}

    def _restore(step, read_phase, name):
        nonlocal cur
        cur = SeqDB.load(ck.path(name))
        if not read_phase and ck.done(f"cycle_{step}"):
            cyc = SeqDB.load(ck.path(f"cycle_{step}"))
            for j in range(len(cyc)):
                cycle_all[int(cyc.keys[j])] = bytes(cyc.seq_bytes(j))
                cycle_ext[int(cyc.keys[j])] = bool(cyc.ext[j])
            keep = ~np.isin(cur.keys, cyc.keys)
            cur = cur.select(np.nonzero(keep)[0])

    import time as _time
    loop_t0 = _time.perf_counter()
    for step in range(params.num_iterations):
        iter_t0 = _time.perf_counter()
        read_phase = step < params.num_iterations_reads
        name = f"assembly_{'reads' if read_phase else 'contigs'}_{step}"
        if ck.done(name):
            _restore(step, read_phase, name)
            log(f"step {step}: restored from checkpoint")
            continue

        pref = aln = None
        planes_pf = _planes_prefetch(cur) if dist is None else None
        if dist is not None:
            # Every stage of the iteration distributes: kmermatcher by
            # hash ranges, rescorediagonal by query-record ranges, then
            # correction + extension/merging by query-group ranges
            # (dist_apply_by_query_range) — each rank computes a
            # disjoint slice and all ranks assemble identical merged
            # results, so no rank idles through the per-query stages
            # (the round-2 design ran them on rank 0 alone, which made
            # two ranks SLOWER than one).
            from .parallel.driver import (dist_kmermatcher,
                                          dist_rescorediagonal)
            with timer.time(f"kmermatcher_{step}"):
                # range-local: this rank's centre span only; rescore /
                # correction / extension consume the same local slice —
                # only changed sequence rows ever cross ranks
                pref, _qrange = dist_kmermatcher(
                    dist, cur,
                    params.kmer_size_reads if read_phase
                    else params.kmer_size_contigs,
                    params.kmers_per_sequence,
                    params.kmers_per_sequence_scale,
                    params.include_only_extendable_reads if read_phase
                    else params.include_only_extendable_contigs,
                    params.hash_shift, step)
            with timer.time(f"rescorediagonal_{step}"):
                aln = dist_rescorediagonal(
                    dist, cur, pref,
                    params.seq_id_thr if read_phase
                    else params.corr_contig_seq_id,
                    params.eval_thr, params.aln_len_thr, step)

        if read_phase:
            if pref is None:
                with timer.time(f"kmermatcher_{step}"):
                    pref = kmermatcher_fn(cur, params.kmer_size_reads,
                                       params.kmers_per_sequence,
                                       params.kmers_per_sequence_scale,
                                       params.include_only_extendable_reads,
                                       params.hash_shift)
            shared = _shared_from(planes_pf)
            if aln is None:
                with timer.time(f"rescorediagonal_{step}"):
                    aln = rescore_fn(cur, pref, params.seq_id_thr,
                                     params.eval_thr, params.aln_len_thr,
                                     **shared)
            corr_shared = None
            ext_pro = None
            with timer.time(f"correction_{step}"):
                if dist is not None:
                    from .parallel.driver import dist_apply_by_query_range
                    corr = dist_apply_by_query_range(
                        dist, step, "corr", cur, aln,
                        lambda db, a: correction_fn(
                            db, a, damage, params.corr_reads_ry_seq_id,
                            params.seq_id_thr),
                        local=True)
                elif shared and getattr(correction_fn,
                                        "supports_planes_out", False):
                    # corrected planes derive on device from the
                    # correction kernel's own output (no re-pack /
                    # re-upload), and the correction pull is DEFERRED:
                    # the extension stage's first device pass dispatches
                    # against the derived planes while the corrected
                    # bytes still stream to the host
                    corr_fin, corr_shared = correction_fn(
                        cur, aln, damage, params.corr_reads_ry_seq_id,
                        params.seq_id_thr, return_planes=True,
                        defer=True, **shared)
                    if corr_shared is not None \
                            and not params.ancient_unsafe:
                        from .ops.extension_batch import ext_prologue
                        ext_pro = ext_prologue(cur, aln,
                                               corr_shared["planes"],
                                               corr_shared["lengths"])
                    corr = corr_fin()
                else:
                    corr = correction_fn(cur, aln, damage,
                                         params.corr_reads_ry_seq_id,
                                         params.seq_id_thr, **shared)
            with timer.time(f"read_assembly_{step}"):
                # extension scores run over the CORRECTED sequences: the
                # device-derived corrected planes serve when available,
                # else pack fresh ones
                if dist is not None:
                    nxt = dist_apply_by_query_range(
                        dist, step, "ext", corr, aln,
                        lambda db, a: read_assembly(
                            db, a, damage, params.seq_id_thr,
                            params.ry_seq_id_thr,
                            params.likelihood_threshold,
                            params.random_align_penal,
                            params.excess_penal, params.max_seq_len,
                            params.ancient_unsafe, params.min_cov_safe),
                        local=True)
                else:
                    nxt = read_assembly(corr, aln, damage,
                                        params.seq_id_thr,
                                        params.ry_seq_id_thr,
                                        params.likelihood_threshold,
                                        params.random_align_penal,
                                        params.excess_penal,
                                        params.max_seq_len,
                                        params.ancient_unsafe,
                                        params.min_cov_safe,
                                        prologue=ext_pro,
                                        **(corr_shared if corr_shared
                                           is not None
                                           else _shared_planes(corr)))
        else:
            if pref is None:
                with timer.time(f"kmermatcher_{step}"):
                    pref = kmermatcher_fn(cur, params.kmer_size_contigs,
                                       params.kmers_per_sequence,
                                       params.kmers_per_sequence_scale,
                                       params.include_only_extendable_contigs,
                                       params.hash_shift)
            shared = _shared_from(planes_pf)
            if aln is None:
                with timer.time(f"rescorediagonal_{step}"):
                    aln = rescore_fn(cur, pref, params.corr_contig_seq_id,
                                     params.eval_thr, params.aln_len_thr,
                                     **shared)
            with timer.time(f"correction_{step}"):
                if dist is not None:
                    from .parallel.driver import dist_apply_by_query_range
                    corr = dist_apply_by_query_range(
                        dist, step, "corr", cur, aln,
                        lambda db, a: correction_fn(
                            db, a, damage, params.corr_reads_ry_seq_id,
                            params.corr_contig_seq_id),
                        local=True)
                else:
                    corr = correction_fn(cur, aln, damage,
                                         params.corr_reads_ry_seq_id,
                                         params.corr_contig_seq_id,
                                         **shared)
            with timer.time(f"contig_merge_{step}"):
                if dist is not None:
                    nxt = dist_apply_by_query_range(
                        dist, step, "merge", corr, aln,
                        lambda db, a: contig_merge(
                            db, a, damage, params.merge_seq_id_thr,
                            params.ry_seq_id_thr, params.max_seq_len,
                            params.ancient_unsafe, params.min_cov_safe),
                        local=True)
                else:
                    nxt = contig_merge(corr, aln, damage,
                                       params.merge_seq_id_thr,
                                       params.ry_seq_id_thr,
                                       params.max_seq_len,
                                       params.ancient_unsafe,
                                       params.min_cov_safe)

        if ck.tmp and (dist is None or dist.rank == 0):
            nxt.save(ck.path(name), compressed=bool(params.compressed))
            ck.mark(name)
        log(f"step {step}: {'reads' if read_phase else 'contigs'} "
            f"n={len(nxt)} extended={int(nxt.ext.sum())}")
        cur = nxt

        if not read_phase and params.cycle_check:
            cyc, none_cyc = cyclecheck(cur, k=22, chop=params.chop_cycle,
                                       max_seq_len=params.max_seq_len)
            if ck.tmp and (dist is None or dist.rank == 0):
                cyc.save(ck.path(f"cycle_{step}"),
                         compressed=bool(params.compressed))
                ck.mark(f"cycle_{step}")
            if len(cyc):
                for j in range(len(cyc)):
                    cycle_all[int(cyc.keys[j])] = bytes(cyc.seq_bytes(j))
                    cycle_ext[int(cyc.keys[j])] = bool(cyc.ext[j])
                log(f"step {step}: {len(cyc)} circular contigs set aside")
                cur = none_cyc
        if dist is not None:
            dist.barrier()          # other ranks restore this iteration
        # per-iteration progress + ETA (Debug::Progress analogue; ETA
        # scales the mean iteration cost over the remaining steps)
        done_n = step + 1
        elapsed = _time.perf_counter() - loop_t0
        eta = elapsed / done_n * (params.num_iterations - done_n)
        log(f"iteration {done_n}/{params.num_iterations} "
            f"({'reads' if read_phase else 'contigs'}) "
            f"{_time.perf_counter() - iter_t0:.1f}s  "
            f"elapsed {elapsed:.1f}s  ETA {eta:.1f}s")

    # EPILOGUE (nuclassemble.sh:201-233)
    # RESULT = last contig assembly minus cycles, plus all accumulated cycles
    if cycle_all:
        seqs = [cur.seq_bytes(j) for j in range(len(cur))]
        keys = list(cur.keys)
        ext = list(cur.ext)
        for k_, s in cycle_all.items():
            seqs.append(np.frombuffer(s, dtype=np.uint8))
            keys.append(k_)
            ext.append(cycle_ext[k_])
        result = SeqDB.from_sequences([bytes(s) for s in seqs],
                                      keys=np.array(keys, dtype=np.uint32),
                                      ext=np.array(ext, dtype=bool))
    else:
        result = cur

    # only-assembled filter: output length strictly greater than source
    src_len = {int(reads.keys[j]): int(reads.lengths[j])
               for j in range(len(reads))}
    keep = [j for j in range(len(result))
            if int(result.lengths[j]) > src_len.get(int(result.keys[j]), -1)
            and int(result.lengths[j]) > params.min_contig_len - 1]
    result = result.select(np.array(keep, dtype=np.int64)) if keep \
        else SeqDB.from_sequences([])
    cycle_keys = set(cycle_all.keys()) & set(int(k) for k in result.keys)
    return result, cycle_keys, reads


def ancient_assemble(reads: SeqDB, params: Params, damage: DamageModel,
                     out_fasta: str | None = None, tmp_dir: str | None = None,
                     progress=None, dist=None):
    """The `ancient_assemble` (guidedNuclAssemble) workflow: nuclassemble
    with the guided parameter overrides, linclust redundancy reduction,
    representative extraction, headers and FASTA output
    (data/guidedNuclAssemble.sh:177-225, src/workflow/GuidedNuclassembler.cpp).

    Returns the final SeqDB of representative contigs (key order), with
    headers '<rank> len:<len>[ cycle:<0|1>]'.
    """
    from .stages.linclust import linclust

    log = progress or (lambda *_: None)
    # guided overrides of the inner nuclassemble defaults
    # (GuidedNuclassembler.cpp:12-31,170-180: numIterations 10 via
    # multiNumIterations.nucleotides, reads-only count stays at the CLI
    # default 5, maxSeqLen 200000)
    p = params.copy_defaults(num_iterations=10, num_iterations_reads=5,
                             max_seq_len=200000)
    assembly, cycle_keys, _ = nuclassemble(
        reads, p, damage,
        tmp_dir=os.path.join(tmp_dir, "nuclassembly_tmp") if tmp_dir else None,
        progress=progress, dist=dist)
    if dist is not None and dist.rank != 0:
        # the epilogue (linclust + FASTA) is rank 0's; mirror the
        # reference where only the master writes merged results
        return None
    log(f"nuclassemble: {len(assembly)} contigs, {len(cycle_keys)} circular")

    # redundancy reduction
    clusters = linclust(assembly, p.clust_seq_id_thr, p.clust_cov_thr,
                        p.clust_cov_mode)
    rep_keys = sorted(clusters.keys())
    key2id = assembly.key_to_id()
    rep = assembly.select(np.array([key2id[k] for k in rep_keys],
                                   dtype=np.int64))
    log(f"linclust: {len(rep)} representative contigs")

    # headers: '<rank-in-key-order> len:<len>' + cycle flag when circular
    # contigs exist (createhdb.cpp:47-68)
    has_cycles = any(k in cycle_keys for k in rep_keys)
    headers = []
    for idx, k in enumerate(rep_keys):
        h = f"{idx} len:{int(rep.lengths[idx])}"
        if has_cycles:
            h += f" cycle:{1 if k in cycle_keys else 0}"
        headers.append(h)
    rep.headers = headers
    if out_fasta:
        rep.to_fasta(out_fasta)
    return rep
