"""Command-line interface mirroring the reference binary's commands.

    python -m carpedeam_tpu.cli ancient_assemble reads.fq out.fasta tmpDir \
        --ancient-damage prefix [flags]
    python -m carpedeam_tpu.cli nuclassemble   reads.fq out.fasta tmpDir ...
    python -m carpedeam_tpu.cli cyclecheck     in.fasta out.fasta
    python -m carpedeam_tpu.cli convert2fasta  db_prefix out.fasta

Flag names and defaults follow src/carpedeam.cpp's command table and
LocalParameters.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

from .damage import DamageModel
from .io.seqdb import SeqDB
from .params import (ParamError, add_flags,
                     apply_nuclassemble_defaults, params_from_args)


def _load_reads(paths: list[str], db_mode: bool = False):
    if db_mode:
        return SeqDB.load(paths[0])
    if len(paths) == 1:
        return SeqDB.from_fastx(paths[0])
    # paired-end: FLASH merge (mergereads)
    from .stages.mergereads import mergereads
    return mergereads(paths)


def main(argv=None) -> int:
    # Honor an explicit JAX_PLATFORMS request: site hooks on some rigs
    # force an accelerator platform into jax.config, silently overriding
    # the environment variable (jax reads the config, not the env, once
    # a hook has set it).  Pin the config before any backend init.
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser(prog="carpedeam-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    for name in ("ancient_assemble", "nuclassemble"):
        sp = sub.add_parser(name)
        sp.add_argument("files", nargs="+",
                        help="READS... OUT_FASTA TMP_DIR")
        sp.add_argument("--world", type=int, default=1,
                        help="spawn and supervise N cooperating ranks "
                             "(the reference's --mpi-runner analogue, "
                             "Parameters.cpp:150); output is "
                             "byte-identical to a single process")
        add_flags(sp)

    sp = sub.add_parser("cyclecheck")
    sp.add_argument("files", nargs=2, help="IN_FASTA OUT_FASTA")
    sp.add_argument("--chop-cycle", dest="chop_cycle", type=int, default=0)
    sp.add_argument("--max-seq-len", dest="max_seq_len", type=int,
                    default=200000)

    sp = sub.add_parser("convert2fasta")
    sp.add_argument("files", nargs=2, help="DB_PREFIX OUT_FASTA")

    # --- stage-level commands on saved DBs (the reference's hidden
    # subcommand surface, src/carpedeam.cpp:25-72) ----------------------
    sp = sub.add_parser("mergereads")
    sp.add_argument("files", nargs="+", help="R1.fq R2.fq [...] OUT_DB")

    sp = sub.add_parser("createdb")
    sp.add_argument("files", nargs=2, help="IN_FASTX OUT_DB")
    sp.add_argument("--shuffle", type=int, choices=(0, 1), default=1)

    sp = sub.add_parser("kmermatcher")
    sp.add_argument("files", nargs=2, help="SEQ_DB OUT_PREF_DB")
    add_flags(sp)

    sp = sub.add_parser("rescorediagonal")
    sp.add_argument("files", nargs=3, help="SEQ_DB PREF_DB OUT_ALN_DB")
    add_flags(sp)

    for name in ("ancient_correction", "ancient_read_assemble",
                 "ancient_contig_merge"):
        sp = sub.add_parser(name)
        sp.add_argument("files", nargs=3, help="SEQ_DB ALN_DB OUT_SEQ_DB")
        add_flags(sp)

    sp = sub.add_parser("guidedassembleresult")
    sp.add_argument("files", nargs=5,
                    help="NUCL_DB AA_DB ALN_DB OUT_NUCL_DB OUT_AA_DB")
    add_flags(sp)

    sp = sub.add_parser("createhdb")
    sp.add_argument("files", nargs=2, help="SEQ_DB OUT_DB")
    sp.add_argument("--cycle-keys", default="",
                    help="comma-separated keys flagged cycle:1")

    args = parser.parse_args(argv)
    if getattr(args, "world", 1) > 1 \
            and "CARPEDEAM_RANK" not in os.environ:
        return _launch_world(args.world, argv)
    try:
        return _dispatch(args)
    except ParamError as e:
        # the reference names the offending flag and exits without a
        # stack trace (Parameters.cpp parseParameters)
        print(f"{parser.prog}: invalid parameter: {e}", file=sys.stderr)
        return 1
    except FileNotFoundError as e:
        miss = e.filename or e
        print(f"{parser.prog}: input not found: {miss}", file=sys.stderr)
        return 1


def _launch_world(world: int, argv) -> int:
    """Spawn and supervise `world` rank processes of this same command
    (the RUNNER/--mpi-runner role, lib/mmseqs/src/commons/Parameters.cpp:
    150,2175): each child gets CARPEDEAM_RANK/CARPEDEAM_WORLD and runs
    the distributed pipeline on the shared tmp dir.  Any rank failing
    terminates the group."""
    import subprocess
    procs: list[subprocess.Popen] = []
    try:
        for r in range(world):
            env = dict(os.environ,
                       CARPEDEAM_RANK=str(r), CARPEDEAM_WORLD=str(world))
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "carpedeam_tpu.cli", *argv],
                env=env))
        while True:
            codes = [p.poll() for p in procs]
            if any(c not in (None, 0) for c in codes):
                for p in procs:        # exact child handles only
                    if p.poll() is None:
                        p.terminate()
                for p in procs:
                    p.wait()
                bad = next(c for c in codes if c not in (None, 0))
                print(f"[carpedeam-tpu] rank failed (exit {bad}); "
                      f"group terminated", file=sys.stderr)
                return 1
            if all(c == 0 for c in codes):
                return 0
            time.sleep(0.2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()


def _dispatch(args) -> int:
    if args.command in ("ancient_assemble", "nuclassemble"):
        *reads_files, out_fasta, tmp_dir = args.files
        params = params_from_args(args)
        from .utils import set_verbosity
        set_verbosity(params.verbosity)
        # structured tracing hook (the Timer/Debug::Progress analogue plus
        # device-level visibility): CARPEDEAM_PROFILE_DIR=<dir> captures a
        # JAX profiler trace of the whole workflow
        prof_dir = os.environ.get("CARPEDEAM_PROFILE_DIR")
        if prof_dir:
            import jax
            jax.profiler.start_trace(prof_dir)
        t0 = time.time()
        reads = _load_reads(reads_files, params.db_mode)
        print(f"[carpedeam-tpu] {len(reads)} reads "
              f"({reads.total_residues} residues) in {time.time()-t0:.1f}s")
        damage = DamageModel.load(params.ancient_damage_path)
        if args.command == "ancient_assemble":
            from .pipeline import ancient_assemble
            # multi-process mode (the reference's --mpi-runner contract):
            # launch one process per rank with CARPEDEAM_RANK/WORLD
            # (+CARPEDEAM_COORD for jax.distributed) on a shared tmp_dir
            from .parallel.driver import DistContext
            dist = DistContext.from_env(os.path.join(tmp_dir, "dist"))
            rep = ancient_assemble(reads, params, damage, out_fasta=out_fasta,
                                   tmp_dir=tmp_dir, progress=lambda m: print(
                                       f"[carpedeam-tpu] {m}"), dist=dist)
            if rep is None:
                print(f"[carpedeam-tpu] rank {dist.rank}: done "
                      f"({time.time()-t0:.1f}s total)")
            else:
                print(f"[carpedeam-tpu] wrote {len(rep)} contigs -> "
                      f"{out_fasta} ({time.time()-t0:.1f}s total)")
            if prof_dir:
                import jax
                jax.profiler.stop_trace()
        else:
            from .pipeline import nuclassemble
            p = apply_nuclassemble_defaults(params)
            result, cycles, _ = nuclassemble(reads, p, damage,
                                             tmp_dir=tmp_dir)
            result.headers = [f"{i} len:{int(result.lengths[i])}"
                              for i in range(len(result))]
            result.to_fasta(out_fasta)
            print(f"[carpedeam-tpu] wrote {len(result)} contigs -> "
                  f"{out_fasta} ({time.time()-t0:.1f}s total)")
        return 0

    if args.command == "cyclecheck":
        from .stages.cyclecheck import cyclecheck
        db = SeqDB.from_fastx(args.files[0])
        cyc, _ = cyclecheck(db, chop=bool(args.chop_cycle),
                            max_seq_len=args.max_seq_len)
        cyc.to_fasta(args.files[1],
                     headers=[str(int(k)) for k in cyc.keys])
        print(f"[carpedeam-tpu] {len(cyc)} circular sequences")
        return 0

    if args.command == "convert2fasta":
        db = SeqDB.load(args.files[0])
        db.to_fasta(args.files[1])
        return 0

    if args.command == "mergereads":
        from .stages.mergereads import mergereads
        *fq, out = args.files
        db = mergereads(fq)
        db.save(out)
        print(f"[carpedeam-tpu] {len(db)} records -> {out}")
        return 0

    if args.command == "createdb":
        db = SeqDB.from_fastx(args.files[0], shuffle=bool(args.shuffle))
        db.save(args.files[1])
        print(f"[carpedeam-tpu] {len(db)} records -> {args.files[1]}")
        return 0

    if args.command == "kmermatcher":
        from .kmer.matcher import kmermatcher
        p = params_from_args(args)
        db = SeqDB.load(args.files[0])
        pref = kmermatcher(db, p.kmer_size, p.kmers_per_sequence,
                           p.kmers_per_sequence_scale,
                           p.include_only_extendable_contigs, p.hash_shift)
        pref.save(args.files[1])
        print(f"[carpedeam-tpu] {len(pref.qkey)} hits -> {args.files[1]}")
        return 0

    if args.command == "rescorediagonal":
        from .aligndb import PrefDB
        from .stages.rescorediagonal import rescorediagonal
        p = params_from_args(args)
        db = SeqDB.load(args.files[0])
        pref = PrefDB.load(args.files[1])
        aln = rescorediagonal(db, pref, p.seq_id_thr, p.eval_thr,
                              p.aln_len_thr)
        aln.save(args.files[2])
        print(f"[carpedeam-tpu] {len(aln.qkey)} alignments -> {args.files[2]}")
        return 0

    if args.command in ("ancient_correction", "ancient_read_assemble",
                        "ancient_contig_merge"):
        from .aligndb import AlnDB
        p = params_from_args(args)
        db = SeqDB.load(args.files[0])
        aln = AlnDB.load(args.files[1])
        damage = DamageModel.load(p.ancient_damage_path)
        if args.command == "ancient_correction":
            from .stages.correction import correction
            out_db = correction(db, aln, damage, p.corr_reads_ry_seq_id,
                                p.corr_reads_seq_id)
        elif args.command == "ancient_read_assemble":
            from .stages.read_assembly import read_assembly
            out_db = read_assembly(db, aln, damage, p.seq_id_thr,
                                   p.ry_seq_id_thr, p.likelihood_threshold,
                                   p.random_align_penal, p.excess_penal,
                                   p.max_seq_len, p.ancient_unsafe,
                                   p.min_cov_safe)
        else:
            from .stages.contig_merge import contig_merge
            out_db = contig_merge(db, aln, damage, p.merge_seq_id_thr,
                                  p.ry_seq_id_thr, p.max_seq_len,
                                  p.ancient_unsafe, p.min_cov_safe)
        out_db.save(args.files[2])
        print(f"[carpedeam-tpu] {len(out_db)} records -> {args.files[2]}")
        return 0

    if args.command == "guidedassembleresult":
        from .aligndb import AlnDB
        from .stages.guided_assembly import guided_assembly
        p = params_from_args(args)
        nucl = SeqDB.load(args.files[0])
        aa = SeqDB.load(args.files[1])
        aln = AlnDB.load(args.files[2])
        out_n, out_a = guided_assembly(nucl, aa, aln, p.seq_id_thr,
                                       p.max_seq_len)
        out_n.save(args.files[3])
        out_a.save(args.files[4])
        print(f"[carpedeam-tpu] {int(out_n.ext.sum())} extended -> "
              f"{args.files[3]}")
        return 0

    if args.command == "createhdb":
        # header DB 'ID len:<len> [cycle:<0|1>]' (src/util/createhdb.cpp:47-68)
        db = SeqDB.load(args.files[0])
        cyc = {int(k) for k in args.cycle_keys.split(",") if k}
        headers = []
        for i in range(len(db)):
            h = f"{i} len:{int(db.lengths[i])}"
            if cyc:
                h += f" cycle:{1 if int(db.keys[i]) in cyc else 0}"
            headers.append(h)
        db.headers = headers
        db.save(args.files[1])
        print(f"[carpedeam-tpu] {len(db)} headers -> {args.files[1]}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
