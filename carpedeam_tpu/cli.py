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
import sys
import time

from .damage import DamageModel
from .io.seqdb import SeqDB
from .params import add_flags, apply_nuclassemble_defaults, params_from_args


def _load_reads(paths: list[str]):
    if len(paths) == 1:
        return SeqDB.from_fastx(paths[0])
    # paired-end: FLASH merge (mergereads)
    from .stages.mergereads import mergereads
    return mergereads(paths)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser(prog="carpedeam-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    for name in ("ancient_assemble", "nuclassemble"):
        sp = sub.add_parser(name)
        sp.add_argument("files", nargs="+",
                        help="READS... OUT_FASTA TMP_DIR")
        add_flags(sp)

    sp = sub.add_parser("cyclecheck")
    sp.add_argument("files", nargs=2, help="IN_FASTA OUT_FASTA")
    sp.add_argument("--chop-cycle", dest="chop_cycle", type=int, default=0)
    sp.add_argument("--max-seq-len", dest="max_seq_len", type=int,
                    default=200000)

    sp = sub.add_parser("convert2fasta")
    sp.add_argument("files", nargs=2, help="DB_PREFIX OUT_FASTA")

    args = parser.parse_args(argv)

    if args.command in ("ancient_assemble", "nuclassemble"):
        *reads_files, out_fasta, tmp_dir = args.files
        params = params_from_args(args)
        t0 = time.time()
        reads = _load_reads(reads_files)
        print(f"[carpedeam-tpu] {len(reads)} reads "
              f"({reads.total_residues} residues) in {time.time()-t0:.1f}s")
        damage = DamageModel.load(params.ancient_damage_path)
        if args.command == "ancient_assemble":
            from .pipeline import ancient_assemble
            rep = ancient_assemble(reads, params, damage, out_fasta=out_fasta,
                                   tmp_dir=tmp_dir, progress=lambda m: print(
                                       f"[carpedeam-tpu] {m}"))
            print(f"[carpedeam-tpu] wrote {len(rep)} contigs -> {out_fasta} "
                  f"({time.time()-t0:.1f}s total)")
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

    return 1


if __name__ == "__main__":
    sys.exit(main())
