"""Assembly parameters, mirroring the reference flag system.

One dataclass per run; field names, CLI flag spellings and defaults follow
LocalParameters (src/commons/LocalParameters.h:283-318) and the workflow
defaults (src/workflow/Nuclassembler.cpp:10-34, GuidedNuclassembler.cpp:
11-41).  `apply_nuclassemble_defaults` reproduces
setNuclAssemblerWorkflowDefaults.
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass


@dataclass
class Params:
    # --- core assembly loop -------------------------------------------------
    num_iterations: int = 12                # --num-iterations (workflow: 10)
    num_iterations_reads: int = 5           # --num-iter-reads-only (workflow: 4)
    kmer_size: int = 22                     # -k (contig phase; workflow 22)
    kmer_size_reads: int = 20               # --k-ancient-reads
    kmer_size_contigs: int = 22             # --k-ancient-contigs
    kmers_per_sequence: int = 200           # --kmer-per-seq-ancient
    kmers_per_sequence_scale: float = 0.2   # --kmer-per-seq-scale-ancient
    include_only_extendable_reads: bool = False
    include_only_extendable_contigs: bool = True
    hash_shift: int = 67                    # --hash-shift (Parameters.cpp:2336)
    ignore_multi_kmer: bool = True          # workflow forces true
    mask_mode: int = 0

    # --- alignment / filtering ---------------------------------------------
    seq_id_thr: float = 0.9                 # --min-seq-id (workflow 0.9)
    merge_seq_id_thr: float = 0.99          # --min-merge-seq-id
    ry_seq_id_thr: float = 0.99             # --min-ryseq-id
    corr_reads_ry_seq_id: float = 0.99      # --min-ryseq-id-corr-reads
    corr_reads_seq_id: float = 0.9          # --min-seqid-corr-reads
    corr_contig_seq_id: float = 0.9         # --min-seqid-corr-contigs
    eval_thr: float = 0.001                 # -e
    cov_thr: float = 0.0                    # -c
    cov_mode: int = 0
    aln_len_thr: int = 0                    # --min-aln-len
    max_seq_len: int = 300000               # --max-seq-len

    # --- ancient extension scoring -----------------------------------------
    random_align_penal: float = 0.85        # --ext-random-align
    excess_penal: float = 0.0625            # --excess-penalty
    likelihood_threshold: float = 0.5       # --likelihood-ratio-threshold
    ancient_damage_path: str = ""           # --ancient-damage (prefix)
    ancient_unsafe: bool = False            # --unsafe
    min_cov_safe: int = 5                   # --min-cov-safe

    # --- output / cycles ----------------------------------------------------
    min_contig_len: int = 500               # --min-contig-len
    cycle_check: bool = True                # --cycle-check
    chop_cycle: bool = True                 # --chop-cycle
    contig_output_mode: int = 1

    # --- redundancy reduction (guided workflow, GuidedNuclassembler.cpp:33-40)
    clust_seq_id_thr: float = 0.97          # --clust-min-seq-id
    clust_cov_thr: float = 0.99             # --clust-min-cov
    clust_cov_mode: int = 1
    clustering_mode: int = 2                # greedy incremental

    # --- runtime ------------------------------------------------------------
    threads: int = 8
    remove_tmp_files: bool = False
    delete_tmp_inc: bool = True
    db_mode: bool = False
    verbosity: int = 3
    # device kernel selection: "auto" = use the accelerator path when the
    # default JAX backend is not the host CPU; "1"/"0" force on/off.  Both
    # paths are bit-identical (tests/test_device_parity.py).
    use_device: str = "auto"

    def copy(self, **overrides) -> "Params":
        return dataclasses.replace(self, **overrides)


def apply_nuclassemble_defaults(p: Params) -> Params:
    """setNuclAssemblerWorkflowDefaults (src/workflow/Nuclassembler.cpp:10-34)."""
    return p.copy(num_iterations=10, num_iterations_reads=4, kmer_size=22,
                  seq_id_thr=0.9, merge_seq_id_thr=0.99, cov_thr=0.0,
                  eval_thr=0.001, max_seq_len=300000)


_FLAGS = {
    "--num-iterations": ("num_iterations", int),
    "--num-iter-reads-only": ("num_iterations_reads", int),
    "-k": ("kmer_size", int),
    "--k-ancient-reads": ("kmer_size_reads", int),
    "--k-ancient-contigs": ("kmer_size_contigs", int),
    "--kmer-per-seq-ancient": ("kmers_per_sequence", int),
    "--kmer-per-seq-scale-ancient": ("kmers_per_sequence_scale", float),
    "--include-only-extendable": ("include_only_extendable_contigs", bool),
    "--hash-shift": ("hash_shift", int),
    "--min-seq-id": ("seq_id_thr", float),
    "--min-merge-seq-id": ("merge_seq_id_thr", float),
    "--min-ryseq-id": ("ry_seq_id_thr", float),
    "--min-ryseq-id-corr-reads": ("corr_reads_ry_seq_id", float),
    "--min-seqid-corr-reads": ("corr_reads_seq_id", float),
    "--min-seqid-corr-contigs": ("corr_contig_seq_id", float),
    "-e": ("eval_thr", float),
    "--max-seq-len": ("max_seq_len", int),
    "--ext-random-align": ("random_align_penal", float),
    "--excess-penalty": ("excess_penal", float),
    "--likelihood-ratio-threshold": ("likelihood_threshold", float),
    "--ancient-damage": ("ancient_damage_path", str),
    "--unsafe": ("ancient_unsafe", bool),
    "--min-cov-safe": ("min_cov_safe", int),
    "--min-contig-len": ("min_contig_len", int),
    "--cycle-check": ("cycle_check", bool),
    "--chop-cycle": ("chop_cycle", bool),
    "--clust-min-seq-id": ("clust_seq_id_thr", float),
    "--clust-min-cov": ("clust_cov_thr", float),
    "--threads": ("threads", int),
    "--remove-tmp-files": ("remove_tmp_files", bool),
    "--delete-tmp-inc": ("delete_tmp_inc", bool),
    "--db-mode": ("db_mode", bool),
    "-v": ("verbosity", int),
    "--use-device": ("use_device", str),
}


def add_flags(parser: argparse.ArgumentParser) -> None:
    for flag, (field, typ) in _FLAGS.items():
        if typ is bool:
            parser.add_argument(flag, dest=field, type=int, choices=(0, 1),
                                default=None)
        else:
            parser.add_argument(flag, dest=field, type=typ, default=None)


def params_from_args(args: argparse.Namespace) -> Params:
    p = Params()
    over = {}
    for _, (field, typ) in _FLAGS.items():
        v = getattr(args, field, None)
        if v is not None:
            over[field] = bool(v) if typ is bool else v
    return p.copy(**over)
