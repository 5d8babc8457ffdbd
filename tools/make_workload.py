"""Synthetic ancient-DNA workload generator for scale benchmarking.

Produces a damaged short-read FASTQ(.gz) in the same shape as the
reference's example data (example/test_data.fq.gz: 35-120 bp reads,
mean ~51, coordinates-in-header naming, heavy terminal deamination):
reads are sampled uniformly from a random genome at a target coverage,
reverse-complemented on random strands, and deaminated with the
position-dependent C->T / G->A rates parsed from a damage-profile pair
(example/dhigh{5p,3p}.prof by default), plus a uniform 0.1% sequencing
error.  Deterministic for a given seed.

Usage:
  python tools/make_workload.py OUT.fq.gz --reads 1000000 [--coverage 20]
      [--damage /root/reference/example/dhigh] [--seed 1]
"""
from __future__ import annotations

import argparse
import gzip
import io
import os
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = np.zeros(256, dtype=np.uint8)
COMP[ord("A")] = ord("T")
COMP[ord("T")] = ord("A")
COMP[ord("C")] = ord("G")
COMP[ord("G")] = ord("C")


def parse_profile(path: str) -> np.ndarray:
    """Rows x 12 substitution-rate table (libgab TSV; header skipped)."""
    rows = []
    with open(path) as fh:
        header = fh.readline().split()
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            rows.append([float(x) for x in parts])
    tab = np.array(rows, dtype=np.float64)
    # column order from the header, e.g. 'A>C A>G ... C>T ... G>A ...'
    cols = {name: j for j, name in enumerate(header)}
    return tab, cols


def damage_rates(prefix: str):
    """(ct5, ga3): per-position C->T rates at the 5' end and G->A rates
    at the 3' end (position 0 = terminal), from <prefix>5p.prof/3p.prof."""
    t5, c5 = parse_profile(prefix + "5p.prof")
    t3, c3 = parse_profile(prefix + "3p.prof")
    ct5 = t5[:, c5["C>T"]]
    # 3' file rows are outermost-first in file order (reference quirk:
    # layers 6..10 map in FILE order, SURVEY damage notes)
    ga3 = t3[:, c3["G>A"]]
    return ct5, ga3


def generate(out: str, n_reads: int, coverage: float, damage_prefix: str,
             seed: int, min_len: int = 35, max_len: int = 120,
             mean_len: float = 51.0, seq_err: float = 0.001,
             species: int = 1):
    """`species` > 1 emulates a mock ancient community (the BASELINE.json
    10-species configuration): independent random genomes with a
    log-skewed abundance profile (w_i ~ 2^(-i/2)), reads assigned
    multinomially, each species sized so its own reads hit `coverage`."""
    rng = np.random.default_rng(seed)
    lengths = np.minimum(
        min_len + rng.exponential(mean_len - min_len, n_reads),
        max_len).astype(np.int64)
    total = int(lengths.sum())
    if species <= 1:
        genome_len = max(int(total / coverage), max_len + 1)
        genome = BASES[rng.integers(0, 4, genome_len)]
        starts = rng.integers(0, genome_len - lengths + 1)
    else:
        w = 2.0 ** (-0.5 * np.arange(species))
        w /= w.sum()
        sp_of = rng.choice(species, size=n_reads, p=w)
        res_per = np.bincount(sp_of, weights=lengths,
                              minlength=species).astype(np.int64)
        glens = np.maximum((res_per / coverage).astype(np.int64),
                           max_len + 1)
        goff = np.concatenate([[0], np.cumsum(glens)])
        genome = BASES[rng.integers(0, 4, int(goff[-1]))]
        genome_len = int(goff[-1])
        starts = goff[sp_of] + rng.integers(
            0, glens[sp_of] - lengths + 1)
    strands = rng.integers(0, 2, n_reads).astype(bool)  # True = '-'

    # flat gather of all read windows
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    flat_pos = np.repeat(starts, lengths) + (
        np.arange(total) - np.repeat(offsets[:-1], lengths))
    reads = genome[flat_pos].copy()

    # reverse-complement the '-' strand reads (per-read reversal)
    rev_rows = np.nonzero(strands)[0]
    if len(rev_rows):
        # build flat indices of reversed windows
        rl = lengths[rev_rows]
        ro = offsets[rev_rows]
        flat_rev = np.repeat(ro + rl - 1, rl) - (
            np.arange(int(rl.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(rl)])[:-1], rl))
        seg = np.repeat(ro, rl) + (
            np.arange(int(rl.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(rl)])[:-1], rl))
        reads[seg] = COMP[reads[flat_rev]]

    # deamination: position from 5' end / 3' end per base
    pos5 = np.arange(total) - np.repeat(offsets[:-1], lengths)
    pos3 = np.repeat(lengths, lengths) - 1 - pos5
    ct5, ga3 = damage_rates(damage_prefix)
    p_ct = np.where(pos5 < len(ct5), ct5[np.minimum(pos5, len(ct5) - 1)],
                    0.01)
    p_ga = np.where(pos3 < len(ga3), ga3[np.minimum(pos3, len(ga3) - 1)],
                    0.01)
    u = rng.random(total)
    is_c = reads == ord("C")
    is_g = reads == ord("G")
    reads = np.where(is_c & (u < p_ct), ord("T"), reads).astype(np.uint8)
    reads = np.where(is_g & (u < p_ga), ord("A"), reads).astype(np.uint8)

    # uniform sequencing error
    u2 = rng.random(total)
    err = u2 < seq_err
    if err.any():
        reads[err] = BASES[(rng.integers(1, 4, int(err.sum()))
                            + np.searchsorted(BASES, reads[err])) % 4]

    # write FASTQ
    opener = gzip.open if out.endswith(".gz") else open
    qual = b"]" * max_len
    ends = starts + lengths
    with opener(out, "wb") as raw:
        fh = io.BufferedWriter(raw, 1 << 22)
        for i in range(n_reads):
            s = "-" if strands[i] else "+"
            hdr = (f"@synth:{s}:{starts[i]}:{ends[i]}:{i}\n").encode()
            seq = reads[offsets[i]:offsets[i + 1]].tobytes()
            fh.write(hdr + seq + b"\n+\n" + qual[:lengths[i]] + b"\n")
        fh.flush()
    return total, genome_len


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--coverage", type=float, default=20.0)
    ap.add_argument("--damage",
                    default="/root/reference/example/dhigh")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--species", type=int, default=1,
                    help="mock-community mode: N independent genomes "
                         "with a log-skewed abundance profile")
    args = ap.parse_args()
    total, genome_len = generate(args.out, args.reads, args.coverage,
                                 args.damage, args.seed,
                                 species=args.species)
    print(f"wrote {args.out}: {args.reads} reads, {total} residues, "
          f"genome {genome_len} bp, coverage {total / genome_len:.1f}x")


if __name__ == "__main__":
    main()
