"""carpedeam_tpu — a TPU-native damage-aware ancient-metagenome assembler.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CarpeDeam
(reference: /root/reference, a C++17/OpenMP fork of PenguiN/Plass on the
MMseqs2 framework).  The greedy-overlap assembly pipeline

    kmermatcher -> rescorediagonal -> ancient_correction ->
    ancient_read_assemble / ancient_contig_merge -> cyclecheck -> linclust

is re-built as dense, batched array programs: sequences live in packed
NumPy/JAX arrays, candidate overlaps are int32 tables, and all per-base
math (damage likelihoods, Bayesian correction, Beta posteriors) runs as
vectorised kernels on TPU.

Layer map (mirrors SURVEY.md section 7):
  io/       sequence database (packed arrays + manifest), FASTA/FASTQ ingest
  kmer/     k-mer packing, canonicalisation, xxh64 subsampling, matcher
  ops/      JAX/Pallas compute kernels (rescoring, likelihood, correction)
  stages/   pipeline stages, each a checkpointed DB->DB function
  parallel/ device-mesh sharding of the k-mer index and overlap routing
  pipeline  the nuclassemble / ancient_assemble drivers
"""

__version__ = "0.1.0"
