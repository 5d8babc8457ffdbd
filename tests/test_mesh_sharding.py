"""Multi-device sharded stages: bit-parity with the host oracles on an
8-virtual-device CPU mesh (the driver separately dry-runs the same path
via __graft_entry__.dryrun_multichip)."""
import numpy as np

from carpedeam_tpu.kmer.matcher import extract_selected_kmers_batched, kmermatcher
from carpedeam_tpu.parallel.mesh import (correction_sharded, kmer_hash_ranges,
                                         make_mesh, rescorediagonal_sharded)
from carpedeam_tpu.stages.correction import correction
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal


def _world(example_reads):
    db = example_reads.select(np.arange(0, len(example_reads), 40))
    pref = kmermatcher(db, 20, 200, 0.2, False)
    return db, pref


def test_sharded_rescore_matches_oracle(example_reads):
    db, pref = _world(example_reads)
    aln0 = rescorediagonal(db, pref, seq_id_thr=0.9)
    mesh = make_mesh(8)
    aln1 = rescorediagonal_sharded(mesh)(db, pref, seq_id_thr=0.9)
    assert aln1.to_text() == aln0.to_text()


def test_sharded_correction_matches_oracle(example_reads, damage_model):
    db, pref = _world(example_reads)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    ora = correction(db, aln, damage_model, 0.99, 0.9)
    mesh = make_mesh(8)
    dev = correction_sharded(mesh)(db, aln, damage_model, 0.99, 0.9)
    for i in range(len(db)):
        assert bytes(ora.seq_bytes(i)) == bytes(dev.seq_bytes(i))


def test_pipeline_mesh_mode_matches_host(example_reads, damage_model):
    """use_device='mesh' (shard_map over the 8-device CPU mesh) must
    byte-match the host pipeline over 2 assembly iterations."""
    from carpedeam_tpu.params import Params
    from carpedeam_tpu.pipeline import nuclassemble

    db = example_reads.select(np.arange(0, len(example_reads), 30))
    p = Params(num_iterations=2, num_iterations_reads=1, min_contig_len=0,
               use_device="0")
    r0, _, _ = nuclassemble(db, p, damage_model)
    r1, _, _ = nuclassemble(db, p.copy(use_device="mesh"), damage_model)
    assert len(r0) == len(r1)
    for i in range(len(r0)):
        assert bytes(r0.seq_bytes(i)) == bytes(r1.seq_bytes(i))


def test_device_sort_matches_lexsort(example_reads):
    """jax.lax.sort path of the global k-mer table sort == host lexsort
    (key is unique per entry, so total order is deterministic)."""
    from carpedeam_tpu.kmer.matcher import (BIT63, sort_kmer_entries_device)
    db = example_reads.select(np.arange(0, len(example_reads), 50))
    ent = extract_selected_kmers_batched(db, 20, 200, 0.2, 67)
    host = np.lexsort((ent["pos"], ent["id"],
                       -ent["seq_len"].astype(np.int64),
                       ent["kmer"] | BIT63))
    dev = sort_kmer_entries_device(ent)
    assert np.array_equal(host, dev)


def test_kmer_hash_range_shards_partition_the_table(example_reads):
    """Hash-prefix sharding (the reference's MPI split scheme): the union
    of per-range extractions equals the unsharded extraction."""
    db = example_reads.select(np.arange(0, len(example_reads), 100))
    full = extract_selected_kmers_batched(db, 20, 200, 0.2, 67)
    parts = [extract_selected_kmers_batched(db, 20, 200, 0.2, 67,
                                            hash_range=r)
             for r in kmer_hash_ranges(4)]
    total = sum(len(p["kmer"]) for p in parts)
    assert total == len(full["kmer"])
    # identical multiset of (kmer, id, pos) entries
    def key(e):
        return np.lexsort((e["pos"], e["id"], e["kmer"]))
    full_sorted = {k: v[key(full)] for k, v in full.items()}
    cat = {k: np.concatenate([p[k] for p in parts]) for k in full}
    cat_sorted = {k: v[key(cat)] for k, v in cat.items()}
    for k in full:
        assert np.array_equal(full_sorted[k], cat_sorted[k])
