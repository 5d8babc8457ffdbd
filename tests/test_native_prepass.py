"""Native prepass kernels vs the NumPy oracles.

The C++ batch kernels (native/prepass.cpp) replace the dense-window NumPy
formulations of ops/extension_batch.py, stages/correction.py and
kmer/matcher.py on the host path; these tests pin them to the oracles on
the real example workload (reference: src/assembler/
ancientContigsResults.cpp, correction.cpp, lib/mmseqs/src/linclust/
kmermatcher.cpp).
"""
import numpy as np
import pytest

import carpedeam_tpu.native as N
from carpedeam_tpu.damage import DamageModel
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import extract_selected_kmers_batched
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.ops.extension_batch import (batch_contig_scoring,
                                               batch_initial_scoring)
from carpedeam_tpu.params import Params
from carpedeam_tpu.stages.correction import correction
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal

EXAMPLE = "/root/reference/example/test_data.fq.gz"
DAMAGE = "/root/reference/example/dhigh"


@pytest.fixture(scope="module")
def setup():
    if N.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    db = SeqDB.from_fastx(EXAMPLE).select(np.arange(3000))
    dm = DamageModel.load(DAMAGE)
    p = Params(use_device="0")
    pref = kmermatcher(db, 20, 200, 0.2, False)
    aln = rescorediagonal(db, pref, p.seq_id_thr, p.eval_thr, p.aln_len_thr)
    return db, dm, p, aln


def _entries_sorted(e):
    return np.lexsort((e["pos"], e["h16"], e["kmer"], e["id"]))


def test_kmer_extract_matches_numpy(setup, monkeypatch):
    db, *_ = setup
    nat = extract_selected_kmers_batched(db, 20, 200, 0.2, 67)
    monkeypatch.setattr(N, "kmer_extract", lambda *a, **k: None)
    ref = extract_selected_kmers_batched(db, 20, 200, 0.2, 67)
    for e in (nat, ref):
        order = _entries_sorted(e)
        for k in e:
            e[k] = e[k][order]
    for k in ref:
        assert np.array_equal(nat[k], ref[k]), k


def test_correction_groups_matches_numpy(setup, monkeypatch):
    db, dm, p, aln = setup
    nat = correction(db, aln, dm, p.corr_reads_ry_seq_id, p.seq_id_thr)
    monkeypatch.setattr(N, "correction_groups", lambda *a, **k: None)
    ref = correction(db, aln, dm, p.corr_reads_ry_seq_id, p.seq_id_thr)
    for i in range(len(db)):
        assert bytes(nat.seq_bytes(i)) == bytes(ref.seq_bytes(i)), i


def test_read_prepass_matches_numpy(setup, monkeypatch):
    db, dm, p, aln = setup
    corr = correction(db, aln, dm, p.corr_reads_ry_seq_id, p.seq_id_thr)
    args = (corr, aln, dm, p.seq_id_thr, p.ry_seq_id_thr,
            p.likelihood_threshold, p.random_align_penal, p.excess_penal)
    nat = batch_initial_scoring(*args)
    monkeypatch.setattr(N, "read_prepass", lambda *a, **k: None)
    ref = batch_initial_scoring(*args)
    for k in ("cand", "seq_id", "ry_seq_id", "queue_ok", "max_left",
              "max_right"):
        assert np.array_equal(nat[k], ref[k]), k
    # likelihood sums: sequential vs pairwise f64 summation (last ulp)
    np.testing.assert_allclose(nat["s_len_norm"], ref["s_len_norm"],
                               rtol=1e-12)
    np.testing.assert_allclose(nat["s_ratio"], ref["s_ratio"], rtol=1e-9)


def test_contig_prepass_matches_numpy(setup, monkeypatch):
    db, dm, p, aln = setup
    nat = batch_contig_scoring(db, aln, dm, p.merge_seq_id_thr,
                               p.ry_seq_id_thr)
    monkeypatch.setattr(N, "contig_prepass", lambda *a, **k: None)
    ref = batch_contig_scoring(db, aln, dm, p.merge_seq_id_thr,
                               p.ry_seq_id_thr)
    for k in ref:
        assert np.array_equal(nat[k], ref[k]), k


def test_sort_kmer_entries_matches_lexsort(setup):
    db, *_ = setup
    from carpedeam_tpu.kmer.packing import BIT63
    ent = extract_selected_kmers_batched(db, 20, 200, 0.2, 67)
    order_nat = N.sort_kmer_entries(ent["kmer"], ent["id"], ent["pos"],
                                    ent["seq_len"])
    order_ref = np.lexsort((ent["pos"], ent["id"],
                            -ent["seq_len"].astype(np.int64),
                            ent["kmer"] | BIT63))
    # permutations may differ only on full-key ties; compare sorted rows
    for k in ("kmer", "id", "pos", "seq_len"):
        assert np.array_equal(ent[k][order_nat], ent[k][order_ref]), k
