"""Golden-parity tests for rescorediagonal and ancient_correction."""
import numpy as np
import pytest

from carpedeam_tpu.damage import DamageModel
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.stages.correction import correction
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal

from conftest import golden_tmp, needs_golden


@pytest.fixture(scope="module")
def pipeline_state(example_reads):
    pref = kmermatcher(example_reads, 20, 200, 0.2, False)
    aln = rescorediagonal(example_reads, pref, seq_id_thr=0.9)
    return pref, aln


def test_rescore_simple_overlap():
    a = "ACGTACGGTTCACGATTGCAGGCTAACCGGTTACAT"
    b = a[10:] + "GATTACAGATTACAGATT"
    db = SeqDB.from_sequences([a, b])
    pref = kmermatcher(db, 20, 200, 0.2, False)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    txt = aln.to_text()
    # query 1 (longer, centre): identity + overlap vs 0
    lines = txt[1].strip().split("\n")
    assert len(lines) == 2
    cols = lines[1].split("\t")
    assert cols[0] == "0"
    assert cols[2] == "1.00"           # perfect overlap, truncated format
    # overlap: b[0:26] == a[10:36]
    assert (cols[4], cols[5]) == ("0", "25")    # qstart qend on b
    assert (cols[7], cols[8]) == ("10", "35")   # dbstart dbend on a


def test_rescore_low_identity_filtered():
    rng = np.random.default_rng(3)
    a = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    # b overlaps but with heavy mismatches -> fails seqId 0.9
    b = list(a[20:])
    for p in range(0, len(b), 3):
        b[p] = "ACGT"[("ACGT".index(b[p]) + 1) % 4]
    db = SeqDB.from_sequences([a, "".join(b) + "ACGTACGTACGTACGTACGT"])
    pref = kmermatcher(db, 20, 200, 0.2, False)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    for qk, rec in aln.to_text().items():
        for line in rec.strip().split("\n"):
            if not line:
                continue
            cols = line.split("\t")
            # only identity self-hits survive
            assert cols[0] == str(qk)


@needs_golden
def test_golden_aln0_bit_exact(example_reads, pipeline_state):
    _, aln = pipeline_state
    gold = SeqDB.read_mmseqs_records(golden_tmp() + "/aln_0")
    mine = aln.to_text()
    ndiff = sum(1 for k, v in gold.items() if mine.get(k) != v)
    assert ndiff == 0


@needs_golden
def test_golden_correction0_bit_exact(example_reads, pipeline_state,
                                      damage_model):
    _, aln = pipeline_state
    corr = correction(example_reads, aln, damage_model, 0.99, 0.9)
    gold = SeqDB.read_mmseqs(golden_tmp() + "/correction_0")
    assert len(corr) == len(gold)
    ndiff = sum(1 for i in range(len(corr))
                if corr.seq_str(i) != gold.seq_str(i))
    assert ndiff == 0
    # and the stage actually corrects something
    nchanged = sum(1 for i in range(len(corr))
                   if corr.seq_str(i) != example_reads.seq_str(i))
    assert nchanged > 1000


def test_correction_no_coverage_passthrough(damage_model):
    # two non-overlapping reads: only identity coverage -> unchanged
    db = SeqDB.from_sequences(["ACGTTGCAACGTTGCAACGTTGCAACGTTGCAACGT",
                               "GGCATCCGTGGCATCCGTGGCATCCGTGGCATCCGT"])
    pref = kmermatcher(db, 20, 200, 0.2, False)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    corr = correction(db, aln, damage_model, 0.99, 0.9)
    assert corr.seq_str(0) == db.seq_str(0)
    assert corr.seq_str(1) == db.seq_str(1)
