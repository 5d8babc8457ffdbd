"""kmermatcher stage tests: unit semantics + golden parity vs the reference
binary's pref_0 DB (bit-exact on all 14,996 records)."""
import glob

import numpy as np
import pytest

from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import (assign_groups, extract_selected_kmers,
                                        kmermatcher)
from carpedeam_tpu.kmer.packing import BIT63

from conftest import golden_tmp, needs_golden


def _mini_db(seqs):
    return SeqDB.from_sequences(seqs)


def test_simple_overlap_pair():
    # two sequences sharing a 25bp overlap; k=20 -> shared kmers on one diagonal
    a = "ACGTACGGTTCACGATTGCAGGCTAACCGGTTACAT"
    b = a[10:] + "GATTACAGATTACA"
    db = _mini_db([a, b])
    pref = kmermatcher(db, 20, 200, 0.2, include_only_extendable=False)
    txt = pref.to_text()
    # centre = longer sequence (b, 40bp vs 36bp)
    rec = txt[1]
    lines = rec.strip().split("\n")
    assert lines[0] == "1\t0\t0"  # self-hit
    t, s, d = lines[1].split("\t")
    assert t == "0" and int(s) > 0
    assert int(d) == -10  # b starts 10 into a: diagonal qPos-tPos = -10


def test_reverse_strand_overlap():
    a = "ACGTACGGTTCACGATTGCAGGCTAACCGGTTACAT"
    import numpy as np
    from carpedeam_tpu.constants import CHAR_REVCOMP
    rc = CHAR_REVCOMP[np.frombuffer(a.encode(), dtype=np.uint8)][::-1].tobytes().decode()
    db = _mini_db([a, rc + "TTTTT"])
    pref = kmermatcher(db, 20, 200, 0.2, include_only_extendable=False)
    rec = pref.to_text()[1]
    lines = rec.strip().split("\n")
    # reverse-strand hit encoded as negative score
    t, s, d = lines[1].split("\t")
    assert t == "0" and int(s) < 0


def test_include_only_extendable():
    a = "ACGTACGGTTCACGATTGCAGGCTAACCGGTTACATGG"
    inner = a[5:33]  # contained: diagonal in [0, qLen-tLen] -> not extendable
    db = _mini_db([a, inner])
    pref_all = kmermatcher(db, 20, 200, 0.2, include_only_extendable=False)
    pref_ext = kmermatcher(db, 20, 200, 0.2, include_only_extendable=True)
    assert len(pref_all.qkey) > len(pref_ext.qkey)
    # extendable-only: contained hit dropped, only empty self-hits remain
    assert all(q == t for q, t in zip(pref_ext.qkey, pref_ext.tkey))


def test_identity_entry_groups_duplicates():
    a = "ACGTACGGTTCACGATTGCAGGCTAACCGGTTACAT"
    db = _mini_db([a, a])
    ent = extract_selected_kmers(db, 20, 200, 0.2, 67)
    # identical sequences share every canonical kmer AND the seq-hash entry
    n0 = (ent["id"] == 0).sum()
    n1 = (ent["id"] == 1).sum()
    assert n0 == n1
    pref = kmermatcher(db, 20, 200, 0.2, False)
    rec = pref.to_text()[0]  # centre = id 0 (same length, lower id)
    t, s, d = rec.strip().split("\n")[1].split("\t")
    assert t == "1" and int(s) == n0 and int(d) == 0


@needs_golden
def test_golden_pref0_bit_exact(example_reads):
    pref = kmermatcher(example_reads, 20, 200, 0.2,
                       include_only_extendable=False)
    gold = SeqDB.read_mmseqs_records(glob.glob(golden_tmp() + "/pref_0")[0])
    mine = pref.to_text()
    assert len(mine) == len(gold)
    ndiff = sum(1 for k, v in gold.items() if mine.get(k) != v)
    assert ndiff == 0
