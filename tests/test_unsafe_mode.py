"""--unsafe mode: the majority-vote consensus caller (consensusCaller with
par.ancientUnsafe, nuclassembleUtil.cpp:594-702) against the reference
binary's --unsafe golden run."""
import os

import numpy as np
import pytest

from carpedeam_tpu.damage import DamageModel
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.stages.consensus import consensus_caller
from carpedeam_tpu.stages.correction import correction
from carpedeam_tpu.stages.read_assembly import read_assembly
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal

from conftest import GOLDEN


def _golden_unsafe_tmp():
    base = os.path.join(GOLDEN, "tmp_unsafe")
    if not os.path.isdir(base):
        return None
    for d1 in os.listdir(base):
        nt = os.path.join(base, d1, "nuclassembly_tmp")
        if os.path.isdir(nt):
            for d2 in os.listdir(nt):
                if os.path.isfile(os.path.join(nt, d2, "pref_0.dbtype")):
                    return os.path.join(nt, d2)
    return None


needs_unsafe_golden = pytest.mark.skipif(
    _golden_unsafe_tmp() is None,
    reason="reference --unsafe golden run not available")


class _C:
    def __init__(self, qstart, qend, qlen, tstart, tend, tlen, aln_len,
                 tkey=1):
        self.qstart, self.qend, self.qlen = qstart, qend, qlen
        self.tstart, self.tend, self.tlen = tstart, tend, tlen
        self.aln_len, self.tkey = aln_len, tkey


def test_consensus_caller_safe_is_query_only():
    q = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    cons = consensus_caller([], lambda c: None, q, 8, unsafe=False,
                            min_cov=5)
    assert bytes(cons[8:16]) == b"ACGTACGT"
    assert (cons[:8] == ord("N")).all() and (cons[16:] == ord("N")).all()


def test_consensus_caller_unsafe_majority_and_ties():
    q = np.frombuffer(b"ACGTACGTAC", dtype=np.uint8)
    L = 10
    # right-extending candidates: tstart==0, qend==L-1, overhang of 4
    t1 = np.frombuffer(b"ACGTACGGGG", dtype=np.uint8)   # ext GGGG
    t2 = np.frombuffer(b"ACGTACGGGG", dtype=np.uint8)
    t3 = np.frombuffer(b"ACGTACGTTT", dtype=np.uint8)   # ext disagrees
    cands = [_C(4, 9, L, 0, 5, 10, 6, tkey=i) for i in range(3)]
    tgt = {0: t1, 1: t2, 2: t3}
    cons = consensus_caller(cands, lambda c: tgt[c.tkey], q, L,
                            unsafe=True, min_cov=3)
    # middle third overridden by query regardless of votes
    assert bytes(cons[L:2 * L]) == b"ACGTACGTAC"
    # overhang positions: coverage 3 at 2L..2L+3; votes G,G,T / G,G,T...
    # t bases at pos 6..9 vote at consensus 2L-4+... -> majority G where
    # 2 G vs 1 T
    over = cons[2 * L:2 * L + 4]
    assert bytes(over[:3]).count(b"G"[0]) >= 1


@needs_unsafe_golden
def test_unsafe_read_phase_iteration_bit_exact(example_reads, damage_model):
    """Iteration 0 of the read phase with --unsafe must byte-match the
    reference's assembly_reads_0 from the --unsafe golden run."""
    gold = SeqDB.read_mmseqs(os.path.join(_golden_unsafe_tmp(),
                                          "assembly_reads_0"))
    pref = kmermatcher(example_reads, 20, 200, 0.2, False)
    aln = rescorediagonal(example_reads, pref, seq_id_thr=0.9)
    corr = correction(example_reads, aln, damage_model, 0.99, 0.9)
    asm = read_assembly(corr, aln, damage_model, 0.9, 0.99, 0.5, 0.85,
                        0.0625, 300000, unsafe=True, min_cov_safe=5)
    assert len(asm) == len(gold)
    for i in range(len(asm)):
        assert int(asm.keys[i]) == int(gold.keys[i])
        assert bytes(asm.seq_bytes(i)) == bytes(gold.seq_bytes(i)), i
        assert bool(asm.ext[i]) == bool(gold.ext[i])
