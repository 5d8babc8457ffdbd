"""Contig-phase tests: Beta comparator, cyclecheck, and full-pipeline golden
parity (uses work/example_tmp checkpoints when present to avoid re-running
the 3-minute pipeline)."""
import os

import numpy as np
import pytest

from carpedeam_tpu.damage import DamageModel
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.stages.contig_merge import _beta_less, _Cand
from carpedeam_tpu.stages.cyclecheck import check_one, cyclecheck

from conftest import golden_tmp, needs_golden

GOLDEN_BASE = "/root/repo/.golden/tmp2/16650126067619639924"
CKPT = "/root/repo/work/example_tmp"


def _cand(aln_len_cons, deam_match):
    c = _Cand(0, 0, 0, 0, 0, 0, 0, 0, False)
    c.aln_len_cons = aln_len_cons
    c.deam_match = deam_match
    return c


def test_beta_comparator_orders_by_mismatch_rate():
    clean = _cand(1000, 995.0)   # ~5 damage-corrected mismatches
    dirty = _cand(1000, 900.0)   # ~100 mismatches
    # priority queue: comp(a, b) == "a worse than b"
    assert _beta_less(dirty, clean)
    assert not _beta_less(clean, dirty)


def test_beta_comparator_tie_by_length():
    short = _cand(100, 99.0)
    long_ = _cand(1000, 990.0)
    # similar rates -> longer overlap wins
    assert _beta_less(short, long_) or not _beta_less(long_, short)


def test_cyclecheck_detects_circular():
    rng = np.random.default_rng(7)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    circular = (unit * 2 + unit[:80]).encode()  # heavily terminally redundant
    linear = "".join("ACGT"[i] for i in rng.integers(0, 4, 680)).encode()
    res = check_one(np.frombuffer(circular, dtype=np.uint8))
    assert res is not None and len(res) < len(circular)
    assert check_one(np.frombuffer(linear, dtype=np.uint8)) is None


def test_cyclecheck_split():
    rng = np.random.default_rng(8)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    db = SeqDB.from_sequences([unit * 2 + unit[:100],
                               "".join("ACGT"[i] for i in rng.integers(0, 4, 700))])
    cyc, none_cyc = cyclecheck(db)
    assert len(cyc) == 1 and len(none_cyc) == 1
    assert int(cyc.keys[0]) == 0 and int(none_cyc.keys[0]) == 1


@needs_golden
def test_golden_full_nuclassemble():
    """Full 10-iteration nuclassemble == reference nuclassembly DB.

    Self-sufficient: runs the pipeline when work/example_tmp checkpoints
    are absent (~4 s on this host) and resumes from them when present."""
    from carpedeam_tpu.params import Params, apply_nuclassemble_defaults
    from carpedeam_tpu.pipeline import nuclassemble
    db = SeqDB.from_fastx("/root/reference/example/test_data.fq.gz")
    dm = DamageModel.load("/root/reference/example/dhigh")
    p = apply_nuclassemble_defaults(Params()).copy(
        num_iterations=10, num_iterations_reads=5, max_seq_len=200000)
    result, cycle_keys, _ = nuclassemble(db, p, dm, tmp_dir=CKPT)
    gold = SeqDB.read_mmseqs(os.path.join(GOLDEN_BASE, "nuclassembly"))
    gmap = {int(gold.keys[j]): j for j in range(len(gold))}
    assert len(result) == len(gold)
    for i in range(len(result)):
        j = gmap[int(result.keys[i])]
        assert result.seq_str(i) == gold.seq_str(j)


def test_beta_comparator_float_lgamma_overloads():
    """Pins the 5M-scale divergence fix: the reference's Beta-queue
    comparator (CompareNuclResultByScoreContigs, ancientContigsResults.
    cpp:25-70) computes lgamma/log of its FLOAT alpha/beta sums as
    lgammaf/logf (libgab.h `using namespace std`).  For the diverging
    pair from the 5M bisection — a perfect alc=54 candidate vs an
    alc=111/deamMatch=110.59506 candidate — the float-lgamma posterior
    is p = 0.5500137 (> 0.55 -> comparator false) while double lgamma
    gives 0.5499705 (gray zone -> alnLengthCons tie-break -> true),
    which flipped a merge pick and one final contig."""
    import ctypes

    import numpy as np

    from carpedeam_tpu import native
    from carpedeam_tpu.stages.contig_merge import _Cand, _beta_less

    perfect = _Cand(1, 0, 53, 60, 0, 53, 67, 54, False)
    perfect.deam_match, perfect.aln_len_cons = 54.0, 54
    imp = _Cand(2, 0, 110, 260, 84, 194, 195, 111, False)
    imp.deam_match, imp.aln_len_cons = 110.59506225585938, 111
    # reference semantics: p > 0.55 for (perfect54, imp) -> NOT less
    assert _beta_less(perfect, imp) is False
    assert _beta_less(imp, perfect) is False
    lib = native.get_lib()
    if lib is not None:
        assert lib.beta_less_probe(54, 54.0, 111, 110.59506225585938) == 0
        assert lib.beta_less_probe(111, 110.59506225585938, 54, 54.0) == 0
    # double-lgamma would have ordered them: document the distinction
    import math
    b1, b2 = np.float32(55.0), np.float32(111.59506225585938)
    a1 = np.float32(1.0)
    log_c_f64 = (math.lgamma(float(b1 + b2)) + math.lgamma(float(a1 + b1))) \
        - (math.lgamma(float(a1 + b1 + b2)) + math.lgamma(float(b1)))
    assert math.exp(log_c_f64) < 0.55          # double path: gray zone
