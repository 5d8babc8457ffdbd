"""Native greedy-rounds engine (native/greedy.cpp) vs the Python oracle.

The C++ engine must reproduce the per-query greedy splice loops of
stages/read_assembly.py and stages/contig_merge.py byte-for-byte,
including priority-queue tie order, f32 identity ratios and np.sum
pairwise likelihood summation."""
import os

import numpy as np
import pytest

from carpedeam_tpu.damage import DamageModel
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.stages.correction import correction
from carpedeam_tpu.stages.contig_merge import contig_merge
from carpedeam_tpu.stages.read_assembly import read_assembly
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal


@pytest.fixture(scope="module")
def example_world():
    reads = SeqDB.from_fastx("/root/reference/example/test_data.fq.gz",
                             shuffle=True)
    db = reads.select(np.arange(0, len(reads), 5))     # 3000 reads
    dm = DamageModel.load("/root/reference/example/dhigh")
    pref = kmermatcher(db, 20, 200, 0.2, False)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    corr = correction(db, aln, dm, 0.99, 0.9)
    return corr, aln, dm


def _run_read_assembly(corr, aln, dm, native: bool):
    os.environ["CARPEDEAM_GREEDY_NATIVE"] = "1" if native else "0"
    try:
        return read_assembly(corr, aln, dm, 0.9, 0.99, 0.5, 0.85, 0.0625,
                             300000, False, 5)
    finally:
        os.environ.pop("CARPEDEAM_GREEDY_NATIVE", None)


def test_native_read_rounds_match_python(example_world):
    corr, aln, dm = example_world
    a = _run_read_assembly(corr, aln, dm, native=False)
    b = _run_read_assembly(corr, aln, dm, native=True)
    assert np.array_equal(a.lengths, b.lengths)
    assert np.array_equal(a.ext, b.ext)
    assert bytes(a.data) == bytes(b.data)


def test_native_read_rounds_respect_max_seq_len(example_world):
    corr, aln, dm = example_world
    os.environ["CARPEDEAM_GREEDY_NATIVE"] = "0"
    try:
        a = read_assembly(corr, aln, dm, 0.9, 0.99, 0.5, 0.85, 0.0625,
                          120, False, 5)
    finally:
        os.environ.pop("CARPEDEAM_GREEDY_NATIVE", None)
    os.environ["CARPEDEAM_GREEDY_NATIVE"] = "1"
    try:
        b = read_assembly(corr, aln, dm, 0.9, 0.99, 0.5, 0.85, 0.0625,
                          120, False, 5)
    finally:
        os.environ.pop("CARPEDEAM_GREEDY_NATIVE", None)
    assert bytes(a.data) == bytes(b.data)


@pytest.fixture(scope="module")
def contig_world(example_world):
    """Assemble two read iterations to get extendable contigs, then a
    contig-phase alignment set."""
    corr, aln, dm = example_world
    db = _run_read_assembly(corr, aln, dm, native=False)
    pref = kmermatcher(db, 22, 200, 0.2, True)
    aln2 = rescorediagonal(db, pref, seq_id_thr=0.99)
    corr2 = correction(db, aln2, dm, 0.99, 0.99)
    return corr2, aln2, dm


def _run_contig_merge(corr, aln, dm, native: bool):
    os.environ["CARPEDEAM_GREEDY_NATIVE"] = "1" if native else "0"
    try:
        return contig_merge(corr, aln, dm, 0.99, 0.99, 300000, False, 5)
    finally:
        os.environ.pop("CARPEDEAM_GREEDY_NATIVE", None)


def test_native_contig_rounds_match_python(contig_world):
    corr, aln, dm = contig_world
    a = _run_contig_merge(corr, aln, dm, native=False)
    b = _run_contig_merge(corr, aln, dm, native=True)
    assert np.array_equal(a.lengths, b.lengths)
    assert np.array_equal(a.ext, b.ext)
    assert bytes(a.data) == bytes(b.data)
