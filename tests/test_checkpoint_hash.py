"""Checkpoint dirs are keyed by a parameter+input hash: re-running with
a changed flag on a warm tmp dir must NOT resume stale stages (the
reference's par.hashParameter tmp naming,
GuidedNuclassembler.cpp:106-110)."""
import numpy as np

from carpedeam_tpu.damage import DamageModel
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.params import Params
from carpedeam_tpu.pipeline import nuclassemble


def _world():
    reads = SeqDB.from_fastx("/root/reference/example/test_data.fq.gz",
                             shuffle=True)
    db = reads.select(np.arange(0, len(reads), 10))    # 1500 reads
    dm = DamageModel.load("/root/reference/example/dhigh")
    return db, dm


def test_changed_flag_does_not_resume_stale(tmp_path):
    db, dm = _world()
    tmp = str(tmp_path / "ck")
    p2 = Params(num_iterations=2, num_iterations_reads=1)
    p3 = Params(num_iterations=3, num_iterations_reads=2)

    warm2, _, _ = nuclassemble(db, p2, dm, tmp_dir=tmp)
    # re-run with different iteration counts on the SAME tmp dir: the
    # hash-keyed subdir must isolate it from the p2 checkpoints
    got3, _, _ = nuclassemble(db, p3, dm, tmp_dir=tmp)
    fresh3, _, _ = nuclassemble(db, p3, dm, tmp_dir=None)
    assert np.array_equal(got3.keys, fresh3.keys)
    assert bytes(got3.data) == bytes(fresh3.data)

    # and the original parameterisation still resumes its own checkpoints
    again2, _, _ = nuclassemble(db, p2, dm, tmp_dir=tmp)
    assert bytes(again2.data) == bytes(warm2.data)


def test_hash_sensitive_to_params_and_input():
    db, _ = _world()
    p = Params()
    h0 = p.hash(len(db), int(db.lengths.sum()))
    assert h0 == p.copy().hash(len(db), int(db.lengths.sum()))
    assert h0 != p.copy(num_iterations=9).hash(len(db),
                                               int(db.lengths.sum()))
    assert h0 != p.hash(len(db) - 1, int(db.lengths.sum()))
    # use_device is an implementation choice, not an assembly parameter
    assert h0 == p.copy(use_device="0").hash(len(db),
                                             int(db.lengths.sum()))
