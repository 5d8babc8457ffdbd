"""Device-kernel vs host-oracle parity (the oracles are bit-exact vs the
reference binary, so device==oracle means device==reference)."""
import numpy as np
import pytest

from carpedeam_tpu.damage import DamageModel
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.ops.correction_tpu import correction_tpu
from carpedeam_tpu.ops.rescore_tpu import rescorediagonal_tpu
from carpedeam_tpu.stages.correction import correction
from carpedeam_tpu.stages.rescorediagonal import rescorediagonal


@pytest.fixture(scope="module")
def small_world(example_reads, damage_model):
    """A 600-read subsample of the example workload with real overlaps."""
    db = example_reads.select(np.arange(0, len(example_reads), 25))
    pref = kmermatcher(db, 20, 200, 0.2, False)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    return db, pref, aln


def test_rescore_device_matches_oracle(small_world):
    db, pref, aln = small_world
    dev = rescorediagonal_tpu(db, pref, seq_id_thr=0.9)
    assert dev.to_text() == aln.to_text()


def test_correction_device_matches_oracle(small_world, damage_model):
    db, _, aln = small_world
    ora = correction(db, aln, damage_model, 0.99, 0.9)
    dev = correction_tpu(db, aln, damage_model, 0.99, 0.9)
    diffs = [i for i in range(len(db))
             if bytes(ora.seq_bytes(i)) != bytes(dev.seq_bytes(i))]
    assert diffs == []


def test_pipeline_device_path_matches_host(example_reads, damage_model):
    """3 assembly iterations (2 read + 1 contig phase) end-to-end with the
    device stage implementations must byte-match the host-oracle path."""
    from carpedeam_tpu.params import Params
    from carpedeam_tpu.pipeline import nuclassemble

    db = example_reads.select(np.arange(0, len(example_reads), 25))
    p = Params(num_iterations=3, num_iterations_reads=2, min_contig_len=0,
               use_device="0")
    r0, cyc0, _ = nuclassemble(db, p, damage_model)
    r1, cyc1, _ = nuclassemble(db, p.copy(use_device="1"), damage_model)
    assert len(r0) == len(r1)
    assert cyc0 == cyc1
    for i in range(len(r0)):
        assert r0.keys[i] == r1.keys[i]
        assert bytes(r0.seq_bytes(i)) == bytes(r1.seq_bytes(i))


def test_correction_device_exact_at_ry_threshold(damage_model):
    """Regression: a record sitting exactly at the dynamic RY threshold
    (49/50 matches vs floor(0.98*1000)/1000) must be kept on device exactly
    as numpy's IEEE f32 division keeps it — XLA's reciprocal-multiply
    division is 1 ulp low and used to drop it."""
    rng = np.random.default_rng(7)
    L = 60
    q = rng.integers(0, 4, L)
    # target overlaps q[0:50] with exactly one RY-breaking mismatch
    t = q[:50].copy()
    t[25] = {0: 1, 1: 0, 2: 3, 3: 2}[int(t[25])]  # A<->C / G<->T breaks RY
    enc = np.frombuffer(b"ACGT", dtype=np.uint8)
    db = SeqDB.from_sequences([enc[q].tobytes(), enc[t].tobytes()])
    pref = kmermatcher(db, 20, 200, 0.2, False)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    ora = correction(db, aln, damage_model, 0.99, 0.9)
    dev = correction_tpu(db, aln, damage_model, 0.99, 0.9)
    for i in range(len(db)):
        assert bytes(ora.seq_bytes(i)) == bytes(dev.seq_bytes(i))


def test_rescore_pallas_matches_oracle(small_world):
    """The Pallas kernel (interpret mode on CPU) must reproduce the host
    oracle record-for-record, like the XLA kernel."""
    from carpedeam_tpu.ops.rescore_pallas import rescorediagonal_pallas

    db, pref, aln = small_world
    dev = rescorediagonal_pallas(db, pref, seq_id_thr=0.9)
    assert dev.to_text() == aln.to_text()


def test_rescore_pallas_raw_outputs_match_xla_kernel(small_world):
    """Raw per-pair kernel outputs (before host-side filtering) must be
    identical between the Pallas and XLA formulations for every field,
    including no-hit rows that the filters would drop."""
    import numpy as np

    from carpedeam_tpu.ops.rescore_pallas import (rescore_pairs_pallas,
                                                   unpack_rescore)
    from carpedeam_tpu.ops.rescore_tpu import (pack_sequences,
                                               rescore_pairs_device)
    from carpedeam_tpu.utils import bucket_len, bucket_pairs

    db, pref, _ = small_world
    planes, lengths = pack_sequences(db, max_len=bucket_len(
        int(db.lengths.max())))
    key2id = db.key_to_id()
    n = len(pref.qkey)
    pad = bucket_pairs(n)
    qidx = np.zeros(pad, np.int32)
    tidx = np.zeros(pad, np.int32)
    diag = np.zeros(pad, np.int32)
    is_rev = np.zeros(pad, bool)
    qidx[:n] = [key2id[int(k)] for k in pref.qkey]
    tidx[:n] = [key2id[int(k)] for k in pref.tkey]
    diag[:n] = pref.diag
    is_rev[:n] = pref.score < 0
    max_len = planes["code"].shape[1]
    a = rescore_pairs_device(planes["code"], planes["sym"],
                             lengths.astype(np.int32), qidx, tidx, diag,
                             is_rev, max_len=max_len)
    pairs = np.zeros((pad, 3), np.int32)
    pairs[:, 0] = qidx | np.where(is_rev, np.int32(-2147483648),
                                  np.int32(0))
    pairs[:, 1] = tidx
    pairs[:, 2] = diag
    packed = np.asarray(rescore_pairs_pallas(
        planes["code"], planes["sym"], lengths.astype(np.int32), pairs,
        max_len=max_len, interpret=True))
    b = unpack_rescore(packed, db.lengths, qidx, tidx, diag)
    for k in a:
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


def test_correction_pallas_matches_oracle(small_world, damage_model):
    """The fused Pallas correction (interpret mode on CPU) must match the
    host oracle byte-for-byte, like the XLA scatter formulation."""
    import carpedeam_tpu.ops.correction_pallas as CP

    db, _, aln = small_world
    ora = correction(db, aln, damage_model, 0.99, 0.9)
    old = CP.NB_BUCKET
    CP.NB_BUCKET = 4          # small grids: interpret mode is slow
    try:
        dev = CP.correction_pallas(db, aln, damage_model, 0.99, 0.9)
    finally:
        CP.NB_BUCKET = old
    diffs = [i for i in range(len(db))
             if bytes(ora.seq_bytes(i)) != bytes(dev.seq_bytes(i))]
    assert diffs == []


def test_correction_pallas_derived_planes_match_fresh_pack(small_world,
                                                           damage_model):
    """return_planes=True must hand back corrected planes identical to a
    fresh pack+upload of the corrected SeqDB (the pipeline substitutes
    them for the extension stage's plane build)."""
    import numpy as np

    import carpedeam_tpu.ops.correction_pallas as CP
    from carpedeam_tpu.ops.rescore_tpu import device_planes
    from carpedeam_tpu.utils import bucket_len

    db, _, aln = small_world
    max_len = bucket_len(min(512, int(db.lengths.max())))
    planes, lengths = device_planes(db, max_len=max_len)
    old = CP.NB_BUCKET
    CP.NB_BUCKET = 4
    try:
        dev, shared = CP.correction_pallas(db, aln, damage_model, 0.99,
                                           0.9, planes=planes,
                                           lengths=lengths,
                                           return_planes=True)
    finally:
        CP.NB_BUCKET = old
    assert shared is not None, "shared planes must derive on this input"
    fresh, fresh_len = device_planes(dev, max_len=max_len)
    assert np.array_equal(np.asarray(shared["lengths"]),
                          np.asarray(fresh_len))
    for k in ("sym", "code", "len"):
        assert np.array_equal(np.asarray(shared["planes"][k]),
                              np.asarray(fresh[k])), k


def test_correction_pallas_heavy_queries_host_fallback(small_world,
                                                       damage_model):
    """Queries with more records than the block's record tile must be
    routed to the per-query host oracle and still match it exactly."""
    import carpedeam_tpu.ops.correction_pallas as CP

    db, _, aln = small_world
    ora = correction(db, aln, damage_model, 0.99, 0.9)
    old_nb, old_tiles = CP.NB_BUCKET, CP._tiles_for
    CP.NB_BUCKET = 4
    CP._tiles_for = lambda L: (8, 8)   # force many heavy queries
    try:
        dev = CP.correction_pallas(db, aln, damage_model, 0.99, 0.9)
    finally:
        CP.NB_BUCKET, CP._tiles_for = old_nb, old_tiles
    diffs = [i for i in range(len(db))
             if bytes(ora.seq_bytes(i)) != bytes(dev.seq_bytes(i))]
    assert diffs == []


def test_correction_pallas_empty_alignment(small_world, damage_model):
    """Regression (ADVICE r1, high): zero surviving records (empty AlnDB)
    crashed build_correction_blocks with an IndexError; must pass through
    every sequence unchanged like the host/XLA paths."""
    from carpedeam_tpu.aligndb import AlnDB
    from carpedeam_tpu.ops.correction_pallas import correction_pallas

    db, _, _ = small_world
    empty = AlnDB.from_arrays(
        qkey=np.zeros(0, np.uint32), qkeys=np.zeros(0, np.uint32),
        starts=np.zeros(1, np.int64),
        **{name: np.zeros(0) for name in
           ("tkey", "score", "seq_id", "eval", "qstart", "qend",
            "qlen", "dbstart", "dbend", "dblen")})
    out = correction_pallas(db, empty, damage_model, 0.99, 0.9)
    assert len(out) == len(db)
    for i in range(len(db)):
        assert bytes(out.seq_bytes(i)) == bytes(db.seq_bytes(i))


def test_lookup_keys_raises_on_stale_key(example_reads):
    """Regression (ADVICE r1, low): stale keys must raise instead of
    silently resolving to the last row via key_id_map's -1 sentinel."""
    db = example_reads.select(np.arange(10))
    rows = db.lookup_keys(db.keys[:5])
    assert np.array_equal(rows, np.arange(5))
    stale = np.array([int(db.keys.max()) + 999], dtype=np.int64)
    with pytest.raises(KeyError):
        db.lookup_keys(stale)
    missing_mid = np.array([int(example_reads.keys[500])], dtype=np.int64)
    if missing_mid[0] not in set(db.keys.tolist()):
        with pytest.raises(KeyError):
            db.lookup_keys(missing_mid)


def test_correction_pallas_long_contig_levels(damage_model):
    """Length-levelled correction: sequences past the 512-wide shared
    plane run in the 2048 device level (not the host fallback) and the
    whole DB matches the host oracle byte-for-byte."""
    import carpedeam_tpu.ops.correction_pallas as CP
    from carpedeam_tpu.kmer.matcher import kmermatcher

    rng = np.random.default_rng(11)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000)
    seqs = []
    # long overlapping "contigs" (700-1500 bp) + short reads on them
    for start, ln in [(0, 1500), (700, 1400), (1600, 900), (2200, 1300),
                      (100, 700), (2900, 1000)]:
        s = genome[start:start + ln].copy()
        mut = rng.integers(0, ln, 5)
        s[mut] = rng.choice(np.frombuffer(b"ACGT", np.uint8), 5)
        seqs.append(bytes(s))
    for _ in range(80):
        start = int(rng.integers(0, 3900))
        ln = int(rng.integers(40, 100))
        seqs.append(bytes(genome[start:start + ln]))
    db = SeqDB.from_sequences(seqs)
    pref = kmermatcher(db, 22, 200, 0.2, True)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    ora = correction(db, aln, damage_model, 0.99, 0.9)
    old = CP.NB_BUCKET
    CP.NB_BUCKET = 4
    calls = []
    real = CP._run_correction_level
    CP._run_correction_level = lambda pl, *a, **k: calls.append(
        pl["sym"].shape[1]) or real(pl, *a, **k)
    try:
        dev = CP.correction_pallas(db, aln, damage_model, 0.99, 0.9)
    finally:
        CP.NB_BUCKET = old
        CP._run_correction_level = real
    assert any(w > 512 for w in calls), calls  # level 2 actually ran
    diffs = [i for i in range(len(db))
             if bytes(ora.seq_bytes(i)) != bytes(dev.seq_bytes(i))]
    assert diffs == []


def test_correction_pallas_chunked_long_contigs(damage_model):
    """Levels above 2048 use the layer-chunked kernel (VMEM linear in
    L); long synthetic contigs through the 4096/8192 device levels must
    match the host oracle byte-for-byte."""
    import numpy as np

    import carpedeam_tpu.ops.correction_pallas as CP
    from carpedeam_tpu.io import SeqDB
    from carpedeam_tpu.kmer.matcher import kmermatcher
    from carpedeam_tpu.stages.correction import correction
    from carpedeam_tpu.stages.rescorediagonal import rescorediagonal

    rng = np.random.default_rng(7)
    base = rng.choice(list(b"ACGT"), size=6000).astype(np.uint8)
    seqs = []
    for _ in range(24):
        lo = rng.integers(0, 2000)
        ln = int(rng.integers(2500, 6000 - lo))
        s = base[lo:lo + ln].copy()
        idx = rng.random(ln) < 0.01
        s[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
        seqs.append(bytes(s))
    db = SeqDB.from_sequences(seqs)
    pref = kmermatcher(db, 22, 200, 0.2, False)
    aln = rescorediagonal(db, pref, seq_id_thr=0.9)
    ora = correction(db, aln, damage_model, 0.99, 0.9)
    old = CP.NB_BUCKET
    CP.NB_BUCKET = 1
    try:
        dev = CP.correction_pallas(db, aln, damage_model, 0.99, 0.9)
    finally:
        CP.NB_BUCKET = old
    changed = sum(bytes(ora.seq_bytes(i)) != bytes(db.seq_bytes(i))
                  for i in range(len(db)))
    assert changed > 0, "fixture must exercise real corrections"
    for i in range(len(db)):
        assert bytes(ora.seq_bytes(i)) == bytes(dev.seq_bytes(i)), i
