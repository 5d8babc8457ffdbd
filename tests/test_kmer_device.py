"""Device kmermatcher (ops/kmer_tpu.py) parity vs the host oracle.

The host kmer/matcher.py is itself validated bit-exact against the
reference binary's prefilter DBs; these tests pin the device path to the
host output bit-for-bit, including the subsampling-walk quirks, strand
reconciliation and the look-ahead-overruns-group scan.
"""
import numpy as np
import pytest

from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer import packing as pk
from carpedeam_tpu.kmer import xxh64 as hx
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.ops import u64
from carpedeam_tpu.ops.kmer_tpu import kmermatcher_device

EXAMPLE = "/root/reference/example/test_data.fq.gz"

PREF_FIELDS = ("qkey", "tkey", "score", "diag", "starts", "qkeys", "qext")


def assert_prefdb_equal(a, b):
    for f in PREF_FIELDS:
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert x.shape == y.shape, f"{f}: {x.shape} vs {y.shape}"
        assert (x == y).all(), f"{f}: {np.nonzero(x != y)[0][:5]}"


def test_u64_ops_bit_exact():
    rng = np.random.default_rng(0)
    old = np.seterr(over="ignore")
    try:
        a = rng.integers(0, 2**64, 20000, dtype=np.uint64)
        b = rng.integers(0, 2**64, 20000, dtype=np.uint64)
        da, db_ = u64.from_np(a), u64.from_np(b)
        assert (u64.to_np(*u64.mul(da, db_)) == a * b).all()
        assert (u64.to_np(*u64.add(da, db_)) == a + b).all()
        for r in (1, 27, 31, 33, 63):
            want = (a << np.uint64(r)) | (a >> np.uint64(64 - r))
            assert (u64.to_np(*u64.rotl(da, r)) == want).all()
        assert (u64.to_np(*u64.xxh64_u64(da, 67))
                == hx.xxh64_u64(a, 67)).all()
        assert (np.asarray(u64.hash16(da, 67)) == hx.hash16(a, 67)).all()
        for k in (20, 22):
            kv = a >> np.uint64(64 - 2 * k)
            got = u64.to_np(*u64.revcomp_kmer(u64.from_np(kv), k))
            assert (got == pk.revcomp_kmer(kv, k)).all()
    finally:
        np.seterr(**old)


@pytest.fixture(scope="module")
def sub_db():
    db = SeqDB.from_fastx(EXAMPLE)
    return db.select(np.arange(1500, dtype=np.int64))


def test_kmermatcher_device_reads_phase(sub_db):
    host = kmermatcher(sub_db, 20, 200, 0.2, False)
    dev = kmermatcher_device(sub_db, 20, 200, 0.2, False)
    assert_prefdb_equal(host, dev)


def test_kmermatcher_device_contig_phase(sub_db):
    """k=22, include-only-extendable, with some sequences extended and a
    couple of long 'contigs' exercising the multi-bucket path."""
    rng = np.random.default_rng(3)
    seqs = [bytes(sub_db.seq_bytes(i)) for i in range(len(sub_db))]
    long1 = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 700))
    long2 = long1[:400] + bytes(
        rng.choice(np.frombuffer(b"ACGT", np.uint8), 300))
    seqs += [long1, long2]
    ext = np.zeros(len(seqs), dtype=bool)
    ext[-2:] = True
    ext[:50] = True
    db = SeqDB.from_sequences(seqs, keys=np.arange(len(seqs),
                                                   dtype=np.uint32), ext=ext)
    host = kmermatcher(db, 22, 200, 0.2, True)
    dev = kmermatcher_device(db, 22, 200, 0.2, True)
    assert_prefdb_equal(host, dev)


def test_kmermatcher_device_with_n_bases():
    """Sequences containing N (X code) and short sequences (< k)."""
    rng = np.random.default_rng(5)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000)
    seqs = []
    for i in range(40):
        s = base[i * 37:i * 37 + 60 + (i % 17)].copy()
        if i % 5 == 0:
            s[10:13] = ord("N")
        seqs.append(bytes(s))
    seqs.append(b"ACGTACGTAC")          # shorter than k
    db = SeqDB.from_sequences(seqs, keys=np.arange(len(seqs),
                                                   dtype=np.uint32))
    host = kmermatcher(db, 20, 60, 0.2, False)
    dev = kmermatcher_device(db, 20, 60, 0.2, False)
    assert_prefdb_equal(host, dev)
