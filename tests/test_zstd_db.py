"""zstd-compressed reference DB reading (DBReader compression=COMPRESSED;
lib/mmseqs/src/commons/DBReader.cpp:511-538, dbtype bit 31 :1018).

Entry layout quirks pinned here: the .index length column holds the
UNCOMPRESSED record length while the physical entry is u32 cSize +
payload + flag byte, and records that did not shrink are stored
verbatim with a nonzero flag byte.
"""
import os
import subprocess

import numpy as np
import pytest

from carpedeam_tpu.io import SeqDB

REF_BIN = "/root/repo/.refbuild/src/carpedeam"
EXAMPLE = "/root/reference/example/test_data.fq.gz"


def _write_compressed_db(tmp_path, seqs):
    """Write a compressed DB in the reference's on-disk format."""
    import zstandard
    cctx = zstandard.ZstdCompressor()
    data = bytearray()
    index = []
    for key, s in enumerate(seqs):
        rec = s.encode() + b"\n\x00"
        comp = cctx.compress(rec)
        off = len(data)
        if len(comp) < len(rec):
            data += np.uint32(len(comp)).tobytes() + comp + b"\x00"
        else:
            data += np.uint32(len(rec)).tobytes() + rec + b"\x01"
        index.append(f"{key}\t{off}\t{len(rec)}\t0")
    base = os.path.join(tmp_path, "zdb")
    with open(base, "wb") as fh:
        fh.write(bytes(data))
    with open(base + ".index", "w") as fh:
        fh.write("\n".join(index) + "\n")
    with open(base + ".dbtype", "wb") as fh:
        fh.write(np.int32(np.uint32(1) | np.uint32(1 << 31)).tobytes())
    return base


def test_compressed_db_roundtrip(tmp_path):
    seqs = ["ACGT" * 40, "A", "GATTACA" * 3, "N" * 10, "ACGT"]
    base = _write_compressed_db(str(tmp_path), seqs)
    db = SeqDB.read_mmseqs(base)
    assert [db.seq_str(i) for i in range(len(db))] == seqs


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built")
def test_compressed_db_golden(tmp_path):
    """`createdb --compressed 1` output reads back identical to the
    uncompressed ingest of the same FASTQ."""
    base = os.path.join(str(tmp_path), "refdb")
    subprocess.run([REF_BIN, "createdb", EXAMPLE, base,
                    "--compressed", "1"], check=True,
                   capture_output=True)
    assert SeqDB._read_dbtype(base) < 0  # bit 31 actually set
    db_c = SeqDB.read_mmseqs(base)
    db_u = SeqDB.from_fastx(EXAMPLE)
    assert len(db_c) == len(db_u)
    assert sorted(db_c.seq_str(i) for i in range(len(db_c))) \
        == sorted(db_u.seq_str(i) for i in range(len(db_u)))


def test_compressed_write_reads_back():
    """SeqDB.write_mmseqs(compressed=True) -> SeqDB.read_mmseqs is the
    identity (covers both the zstd path and the <60-byte raw path)."""
    import tempfile
    seqs = [b"ACGT" * 50, b"A" * 10, b"GATTACA" * 30, b"ACGT",
            b"N" * 70]
    db = SeqDB.from_sequences(seqs,
                              ext=np.array([1, 0, 1, 0, 0], dtype=bool))
    with tempfile.TemporaryDirectory() as td:
        base = os.path.join(td, "cdb")
        db.write_mmseqs(base, compressed=True)
        assert SeqDB._read_dbtype(base) < 0        # bit 31 set
        back = SeqDB.read_mmseqs(base)
        assert [back.seq_str(i).encode() for i in range(len(back))] \
            == seqs
        assert np.array_equal(back.ext, db.ext)


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built")
def test_compressed_write_golden_reference_reads(tmp_path):
    """Round-trip through the REFERENCE binary: our --compressed write
    must be readable by the reference's DBReader (driven via
    convert2fasta on the DB + a header DB)."""
    seqs = [b"ACGTACGTAA" * 12, b"TTGACA" * 25, b"ACG",
            b"CGATTACA" * 9]
    db = SeqDB.from_sequences(seqs)
    base = os.path.join(str(tmp_path), "ours")
    db.write_mmseqs(base, compressed=True)
    hdr = SeqDB.from_sequences([f"s{i}".encode() for i in range(len(seqs))],
                               keys=db.keys.copy())
    hdr.write_mmseqs(base + "_h", dbtype=12)
    out_fa = os.path.join(str(tmp_path), "out.fasta")
    subprocess.run([REF_BIN, "convert2fasta", base, out_fa], check=True,
                   capture_output=True)
    got = []
    with open(out_fa) as fh:
        cur = None
        for line in fh:
            if line.startswith(">"):
                if cur is not None:
                    got.append(cur)
                cur = ""
            else:
                cur += line.strip()
        if cur is not None:
            got.append(cur)
    assert got == [s.decode() for s in seqs]
