"""mergereads (FLASH paired-end merging) golden parity vs the reference
binary, on synthetic pairs derived from the example reads.

Pairs are built by splitting each example read into overlapping R1/R2
(R2 reverse-complemented, varying overlap 10..60 incl. below-minimum
cases that must pass through unmerged), with qualities carried from the
original FASTQ — exercising the mismatch-density scan, quality tie
breaks and the unmerged passthrough.
"""
import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.stages.mergereads import mergereads, revcomp_read

EXAMPLE = "/root/reference/example/test_data.fq.gz"
REF_BIN = "/root/repo/.refbuild/src/carpedeam"


def _make_pairs(tmp_path, n=3000):
    """Split example reads into R1/R2 FASTQ files; returns the paths."""
    rng = np.random.default_rng(11)
    r1p = str(tmp_path / "r1.fq")
    r2p = str(tmp_path / "r2.fq")
    made = 0
    with gzip.open(EXAMPLE, "rt") as fh, \
            open(r1p, "w") as f1, open(r2p, "w") as f2:
        while made < n:
            h = fh.readline()
            if not h:
                break
            s = fh.readline().strip()
            fh.readline()
            q = fh.readline().strip()
            L = len(s)
            if L < 40:
                continue
            # overlap target: mixture incl. sub-minimum (unmerged) cases
            ov = int(rng.integers(8, min(61, L - 4)))
            half = (L + ov) // 2
            r1s, r1q = s[:half], q[:half]
            r2s = revcomp_read(
                np.frombuffer(s[L - half:].encode(), np.uint8)).tobytes() \
                .decode()
            r2q = q[L - half:][::-1]
            # occasional mismatches inside the overlap (quality tie-breaks)
            if made % 7 == 0 and half > 10:
                pos = half - 1 - int(rng.integers(0, min(ov, 10)))
                r1s = r1s[:pos] + "ACGT"[int(rng.integers(0, 4))] \
                    + r1s[pos + 1:]
            name = h.strip()[1:].split()[0]
            f1.write(f"@{name}/1\n{r1s}\n+\n{r1q}\n")
            f2.write(f"@{name}/2\n{r2s}\n+\n{r2q}\n")
            made += 1
    return r1p, r2p


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built")
def test_mergereads_golden(tmp_path):
    r1p, r2p = _make_pairs(tmp_path)
    out = str(tmp_path / "merged")
    subprocess.run([REF_BIN, "mergereads", r1p, r2p, out],
                   check=True, capture_output=True)
    gold = SeqDB.read_mmseqs(out)
    ours = mergereads([r1p, r2p])
    assert len(ours) == len(gold), (len(ours), len(gold))
    n_merged = sum(1 for j in range(len(gold)))
    mism = [j for j in range(len(gold))
            if ours.seq_str(j) != gold.seq_str(j)]
    assert not mism, (mism[:5], ours.seq_str(mism[0]), gold.seq_str(mism[0]))


def test_mergereads_unmerged_passthrough(tmp_path):
    """Pairs with no valid overlap keep both reads (R2 reverse-
    complemented), reference key order."""
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", np.uint8)
    r1p, r2p = str(tmp_path / "a1.fq"), str(tmp_path / "a2.fq")
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        for i in range(5):
            s1 = bytes(rng.choice(bases, 50)).decode()
            s2 = bytes(rng.choice(bases, 50)).decode()
            f1.write(f"@p{i}/1\n{s1}\n+\n{'I' * 50}\n")
            f2.write(f"@p{i}/2\n{s2}\n+\n{'I' * 50}\n")
    db = mergereads([r1p, r2p])
    assert len(db) == 10  # all unmerged -> both mates kept
