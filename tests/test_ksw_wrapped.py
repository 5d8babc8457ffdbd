"""Wrapped-scoring banded alignment (native/ksw_wrap.cpp): the ksw2-extz
scalar replica and the linclust wrapped rescue it powers.

Root cause of round 3's "1M +1 extra contig": the guided workflow's
align stage runs with --wrapped-scoring (GuidedNuclassembler.cpp:179),
so overlaps crossing a contig's end-start junction can cluster; our
align_filter had no wrapped path and kept a redundant wrap-overlap
fragment as its own representative.  With the exact replica the full 1M
clustering is identical to the reference (2959/2959 clusters, identical
membership)."""
import os
import subprocess

import numpy as np
import pytest

from carpedeam_tpu import native
from carpedeam_tpu.constants import CHAR_REVCOMP
from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.stages.linclust import linclust

KSW2 = "/root/reference/lib/mmseqs/lib/ksw2"


@pytest.mark.skipif(not os.path.isdir(KSW2),
                    reason="vendored ksw2 not available")
def test_extz_scalar_matches_vendored_ksw2(tmp_path):
    """tools/ksw_golden.cpp: 400 random correlated pairs x both flag
    modes through the VENDORED ksw_extz2_sse vs our scalar replica —
    max score, end coordinates, z-drop flag and full cigars must all be
    identical."""
    exe = str(tmp_path / "ksw_golden")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-I", KSW2,
         "-I", "/root/reference/lib/mmseqs/lib/simde",
         "tools/ksw_golden.cpp", "carpedeam_tpu/native/ksw_wrap.cpp",
         os.path.join(KSW2, "ksw2_extz2_sse.cpp"), "-o", exe],
        check=True, capture_output=True, cwd="/root/repo")
    out = subprocess.run([exe], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout
    assert "800 tests, 0 failures" in out.stdout


def test_wrapped_rescue_clusters_junction_overlap():
    """A reverse-complement fragment spanning a contig's end-start
    junction must cluster into the contig (possible only through the
    wrapped alignment; any single plain diagonal covers at most a piece
    of the fragment)."""
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    S = rng.choice(list(b"ACGT"), size=2000).astype(np.uint8)
    frag_fwd = np.concatenate([S[1300:], S[:680]])   # crosses junction
    frag = CHAR_REVCOMP[frag_fwd][::-1]              # reverse strand
    db = SeqDB.from_sequences([bytes(S), bytes(frag)])
    clusters = linclust(db, 0.97, 0.99, 1)
    assert set(clusters.keys()) == {0}, clusters.keys()
    assert sorted(clusters[0]) == [0, 1]


def test_wrapped_rescue_rejects_weak_junction_overlap():
    """A junction-spanning fragment BELOW the identity threshold must
    stay its own representative (the rescue must not over-accept)."""
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(12)
    S = rng.choice(list(b"ACGT"), size=2000).astype(np.uint8)
    frag = np.concatenate([S[1300:], S[:680]]).copy()
    idx = rng.random(len(frag)) < 0.10               # ~90% identity
    frag[idx] = rng.choice(list(b"ACGT"), size=int(idx.sum()))
    db = SeqDB.from_sequences([bytes(S), bytes(frag)])
    clusters = linclust(db, 0.97, 0.99, 1)
    assert set(clusters.keys()) == {0, 1}
