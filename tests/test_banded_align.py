"""Banded gapped aligner (linclust `align` stage rescue) tests.

The indel-clustering expectation is pinned against the reference
binary: `carpedeam linclust` on the same three contigs produces
clusters {1: [1, 0], 2: [2]} (verified directly; the 1 bp insertion
halves the ungapped identity, the gapped alignment sees ~0.9997)."""
import numpy as np

from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.ops.banded_align import banded_align
from carpedeam_tpu.stages.linclust import linclust


def codes(s):
    m = {"A": 0, "C": 1, "T": 2, "G": 3, "N": 4}
    return np.array([m[c] for c in s], dtype=np.int8)


def test_banded_align_identity():
    q = codes("ACGTACGTACGTACGTACGT")
    s, qe, te, ident, alen = banded_align(q, q)
    assert (s, qe, te, ident, alen) == (40, 19, 19, 20, 20)


def test_banded_align_mismatch():
    q = codes("ACGTACGTACGTACGTACGT")
    t = q.copy()
    t[10] = (t[10] + 1) % 4
    s, qe, te, ident, alen = banded_align(q, t)
    assert (s, ident, alen) == (35, 19, 20)


def test_banded_align_insertion():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, 200).astype(np.int8)
    t = np.concatenate([a[:100], [2], a[100:]]).astype(np.int8)
    s, qe, te, ident, alen = banded_align(a, t)
    assert ident == 200 and alen == 201          # one gap column
    assert qe == 199 and te == 200


def test_banded_align_deletion():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, 200).astype(np.int8)
    t = np.concatenate([a[:50], a[53:]]).astype(np.int8)
    s, qe, te, ident, alen = banded_align(a, t)
    assert ident == 197 and alen == 200


def test_banded_align_prefix_overlap():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, 200).astype(np.int8)
    s, qe, te, ident, alen = banded_align(a, a[:80])
    assert (qe, te, ident, alen) == (79, 79, 80, 80)


def test_linclust_clusters_indel_pair_like_reference():
    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = rng.choice(bases, 3000)
    ins = np.concatenate([g[:1500], bases[[2]], g[1500:]]).astype(np.uint8)
    c3 = bytes(rng.choice(bases, 2800))
    db = SeqDB.from_sequences([bytes(g), bytes(ins), c3],
                              keys=np.array([0, 1, 2], np.uint32))
    clusters = linclust(db, 0.97, 0.99, 1)
    # pinned against the reference binary's linclust on identical input
    assert clusters == {1: [1, 0], 2: [2]}


def test_banded_align_native_matches_python_oracle():
    """The native C++ fast path (native/banded.cpp) must reproduce the
    NumPy DP exactly — scores, ends, identities, lengths."""
    from carpedeam_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    import carpedeam_tpu.ops.banded_align as ba
    rng = np.random.default_rng(7)
    for trial in range(40):
        nq = int(rng.integers(1, 400))
        nt = int(rng.integers(1, 400))
        q = rng.integers(0, 5, nq).astype(np.uint8)
        # make t a mutated copy of q half the time (realistic near-dups)
        if trial % 2 == 0 and nt <= nq:
            t = q[:nt].copy()
            n_mut = int(rng.integers(0, max(nt // 10, 1)))
            if n_mut:
                idx = rng.integers(0, nt, n_mut)
                t[idx] = rng.integers(0, 4, n_mut).astype(np.uint8)
            if nt > 20:  # small indel
                cut = int(rng.integers(1, nt - 2))
                t = np.concatenate([t[:cut], t[cut + 1:]])
        else:
            t = rng.integers(0, 5, nt).astype(np.uint8)
        nat = native.banded_align_one(q, t, 64, 2, -3, 5, 2)
        # run the pure-Python DP by bypassing the native fast path
        real = native.banded_align_one
        native.banded_align_one = lambda *a, **k: None
        try:
            py = ba.banded_align(q, t)
        finally:
            native.banded_align_one = real
        assert nat == py, (trial, nat, py)
