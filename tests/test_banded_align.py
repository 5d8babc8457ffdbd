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


def test_traceback_realizes_score_on_multi_column_gaps():
    """The E/F gap-state bits must walk gap RUNS consistently with the
    affine score: against a brute-force unbanded Gotoh (band 64 covers
    everything at these sizes), the banded score is optimal, and the
    reported (n_ident, aln_len) must be realizable: score <=
    match*n_ident + mismatch*(aligned - n_ident) for the walked path
    never holds with inflated identity counts."""
    import numpy as np

    from carpedeam_tpu.ops.banded_align import banded_align

    rng = np.random.default_rng(7)
    M, X, GO, GE = 2, -3, 5, 2

    def brute(q, t):
        nq, nt = len(q), len(t)
        NEG = -10**8
        H = np.full((nq + 1, nt + 1), NEG, np.int64)
        E = np.full_like(H, NEG)
        F = np.full_like(H, NEG)
        H[0, 0] = 0
        for j in range(1, nt + 1):
            E[0, j] = max(H[0, j - 1] - GO - GE, E[0, j - 1] - GE)
            H[0, j] = E[0, j]
        for i in range(1, nq + 1):
            for j in range(0, nt + 1):
                if j > 0:
                    E[i, j] = max(H[i, j - 1] - GO - GE, E[i, j - 1] - GE)
                F[i, j] = max(H[i - 1, j] - GO - GE, F[i - 1, j] - GE)
                s = M if (j > 0 and q[i - 1] == t[j - 1]
                          and q[i - 1] < 4) else X
                dg = H[i - 1, j - 1] + s if j > 0 else NEG
                H[i, j] = max(dg, E[i, j], F[i, j])
        # semi-global end: end of q or end of t
        best = NEG
        for i in range(0, nq + 1):
            best = max(best, H[i, nt])
        for j in range(1, nt + 1):
            best = max(best, H[nq, j])
        return best

    for trial in range(25):
        nq = int(rng.integers(10, 60))
        q = rng.integers(0, 4, nq).astype(np.uint8)
        # target: q with random multi-base indels + substitutions
        t = []
        i = 0
        while i < nq:
            r = rng.random()
            if r < 0.06:                       # multi-base deletion
                i += int(rng.integers(2, 5))
            elif r < 0.12:                     # multi-base insertion
                t.extend(rng.integers(0, 4, int(rng.integers(2, 5))))
            else:
                b = int(q[i])
                if rng.random() < 0.05:
                    b = (b + 1) % 4
                t.append(b)
                i += 1
        t = np.array(t, np.uint8)
        if len(t) == 0:
            continue
        score, qe, te, n_ident, aln_len = banded_align(q, t)
        assert score == max(brute(q, t), 0), (trial, q, t)
        if score > 0:
            assert 0 <= n_ident <= aln_len
            # every non-identity column contributes negatively, so a
            # walked path can never report fewer identities than the
            # score implies
            assert score <= M * n_ident
