"""Parity of the vectorised/native linclust stages vs the Python oracles.

The production path (native/linclust_kernels.cpp + vectorised
thresholding, np.minimum.at clustering) must match the per-record
oracle loops record-for-record, including the gated banded rescue:
the gate only skips pairs that can never reach the coverage threshold
within the ±64 band, so accept sets are identical by construction —
asserted here on randomized inputs with indels, reverse strands and
wrapped diagonals.
"""
import numpy as np
import pytest

from carpedeam_tpu.io import SeqDB
from carpedeam_tpu.kmer.matcher import kmermatcher
from carpedeam_tpu.stages.linclust import (
    _align_filter_py, _hamming_wrapped_rescore_py, align_filter,
    greedy_incremental_cluster, hamming_wrapped_rescore, linclust)
from carpedeam_tpu import native


def _random_db(seed, n=60, dup_frac=0.5):
    """Random contig set with near-duplicates (subst + indels), reverse
    complements and short spurious sequences."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    seqs = []
    originals = []
    for i in range(n):
        if originals and rng.random() < dup_frac:
            src = originals[rng.integers(len(originals))]
            arr = bytearray(src)
            # substitutions
            for _ in range(rng.integers(0, 4)):
                arr[rng.integers(len(arr))] = bases[rng.integers(4)]
            # occasional indel
            if rng.random() < 0.5 and len(arr) > 40:
                p = int(rng.integers(5, len(arr) - 5))
                if rng.random() < 0.5:
                    del arr[p]
                else:
                    arr.insert(p, bases[rng.integers(4)])
            # occasional truncation (sub-coverage candidates)
            if rng.random() < 0.3:
                arr = arr[:int(len(arr) * rng.uniform(0.3, 0.95))]
            s = bytes(arr)
            if rng.random() < 0.5:   # reverse complement
                s = bytes(comp[b] for b in reversed(s))
        else:
            L = int(rng.integers(60, 400))
            s = bytes(bases[rng.integers(0, 4, L)])
            originals.append(s)
        seqs.append(s.decode())
    return SeqDB.from_sequences(seqs)


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wrapped_rescore_matches_oracle(seed):
    db = _random_db(seed)
    pref = kmermatcher(db, 20, 200, 0.2, include_only_extendable=False,
                       cov_mode=1, cov_thr=0.99)
    got = hamming_wrapped_rescore(db, pref, 0.97, 0.99, 1)
    exp = _hamming_wrapped_rescore_py(db, pref, 0.97, 0.99, 1)
    np.testing.assert_array_equal(got.qkey, exp.qkey)
    np.testing.assert_array_equal(got.tkey, exp.tkey)
    np.testing.assert_array_equal(got.score, exp.score)
    np.testing.assert_array_equal(got.diag, exp.diag)
    np.testing.assert_array_equal(got.starts, exp.starts)
    np.testing.assert_array_equal(got.qkeys, exp.qkeys)


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
@pytest.mark.parametrize("seed,cov_mode", [(0, 1), (1, 0), (2, 2)])
def test_align_filter_matches_oracle(seed, cov_mode):
    db = _random_db(seed + 10)
    pref = kmermatcher(db, 20, 200, 0.2, include_only_extendable=False,
                       cov_mode=1, cov_thr=0.99)
    got = align_filter(db, pref, 0.97, 0.99, cov_mode, 0.001)
    exp = _align_filter_py(db, pref, 0.97, 0.99, cov_mode, 0.001)
    np.testing.assert_array_equal(got.qkey, exp.qkey)
    np.testing.assert_array_equal(got.tkey, exp.tkey)
    np.testing.assert_array_equal(got.score, exp.score)
    np.testing.assert_array_equal(got.diag, exp.diag)
    np.testing.assert_array_equal(got.starts, exp.starts)
    np.testing.assert_array_equal(got.qkeys, exp.qkeys)


def test_greedy_cluster_matches_sequential_semantics():
    """np.minimum.at + self-assign-values == the reference's sequential
    edge sweep + correction pass (ClusteringAlgorithms.cpp:271-332)."""
    rng = np.random.default_rng(7)
    db = _random_db(3, n=40)
    pref = kmermatcher(db, 20, 200, 0.2, include_only_extendable=False,
                       cov_mode=1, cov_thr=0.99)
    got = greedy_incremental_cluster(db, pref)

    # independent sequential re-implementation
    from carpedeam_tpu.stages.linclust import length_rank_ids
    rank = length_rank_ids(db)
    key2id = db.key_to_id()
    n = len(db)
    assigned = np.arange(n, dtype=np.int64)
    for qi in range(len(pref.qkeys)):
        q_rank = rank[key2id[int(pref.qkeys[qi])]]
        sl = pref.records_for(qi)
        for r in range(sl.start, sl.stop):
            m_rank = rank[key2id[int(pref.tkey[r])]]
            if q_rank < assigned[m_rank]:
                assigned[m_rank] = q_rank
    for i in range(n):
        a = assigned[i]
        if assigned[a] != a:
            assigned[a] = a
    rank_to_key = {int(rank[i]): int(db.keys[i]) for i in range(n)}
    exp = {}
    for i in range(n):
        exp.setdefault(rank_to_key[int(assigned[i])],
                       []).append(rank_to_key[i])
    exp = {k: [k] + sorted(m for m in v if m != k) for k, v in exp.items()}
    assert got == exp


def test_linclust_end_to_end_unchanged():
    """Full linclust on a mixed duplicate set: representative count is
    below input count and every input key is clustered exactly once."""
    db = _random_db(11, n=80)
    clusters = linclust(db, 0.97, 0.99, 1)
    all_members = [m for v in clusters.values() for m in v]
    assert sorted(all_members) == sorted(int(k) for k in db.keys)
    assert len(clusters) < len(db)
