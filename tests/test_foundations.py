"""Unit tests for alphabet constants, damage model, hashing, packing, evalue."""
import numpy as np
import pytest

from carpedeam_tpu import constants as C
from carpedeam_tpu import evalue
from carpedeam_tpu.damage import DamageModel, layer_index, seq_error_profile
from carpedeam_tpu.kmer import packing
from carpedeam_tpu.kmer.xxh64 import hash16, util_hash_codes, util_hash_codes_batch, xxh64_u64


# --------------------------------------------------------------------- alphabet
def test_char_codes():
    assert [C.CHAR_TO_CODE[ord(c)] for c in "ACTG"] == [0, 1, 2, 3]
    assert C.CHAR_TO_CODE[ord("N")] == 4
    assert C.CHAR_TO_CODE[ord("a")] == 0
    assert C.CHAR_TO_CODE[ord("U")] == 2  # U -> T
    assert C.CHAR_TO_CODE[ord("R")] == 3  # R -> G
    assert C.CHAR_TO_CODE[ord("Y")] == 1  # Y -> C


def test_char_revcomp():
    s = np.frombuffer(b"ACGTN", dtype=np.uint8)
    rc = C.CHAR_REVCOMP[s]
    assert rc.tobytes() == b"TGCAN"


def test_sub_matrix():
    assert C.SUB_MATRIX[0, 0] == 2 and C.SUB_MATRIX[0, 1] == -3
    assert C.SUB_MATRIX[4, 4] == -3  # X vs X is a mismatch
    assert C.CHAR_SCORE[ord("A"), ord("a")] == 2
    assert C.CHAR_SCORE[ord("N"), ord("N")] == -3


# ----------------------------------------------------------------------- damage
def test_damage_profile_parse(damage_model):
    m = damage_model
    # 5' layer 0: C->T = 0.329405 (example/dhigh5p.prof row 1)
    assert m.fwd[0, 1, 3] == pytest.approx(0.329405)
    assert m.fwd[0, 1, 1] == pytest.approx(1 - 0.329405)
    # interior C->T from LAST 5' row = 0.144011
    assert m.fwd[5, 1, 3] == pytest.approx(0.144011)
    # interior G->A from FIRST 3' row = 0.32891
    assert m.fwd[5, 2, 0] == pytest.approx(0.32891)
    # 5' layers carry the interior G->A overlay
    assert m.fwd[0, 2, 0] == pytest.approx(0.32891)
    # 3' layers: file rows in order; layer 6 = 3p row 0 (G->A 0.32891)
    assert m.fwd[6, 2, 0] == pytest.approx(0.32891)
    assert m.fwd[10, 2, 0] == pytest.approx(0.146352)
    # 3' layers carry interior C->T overlay
    assert m.fwd[10, 1, 3] == pytest.approx(0.144011)
    # A row is identity everywhere
    assert m.fwd[3, 0, 0] == 1.0 and m.fwd[3, 0, 2] == 0.0


def test_damage_reverse_swap(damage_model):
    m = damage_model
    for i in range(11):
        j = 10 - i
        assert m.rev[i, 1, 3] == m.fwd[j, 2, 0]
        assert m.rev[i, 2, 0] == m.fwd[j, 1, 3]
        assert m.rev[i, 1, 1] == m.fwd[j, 2, 2]
        assert m.rev[i, 2, 2] == m.fwd[j, 1, 1]
        # untouched entries
        assert m.rev[i, 0, 0] == m.fwd[i, 0, 0]


def test_zero_damage():
    m = DamageModel.zero()
    for l in range(11):
        np.testing.assert_allclose(m.fwd[l], np.eye(4))
        np.testing.assert_allclose(m.rev[l], np.eye(4))


def test_seq_error_profile():
    m = seq_error_profile(0.01)
    assert m[0, 0] == pytest.approx(0.99)
    assert m[0, 1] == pytest.approx(0.01 / 3)


def test_layer_index():
    idx = layer_index(np.arange(20), 20)
    assert list(idx[:5]) == [0, 1, 2, 3, 4]
    assert set(idx[5:15]) == {5}
    assert list(idx[15:]) == [6, 7, 8, 9, 10]
    # short sequence: 3' side wins the overlap (write order in the reference)
    idx8 = layer_index(np.arange(8), 8)
    assert list(idx8) == [0, 1, 2, 6, 7, 8, 9, 10]


# ---------------------------------------------------------------------- hashing
def test_xxh64_known_values():
    # golden values from the vendored xxhash.h (XXH64 of 8-byte LE input),
    # extracted with a C probe against lib/mmseqs/lib/xxhash
    cases = [
        (0, 0, 3803688792395291579),
        (0, 1, 11468921228449061269),
        (0, 12345, 17744734807539824643),
        (0, 0xDEADBEEFCAFEBABE, 8194657947400767525),
        (67, 0, 7587281261889343175),
        (67, 1, 7338708104296025926),
        (67, 12345, 11599637584503786452),
        (67, 0xDEADBEEFCAFEBABE, 10603223551971818229),
    ]
    for seed, val, expected in cases:
        assert int(xxh64_u64(np.uint64(val), seed)) == expected
    vals = xxh64_u64(np.arange(4, dtype=np.uint64), 67)
    assert vals.shape == (4,)
    assert len(set(vals.tolist())) == 4
    assert int(hash16(np.uint64(12345), 67)) == 11599637584503786452 & 0xFFFF


def test_util_hash():
    codes = np.array([0, 1, 2, 3], dtype=np.uint8)
    expected = ((0 * 31 + 0) * 31 + 1) * 31 * 31 + 2 * 31 + 3
    assert int(util_hash_codes(codes)) == expected
    flat = np.array([0, 1, 2, 3, 1, 1], dtype=np.uint8)
    out = util_hash_codes_batch(flat, np.array([0, 4]), np.array([4, 2]))
    assert int(out[0]) == expected
    assert int(out[1]) == 31 * 1 + 1


# ---------------------------------------------------------------------- packing
def test_pack_and_revcomp():
    # sequence ACTG -> codes 0,1,2,3
    codes = np.array([0, 1, 2, 3], dtype=np.uint8)
    idx, valid = packing.pack_kmers(codes, 4)
    assert valid.all() and len(idx) == 1
    assert int(idx[0]) == (0 << 6) | (1 << 4) | (2 << 2) | 3
    # revcomp of ACTG is CAGT -> codes 1,0,3,2
    rc = packing.revcomp_kmer(idx, 4)
    assert int(rc[0]) == (1 << 6) | (0 << 4) | (3 << 2) | 2


def test_revcomp_involution():
    rng = np.random.default_rng(0)
    for k in (5, 20, 22, 31, 32):
        idx = rng.integers(0, 1 << min(2 * k, 63), size=100, dtype=np.uint64)
        idx &= (np.uint64(1) << np.uint64(2 * k)) - np.uint64(1) if k < 32 else np.uint64(~np.uint64(0))
        rc = packing.revcomp_kmer(idx, k)
        back = packing.revcomp_kmer(rc, k)
        np.testing.assert_array_equal(back, idx)


def test_revcomp_matches_naive():
    rng = np.random.default_rng(1)
    k = 20
    for _ in range(20):
        codes = rng.integers(0, 4, size=k).astype(np.uint8)
        idx, _ = packing.pack_kmers(codes, k)
        rc_codes = (codes ^ 2)[::-1]
        rc_idx, _ = packing.pack_kmers(rc_codes, k)
        assert int(packing.revcomp_kmer(idx, k)[0]) == int(rc_idx[0])


def test_pack_x_masking():
    codes = np.array([0, 1, 4, 3, 0, 1], dtype=np.uint8)
    _, valid = packing.pack_kmers(codes, 3)
    assert list(valid) == [False, False, False, True]


# ----------------------------------------------------------------------- evalue
def test_bitscore_roundtrip():
    raw = np.array([10.0, 50.0, 200.0])
    bits = evalue.bit_score(raw)
    back = evalue.raw_score_from_bit_score(bits)
    np.testing.assert_allclose(back, raw, rtol=1e-12)


def test_evalue_monotonic():
    e = evalue.evalue(np.array([20.0, 40.0, 80.0]), 100, 1_000_000)
    assert e[0] > e[1] > e[2] > 0


def test_evalue_magnitude():
    # a 30bp perfect overlap scores 60; for ~765k residues db this must pass
    # the reference's e<0.001 cut comfortably
    e = float(evalue.evalue(60.0, 50, 765_000))
    assert e < 1e-10
