"""Exact-precision contract of the read-extension likelihood chain.

The reference accumulates the per-candidate log-likelihood in 80-bit
`long double` and rounds once to double (`scoredRes.sLenNorm = likMod`,
nuclassembleUtil.cpp:203-374), with f32 penalty terms (libgab.h's `using
namespace std` resolves log(float) to logf) and an expl ratio.  Pure-f64
summation collapses last-ulp sLenNorm distinctions into exact priority-queue
ties, which flipped greedy picks for 2 of 5,000,000 reads at the 5M scale
(keys 964120 / 2572489 extended 113/87bp vs the reference's 111/85 —
diagnosed by stage-checkpoint bisection, fixed by the exact-ld chain; the
full iteration-0 read assembly over the reference's 5M correction_0+aln_0
checkpoints is byte-identical for all 5M records after the fix).

These tests pin the numeric contract so refactors cannot silently regress
to pairwise-f64 summation.
"""
import ctypes
import math

import numpy as np
import pytest

from carpedeam_tpu.damage import (DamageModel, seq_error_profile,
                                  seq_error_profile_ld)
from carpedeam_tpu.ops.likelihood import (likelihood_table, logf32,
                                          ratio_ld_array, sln_ratio_exact)

DHIGH = "/root/reference/example/dhigh"


def test_profile_text_parses_to_long_double():
    dm = DamageModel.load(DHIGH)
    assert dm.fwd_ld.dtype == np.longdouble
    # text->ld keeps bits that text->f64->ld loses
    assert np.longdouble("0.330275") != np.longdouble(0.330275)
    # but the f64 projections agree with the f64 tensors everywhere
    assert np.array_equal(dm.fwd_ld.astype(np.float64), dm.fwd)


def test_interior_vs_overlay_rounding_quirk():
    """The interior layer's C->C is full-ld 1-rate, while the 3' rows'
    C->C overlay rounds through double first (the reference's
    unordered_map<int, double> defaultCT, nuclassembleUtil.cpp:878-882).
    Both project to the same double, but the ld values differ."""
    dm = DamageModel.load(DHIGH)
    interior_cc = dm.fwd_ld[5, 1, 1]
    overlay_cc = dm.fwd_ld[6, 1, 1]
    assert np.float64(interior_cc) == np.float64(overlay_cc)
    assert interior_cc != overlay_cc  # ld-only distinction


def test_table_matches_scalar_ld_oracle():
    """likelihood_table == a literal scalar transcription of the
    reference's per-column loop in ld arithmetic."""
    dm = DamageModel.load(DHIGH)
    seq_err = seq_error_profile_ld(0.001)
    t = likelihood_table(dm.fwd_ld, seq_err)
    S = np.longdouble(np.float64(0.001))
    for lay in (0, 5, 10):
        for qb in range(4):
            for tb in range(4):
                lik = np.float64(0.0)
                for z in range(4):
                    match_lik = np.float64(max(S, dm.fwd_ld[lay, qb, z]))
                    prod = seq_err[z, tb] * np.longdouble(match_lik)
                    lik = np.float64(np.longdouble(lik) + prod)
                assert t[lay, qb, tb] == math.log(lik)


def test_table_distinguishes_ld_from_f64_path():
    """At least one entry of the exact table differs (in the last ulp)
    from the naive all-f64 einsum — the distinction that resolves the 5M
    queue ties."""
    dm = DamageModel.load(DHIGH)
    exact = likelihood_table(dm.fwd_ld, seq_error_profile_ld(0.001))
    naive = np.log(np.einsum("lqz,zt->lqt",
                             np.maximum(dm.fwd, 0.001),
                             seq_error_profile(0.001)))
    diff = exact != naive
    assert diff.any()
    assert np.abs(exact - naive).max() < 1e-14  # same values, ulp-scale


def test_penalties_are_f32():
    """excess * log(excessPenal) is a float32 product of a float32 log."""
    assert logf32(0.0625).dtype == np.float32
    # logf(0.0625f) differs from double log in f32's last place
    assert float(logf32(0.0625)) != math.log(0.0625)
    sln, ratio = sln_ratio_exact(np.longdouble(-5.5), 10, 20, 0.85, 0.0625)
    # reproduce by hand
    term = np.float32(10) * logf32(0.0625)
    lik = np.longdouble(-5.5) + np.longdouble(term)
    assert sln == float(np.float64(lik))
    assert 0.0 < ratio < 1.0


def test_ratio_native_expl_semantics():
    """sRatio goes through glibc expl inside the native helper (ctypes
    cannot carry long double without truncation, and numpy's longdouble
    exp differs from expl in the last ulp).  The scalar oracle path must
    agree bit-for-bit with the vector helper."""
    from carpedeam_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    rand_aln = rng.uniform(-30, 0, 256)
    lik = (rng.uniform(-40, 0, 256)).astype(np.longdouble) \
        + np.longdouble("1e-19")
    got = ratio_ld_array(rand_aln, lik)
    assert got.dtype == np.float64
    assert ((got > 0) & (got < 1)).all()
    # numpy's longdouble exp may differ from expl at the ld level (it
    # provably does — see PERF notes) but usually rounds to the same f64;
    # the native path guarantees the C-exact value either way
    one = np.longdouble(1.0)
    approx = (one / (one + np.exp(np.asarray(rand_aln, np.longdouble)
                                  - lik))).astype(np.float64)
    assert np.abs(got - approx).max() < 1e-15
    # scalar oracle tail must agree bit-for-bit with the vector helper
    sln, ratio = sln_ratio_exact(lik[3], 0, 0, 0.85, 0.0625)
    want = ratio_ld_array(np.array([np.float64(np.float32(0.0))]),
                          np.array([lik[3] + np.longdouble(
                              np.float32(0) * logf32(0.0625))],
                              dtype=np.longdouble))[0]
    assert ratio == want


def test_native_prepass_lik_is_long_double():
    from carpedeam_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    from carpedeam_tpu.io.seqdb import SeqDB
    dm = DamageModel.load(DHIGH)
    logm = likelihood_table(dm.fwd_ld, seq_error_profile_ld(0.001))
    seqs = [b"ACGTACGTACGTACGTACGTACGTACGTACGTACGT",
            b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"]
    db = SeqDB.from_sequences(seqs)
    nat = native.read_prepass(
        db.data, db.offsets, db.lengths,
        np.array([0], np.int32), np.array([1], np.int32),
        np.array([0], np.int32), np.array([35], np.int32),
        np.array([8], np.int32), np.array([43], np.int32),
        np.array([36], np.int32), np.array([1], np.uint8),
        np.array([0], np.uint8), 0.9, logm)
    assert nat["lik_mod"].dtype == np.longdouble
