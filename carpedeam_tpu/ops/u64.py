"""uint64 arithmetic as (hi, lo) uint32 pairs for TPU device code.

TPUs have no native 64-bit integer path (XLA emulates x64 slowly and JAX
defaults to 32-bit); the k-mer machinery needs exact mod-2^64 arithmetic
for xxHash64 subsampling and the packed-k-mer bit tricks
(lib/mmseqs/src/linclust/kmermatcher.cpp:33-38, Util.cpp:601-640).  This
module provides the few required ops over (hi, lo) uint32 pairs as
jnp elementwise chains (VPU-friendly, fused by XLA).

All functions are shape-polymorphic elementwise; a "u64" is the tuple
(hi: uint32 array, lo: uint32 array).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


def from_np(x: np.ndarray):
    x = np.asarray(x, dtype=np.uint64)
    return (jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def to_np(hi, lo) -> np.ndarray:
    return (np.asarray(hi).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(lo).astype(np.uint64)


def const(v: int):
    return (jnp.uint32((v >> 32) & 0xFFFFFFFF), jnp.uint32(v & 0xFFFFFFFF))


def xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def or_(a, b):
    return (a[0] | b[0], a[1] | b[1])


def and_(a, b):
    return (a[0] & b[0], a[1] & b[1])


def add(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    return (a[0] + b[0] + carry, lo)


def shl(a, s: int):
    """Left shift by a static amount 0..63."""
    if s == 0:
        return a
    if s >= 32:
        return (a[1] << U32(s - 32) if s > 32 else a[1], jnp.zeros_like(a[1]))
    return ((a[0] << U32(s)) | (a[1] >> U32(32 - s)), a[1] << U32(s))


def shr(a, s: int):
    """Logical right shift by a static amount 0..63."""
    if s == 0:
        return a
    if s >= 32:
        return (jnp.zeros_like(a[0]), a[0] >> U32(s - 32) if s > 32 else a[0])
    return (a[0] >> U32(s), (a[1] >> U32(s)) | (a[0] << U32(32 - s)))


def rotl(a, r: int):
    return or_(shl(a, r), shr(a, 64 - r))


def _mul32(a, b):
    """Full 32x32 -> 64 multiply via 16-bit limbs; returns (hi, lo) u32."""
    a0 = a & U32(0xFFFF)
    a1 = a >> U32(16)
    b0 = b & U32(0xFFFF)
    b1 = b >> U32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10
    mid_carry = (mid < p01).astype(U32)          # overflow of p01+p10
    lo = p00 + (mid << U32(16))
    lo_carry = (lo < p00).astype(U32)
    hi = p11 + (mid >> U32(16)) + (mid_carry << U32(16)) + lo_carry
    return hi, lo


def mul(a, b):
    """(a * b) mod 2^64."""
    hi, lo = _mul32(a[1], b[1])
    hi = hi + a[1] * b[0] + a[0] * b[1]
    return (hi, lo)


def lt(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def where(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]))


def _bswap32(x):
    return ((x >> U32(24)) | ((x >> U32(8)) & U32(0xFF00))
            | ((x << U32(8)) & U32(0xFF0000)) | (x << U32(24)))


def bswap(a):
    """Byte-swap the 64-bit value (reverses the 8 bytes)."""
    return (_bswap32(a[1]), _bswap32(a[0]))


# ---------------------------------------------------------------------------
# xxHash64 of one 8-byte little-endian u64 (kmer/xxh64.xxh64_u64 on device)
# ---------------------------------------------------------------------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def xxh64_u64(v, seed: int):
    """XXH64 of each u64 with an 8-byte input; bit-exact vs kmer/xxh64."""
    p1, p2, p3, p4 = const(_P1), const(_P2), const(_P3), const(_P4)
    k1 = mul(rotl(mul(v, p2), 31), p1)
    acc0 = (_P5 + seed + 8) & 0xFFFFFFFFFFFFFFFF
    acc = xor(const(acc0), k1)
    acc = add(mul(rotl(acc, 27), p1), p4)
    acc = xor(acc, shr(acc, 33))
    acc = mul(acc, p2)
    acc = xor(acc, shr(acc, 29))
    acc = mul(acc, p3)
    acc = xor(acc, shr(acc, 32))
    return acc


def hash16(v, seed: int):
    """16-bit truncation of xxh64 (the k-mer subsampling score)."""
    return xxh64_u64(v, seed)[1] & U32(0xFFFF)


# ---------------------------------------------------------------------------
# packed k-mer reverse complement / canonicalisation (kmer/packing.py)
# ---------------------------------------------------------------------------
_M2 = 0x3333333333333333
_M4 = 0x0F0F0F0F0F0F0F0F
_COMP = 0xAAAAAAAAAAAAAAAA


def revcomp_kmer(idx, k: int):
    m2, m4 = const(_M2), const(_M4)
    x = xor(idx, const(_COMP))
    x = or_(and_(shr(x, 2), m2), shl(and_(x, m2), 2))
    x = or_(and_(shr(x, 4), m4), shl(and_(x, m4), 4))
    x = bswap(x)
    return shr(x, 64 - 2 * k)


def canonicalize(idx, k: int):
    """(canonical, pick_reverse, palindrome) — kmermatcher.cpp:155-163."""
    rc = revcomp_kmer(idx, k)
    palindrome = eq(rc, idx)
    pick_reverse = lt(rc, idx)
    return where(pick_reverse, rc, idx), pick_reverse, palindrome
