"""Engine-portable 64-bit hashing + a seeded affine minhash family.

Spark's `xxhash64` has no DuckDB twin, so operators built on it can only
get rows-only verification from the driver's correctness gate. Everything
here derives from md5 — bit-identical in Spark (`F.md5`), DuckDB (`md5`)
and Python (`hashlib.md5`) — so the MinHash-LSH / SimHash family sits
under the full rows+schema+value-hash gate instead.

- ``portable_hash64``: first 15 hex chars of the md5 digest as a BIGINT
  (60 bits, always positive; headroom below 2^63 keeps later arithmetic
  overflow-free on engines that error on BIGINT overflow).
- minhash family: affine permutations ``(a_i * (h mod p) + b_i) mod p``
  over the Mersenne prime p = 2^31 - 1. Products stay < 2^62, so the
  arithmetic is exact 64-bit on every engine — and, vs the previous
  K×xxhash64 family, replaces K hash calls per shingle with one md5 plus
  K integer multiply-adds (all inside WholeStageCodegen).
- the constants are SEEDED LITERALS generated once here and baked into
  both the Spark plan and the oracle SQL, so the two can never drift.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647          # 2^31 - 1
_FAMILY_SEED = 20260817


def minhash_params(k: int) -> list[tuple[int, int]]:
    """First k (a, b) affine constants of the seeded family (stable prefix:
    params(8) is a prefix of params(16))."""
    rng = random.Random(_FAMILY_SEED)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(k)
    ]


def portable_hash64(col) -> F.Column:
    """md5-derived 60-bit positive hash as a Spark Column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def fast_hash64(col) -> F.Column:
    """xxhash64 production hash — ~5x cheaper per shingle than the md5
    path but with NO DuckDB twin, so operators using it get rows-only
    verification. The affine minhash family composes identically (inputs
    are pre-reduced mod p downstream); `portable_hash64` stays the
    oracle-checked default, and pair-output parity between the two
    families is pytest-gated (test_dedup_similarity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def portable_hash64_sql(expr: str) -> str:
    """DuckDB twin of ``portable_hash64`` over any VARCHAR expression."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def affine_minhash(h31_col, a: int, b: int) -> F.Column:
    """One member of the minhash family over a pre-reduced (mod p) hash."""
    return F.pmod(F.lit(a) * h31_col + F.lit(b), F.lit(MERSENNE_P))


def affine_minhash_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB twin of ``affine_minhash`` over a raw 60-bit hash expr."""
    return f"({a} * ({h_expr} % {MERSENNE_P}) + {b}) % {MERSENNE_P}"
