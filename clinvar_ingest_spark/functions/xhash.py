"""Cross-engine deterministic hashing for oracle-checkable sketches.

Every sketch operator that needs a correctness oracle builds on a hash
BOTH engines compute bit-identically:

    Spark :  conv(substr(md5(x), 1, 12), 16, 10)::long     (48-bit)
    DuckDB:  ('0x' || substr(md5(x), 1, 12))::BIGINT

All derived hash families (MinHash permutations, SimHash bit votes) are
affine transforms mod a 31-bit Mersenne prime over that base — plain
integer arithmetic expressible in any SQL dialect with no 64-bit
overflow (a, x < 2^31 ⇒ a·x < 2^62 < 2^63).

``xxhash64`` remains the right choice when no SQL oracle is needed
(pure speed, one JVM intrinsic); these helpers exist so the *same*
operator output is exactly verifiable against DuckDB. Cost note: one
md5 per token/shingle plus k affine transforms is cheaper than k
xxhash64 calls for k ≥ 2 — the oracle-able form is also the faster
plan for multi-hash sketches.

Reference analogy: the reference pins its own deterministic encodings
(canonical JSON, Content.scala:16-48) for byte-exact cross-system
comparison; this is the hash-domain equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: 2^31 - 1 — all affine hash outputs live in [0, MERSENNE31)
MERSENNE31 = 2_147_483_647

_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Python-side SplitMix64 (matches sources/changelog.py's kernel):
    used only to derive affine parameters deterministically from a seed."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def affine_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs with a ∈ [1, P-1], b ∈ [0, P-1]."""
    out = []
    for i in range(k):
        a = _splitmix64(seed * 0x9E37 + 2 * i) % (MERSENNE31 - 1) + 1
        b = _splitmix64(seed * 0x9E37 + 2 * i + 1) % MERSENNE31
        out.append((a, b))
    return out


def md5_long48(col: Column) -> Column:
    """48-bit integer from the md5 hex prefix (JVM-side, codegen'd)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def md5_long48_sql(expr: str) -> str:
    """DuckDB rendering of :func:`md5_long48` over a SQL expression."""
    return f"('0x' || substr(md5({expr}), 1, 12))::BIGINT"
