"""Per-file key bloom filters — manifest-level point-lookup skipping.

Iceberg keeps per-data-file stats (and puffin blooms) in its manifests
so a point read plans from metadata alone; the reference leans on
BigQuery clustered tables for the same effect
(reference: schema/src/main/jade-tables/gene.table.json:33-36
datePartitionOptions — partition-level skipping only). Here the case
that matters is **merge-on-read delta stacks**: a bucket under MOR
carries one base file plus one small delta file per applied batch, and
a point lookup would otherwise open every one of them. A bloom per
DELTA file (built at promote time from the batch's own keys — cost ∝
batch size, like the delta write itself) lets the lookup open only the
deltas that may contain the key: with a per-batch touch probability p,
the expected opens drop from k files to ~p·k + fpp·k.

Base files carry no bloom: a COW bucket is one file the lookup must
open anyway (it holds the key's current row if any), and compaction
folds deltas back into bloom-less base files, so manifests never grow
blooms proportional to table size — only to the UNCOMPACTED window.

Hashing is md5 double-hashing (h_i = h1 + i·h2 mod m): stable across
Python/pandas/numpy versions forever, which matters because a bloom
false NEGATIVE would silently drop a row — fpp only costs an extra
file open, a missed key corrupts results. Sizing: m = next power of
two ≥ 10 bits/key (k = 7 ⇒ fpp ≈ 0.8 %), capped at 2^16 bits = 8 KiB
(base64 ≈ 11 KiB manifest weight per delta file, removed by
compaction); past the cap fpp degrades gracefully toward 1 (never
toward false negatives).
"""

from __future__ import annotations

import base64
import hashlib
from typing import Iterable

K_HASHES = 7
BITS_PER_KEY = 10
MIN_BITS = 1 << 10
MAX_BITS = 1 << 16


def _h12(key: str) -> tuple[int, int]:
    d = hashlib.md5(key.encode("utf-8")).digest()
    # h2 forced odd: with m a power of two, an odd stride visits every
    # slot (double hashing never degenerates to a single probe)
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


def _size_bits(n_keys: int) -> int:
    want = max(n_keys, 1) * BITS_PER_KEY
    m = MIN_BITS
    while m < want and m < MAX_BITS:
        m <<= 1
    return m


def bloom_build(keys: Iterable[str]) -> str:
    """Base64 bloom over ``keys`` (None keys skipped — a NULL key never
    routes to a point lookup)."""
    keys = [k for k in keys if k is not None]
    m_bits = _size_bits(len(keys))
    mask = m_bits - 1
    arr = bytearray(m_bits >> 3)
    for key in keys:
        h1, h2 = _h12(key)
        for i in range(K_HASHES):
            bit = (h1 + i * h2) & mask
            arr[bit >> 3] |= 1 << (bit & 7)
    return base64.b64encode(bytes(arr)).decode("ascii")


def bloom_maybe_contains(b64: str, key: str) -> bool:
    """False ⇒ the file definitely holds no row with this key."""
    arr = base64.b64decode(b64)
    mask = (len(arr) << 3) - 1
    h1, h2 = _h12(key)
    for i in range(K_HASHES):
        bit = (h1 + i * h2) & mask
        if not arr[bit >> 3] & (1 << (bit & 7)):
            return False
    return True
