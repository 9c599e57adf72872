"""Deduplication suite for large-scale training-data pipelines.

Generalizes the reference's key-based dedup (``dedupByDate``,
ArchiveBranches.scala:140-156) to *content*-based dedup over a corpus:

- :func:`dedup_exact` — exact duplicate groups by full-text hash.
- :func:`ngram_shingles` / :func:`jaccard_candidate_pairs` — n-gram
  Jaccard near-dup via an inverted shingle index (self-join on shingle,
  count co-occurrences) — never a cross join; candidate generation is
  |pairs sharing ≥1 shingle|, and the Jaccard test is exact integer
  arithmetic (``(t+1)*inter >= t*(|A|+|B|)`` avoids float thresholds).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` —
  MinHash + banded LSH: signatures via ``xxhash64(shingle, seed_i)``
  min-reduced per doc (all JVM-side), bands hashed and self-joined so
  the shuffle carries (band_key) buckets, not O(n²) pairs.
- :func:`simhash64` — 64-bit SimHash fingerprints (vectorized pandas
  UDF over token hashes); near-dups = fingerprints within a Hamming
  radius, found by 4-band exact-match blocking.

Scale notes: every candidate generator here is bounded by collision
group sizes, not corpus size²; hot shingles (stopword-only grams) are
dropped via a document-frequency cap, the classic skew guard for
inverted-index self-joins.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

# --------------------------------------------------------------------- exact


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: keeper id (min), duplicate count.

    Hash-groupBy with map-side partial agg; at 100 TB group on
    ``sha2(text)`` instead of raw text to shrink shuffle keys — we group
    on the hash and keep one exemplar text hash per group.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
        .select("keep_id", "n_dups", "text_hash")
    )


# ------------------------------------------------------------ n-gram jaccard


def tokenize(col):
    """Whitespace tokenization (deterministic; both engines agree)."""
    return F.split(F.trim(col), r"\s+")


def ngram_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs of word n-grams, de-duplicated per doc."""
    toks = tokenize(F.col(text_col))
    # sequence(a, b) with a > b counts DOWN in Spark — guard short docs
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def jaccard_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs with n-gram Jaccard ≥ threshold.

    Plan: shingle → (optional) drop shingles with document frequency >
    ``max_shingle_df`` (hot-key guard: a stopword-gram shared by 10^6
    docs would otherwise emit 10^12 candidate pairs) → self-join on
    shingle with id_a < id_b → count co-occurrences = |A∩B| → exact
    integer Jaccard test against per-doc shingle counts.
    """
    sh = ngram_shingles(df, text_col, id_col, n)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    j = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
    )
    # jaccard = i / (na + nb - i) >= t  ⇔  i * (1+t) >= t * (na+nb)  [exact
    # in integers when t = p/q]: use i*q >= p*(na+nb-i)
    p, q = _ratio(threshold)
    keep = j.filter(
        F.col("n_inter") * q >= p * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    )
    return keep.select("id_a", "id_b", "n_inter", "n_a", "n_b")


def _ratio(threshold: float) -> tuple[int, int]:
    from fractions import Fraction

    fr = Fraction(threshold).limit_denominator(10_000)
    return fr.numerator, fr.denominator


# ---------------------------------------------------------------- minhash/LSH


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures, fully JVM-side.

    hash_i(shingle) = xxhash64(shingle, seed=i); sig[i] = min over the
    doc's shingles. One shuffle (groupBy id); no Python in the loop.
    """
    sh = ngram_shingles(df, text_col, id_col, n)
    hashes = F.array(
        *[F.xxhash64(F.col("shingle"), F.lit(i)) for i in range(num_hashes)]
    )
    per = sh.select("id", hashes.alias("hs"))
    # element-wise min across rows: aggregate with zip_with(least)
    zero = F.array(*[F.lit(2**63 - 1).cast("long")] * num_hashes)
    agg = per.groupBy("id").agg(
        F.aggregate(
            F.collect_list("hs"),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
        ).alias("sig")
    )
    return agg


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    rows_per_band = num_hashes/bands; two docs collide if any band of
    their signatures matches exactly. Shuffle key = (band, band_hash):
    corpus-size-linear, never pairwise.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", bi * r + j + 1).cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")
    a = band_rows.select(F.col("id").alias("id_a"), "band", "bh")
    b = band_rows.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# -------------------------------------------------------------------- simhash


def _simhash64_pdf(tokens: pd.Series) -> pd.Series:
    """Vectorized SimHash over pre-tokenized docs (numpy bit-votes)."""
    out = np.zeros(len(tokens), dtype=np.uint64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            continue
        hs = np.array(
            [np.uint64(hash_token(t)) for t in toks], dtype=np.uint64
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = bits.sum(axis=0) * 2 - len(hs)  # +1 votes minus -1 votes
        fp = np.uint64(0)
        for bit in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(bit)
        out[i] = fp
    return pd.Series(out.astype(np.int64))


def hash_token(t: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a; stable across runs/processes)."""
    h = 0xCBF29CE484222325
    for ch in t.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@F.pandas_udf(LongType())
def simhash64_udf(tokens: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return _simhash64_pdf(tokens)


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash: long) fingerprints."""
    return df.select(
        F.col(id_col).alias("id"),
        simhash64_udf(tokenize(F.col(text_col))).alias("simhash"),
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4-block
    blocking (pigeonhole: ≤3 differing bits → ≥1 of 4 16-bit blocks
    identical), then exact popcount filter on candidates.
    """
    fp = simhash64(df, text_col, id_col)
    blocks = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", "b.blk", "b.bv")
    a = blocks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "bv"
    )
    b = blocks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "bv"
    )
    cands = (
        a.join(b, ["blk", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
