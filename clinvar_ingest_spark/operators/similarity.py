"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_bruteforce` — exact top-k neighbors for a (small,
  broadcast) query set against the full corpus: JVM-side dot products
  via ``zip_with``/``aggregate`` (whole-stage codegen, no Python), then
  a per-query top-k window. The baseline every ANN variant is measured
  against.
- :func:`lsh_bucket_topk` — random-hyperplane (SRP) LSH: sign-bit
  sketches partition the corpus into buckets; queries probe only their
  own bucket (+ optional multi-probe by flipping bits), turning the
  scan from O(N) per query into O(N / 2^bits) expected. The scale path
  for 100 TB embedding stores; recall measured against brute force in
  tests.

Embedding-cosine near-dup dedup = :func:`cosine_dup_pairs` — all pairs
above a cosine threshold among LSH bucket collisions (never pairwise
across the whole corpus).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize: cosine becomes a plain dot product downstream."""
    n = _norm(F.col(vec_col))
    return df.withColumn(
        "_unit", F.transform(F.col(vec_col), lambda x: x / n)
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k.

    ``queries`` must be small (it is broadcast); the corpus is scanned
    once per partition with codegen'd array arithmetic.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    j = c.crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = (_dot(F.col("_cv"), F.col("_qv")) / (_norm(F.col("_cv")) * _norm(F.col("_qv")))).alias(
        "cosine"
    )
    scored = j.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def srp_planes(dim: int, bits: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic SRP hyperplanes as plain Python floats — the single
    source both the Spark plan (literal arrays) and any SQL oracle
    (literal lists) embed, so bucket assignments agree bit-for-bit."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((bits, dim))]


def srp_sketch(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "_bucket",
) -> DataFrame:
    """Sign-random-projection bucket id (int) per row, fully JVM-side:
    bucket bit b = sign(dot(v, hyperplane_b)), hyperplanes from
    :func:`srp_planes` baked into the plan as literals.
    """
    planes = srp_planes(dim, bits, seed)
    expr = F.lit(0).cast("long")
    v = F.col(vec_col)
    for b in range(bits):
        lit_plane = F.array(*[F.lit(x) for x in planes[b]])
        d = _dot(v, lit_plane)
        expr = expr + F.when(d > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return df.withColumn(out_col, expr)


def _probe_masks(bits: int, probe_hamming: int) -> list[int]:
    """XOR masks for multi-probe: all bucket perturbations within
    ``probe_hamming`` bit flips (0 → just the own bucket)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, probe_hamming + 1):
        for combo in combinations(range(bits), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: score corpus rows in the query's SRP bucket.

    ``probe_hamming`` > 0 enables **multi-probe**: each query also
    scans every bucket within that Hamming distance of its own sketch
    (r=1 → bits+1 buckets). A vector near a hyperplane lands on either
    side of that bit — probing the 1-flip neighbors recovers exactly
    those near-boundary misses, trading a bounded ×(1 + C(bits,1) +
    … + C(bits,r)) candidate growth for recall. Implemented as an
    explode over XOR masks + the same equi-join (never a Hamming theta
    join — the shuffle key stays a plain bucket id at any corpus
    size); the exact-cosine gate is unchanged.
    """
    c = srp_sketch(corpus, dim, bits, seed, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_bucket"
    )
    q = srp_sketch(queries, dim, bits, seed, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "_bucket"
    )
    if probe_hamming > 0:
        masks = _probe_masks(bits, probe_hamming)
        q = q.withColumn(
            "_bucket",
            F.explode(
                F.array(
                    *[F.col("_bucket").bitwiseXOR(F.lit(m)) for m in masks]
                )
            ),
        )
    j = c.join(F.broadcast(q), "_bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = (
        _dot(F.col("_cv"), F.col("_qv")) / (_norm(F.col("_cv")) * _norm(F.col("_qv")))
    ).alias("cosine")
    scored = j.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: SRP-bucket self-join + exact cosine gate."""
    s = srp_sketch(df, dim, bits, seed, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "_bucket"
    )
    a = s.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "_bucket")
    b = s.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "_bucket")
    pairs = a.join(b, "_bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
