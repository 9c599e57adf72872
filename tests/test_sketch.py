"""KMV distinct sketch: exactness below k, accuracy above, mergeability,
partition invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.sketch import (
    DOMAIN,
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def _h48(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)


@pytest.fixture(scope="module")
def small(spark):
    # 10 distinct keys, duplicated 3× each, in 2 groups
    rows = [(g, f"k{g}_{i}") for g in ("a", "b") for i in range(5) for _ in range(3)]
    return spark.createDataFrame(rows, "grp string, key string")


def test_exact_below_k(small):
    out = {r["grp"]: r for r in kmv_distinct(small, "key", k=32, group_by=["grp"]).collect()}
    for g in ("a", "b"):
        assert out[g]["n_keys"] == 5
        assert out[g]["est_distinct"] == 5  # exact when D < k


def test_sketch_is_bottom_k_of_md5(small):
    ks = kmv_sketch(small, "key", k=3, group_by=["grp"]).collect()
    for r in ks:
        expected = sorted(_h48(f"k{r['grp']}_{i}") for i in range(5))[:3]
        assert list(r["kmv"]) == expected


def test_estimator_accuracy(spark):
    n, k = 5000, 64
    df = spark.range(n).select(F.col("id").cast("string").alias("key"))
    est = kmv_estimate(kmv_sketch(df, "key", k=k), k=k).first()["est_distinct"]
    # relative error concentrates around 1/sqrt(k-2) ≈ 12.7 %; allow 3σ
    assert abs(est - n) / n < 0.4, est


def test_estimator_matches_formula(spark):
    n, k = 1000, 16
    df = spark.range(n).select(F.col("id").cast("string").alias("key"))
    row = kmv_estimate(kmv_sketch(df, "key", k=k), k=k).first()
    kth = sorted(_h48(i) for i in range(n))[k - 1]
    assert row["kmv"][-1] == kth
    assert row["est_distinct"] == (k - 1) * DOMAIN // kth


def test_merge_equals_sketch_of_union(spark):
    a = spark.range(0, 800).select(F.col("id").cast("string").alias("key"))
    b = spark.range(400, 1200).select(F.col("id").cast("string").alias("key"))
    k = 24
    merged = kmv_merge(kmv_sketch(a, "key", k=k).unionByName(kmv_sketch(b, "key", k=k)), k=k)
    direct = kmv_sketch(a.unionByName(b), "key", k=k)
    assert merged.first()["kmv"] == direct.first()["kmv"]


def test_partition_invariance(spark):
    df = spark.range(600).select(F.col("id").cast("string").alias("key"))
    one = kmv_sketch(df.coalesce(1), "key", k=16, n_salts=4).first()["kmv"]
    many = kmv_sketch(df.repartition(13), "key", k=16, n_salts=32).first()["kmv"]
    assert one == many


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("y",), (None,)], "key string"
    )
    row = kmv_distinct(df, "key", k=8).first()
    assert row["n_keys"] == 2 and row["est_distinct"] == 2
