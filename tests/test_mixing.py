"""Dataset mixing: exact copy counts, determinism, Python-reference and
DuckDB-mirror agreement."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.mixing import apply_mixture, mixture_sql


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _expected_copies(doc_id: int, w: float, precision: int = 1_000_000) -> int:
    whole = int(w)
    frac_num = round((w - whole) * precision)
    if frac_num == precision:
        whole, frac_num = whole + 1, 0
    extra = 1 if frac_num > 0 and _h48(f"{doc_id}:{whole}") % precision < frac_num else 0
    return whole + extra


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 4}", f"text {i}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


WEIGHTS = {"s0": 0.25, "s1": 1.0, "s2": 2.5, "s3": 0.0}


def test_copy_counts_match_python_reference(docs):
    out = apply_mixture(docs, WEIGHTS)
    got = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for i in range(400):
        src = f"s{i % 4}"
        want = _expected_copies(i, WEIGHTS[src])
        assert got.get(i, 0) == want, (i, src)


def test_integral_weights_never_consult_hash(docs):
    out = apply_mixture(docs, {"s0": 2.0, "s1": 0, "s2": 0, "s3": 0})
    got = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in got)
    assert {r["doc_id"] % 4 for r in got} == {0}


def test_epochs_are_dense_from_zero(docs):
    out = apply_mixture(docs, {"s2": 3.5}, default_weight=0.0)
    per = out.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("epoch")).alias("es")
    )
    for r in per.collect():
        assert list(r["es"]) == list(range(len(r["es"])))


def test_partition_invariance(docs):
    a = apply_mixture(docs.repartition(7), WEIGHTS).groupBy("doc_id").count()
    b = apply_mixture(docs.coalesce(1), WEIGHTS).groupBy("doc_id").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_duckdb_mirror_agrees(spark, docs):
    out = apply_mixture(docs, WEIGHTS).select("doc_id", "source", "epoch")
    got = sorted(map(tuple, out.collect()))
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    sql = mixture_sql(WEIGHTS)
    want = sorted(
        (int(r[0]), r[1], int(r[3]))
        for r in con.execute(
            f"SELECT doc_id, source, text, epoch FROM ({sql})"
        ).fetchall()
    )
    assert got == want


def test_default_weight_keeps_unknown_sources(spark):
    rows = [(1, "mystery", "t")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    assert apply_mixture(df, {"s0": 1.0}, default_weight=1.0).count() == 1
    assert apply_mixture(df, {"s0": 1.0}, default_weight=0.0).count() == 0
