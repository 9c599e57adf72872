"""Local replica of the driver's DuckDB-oracle correctness gate:
run every queries()[name] and its oracle_sql()[name] on the same sf dir,
compare row count + column names + order-insensitive values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def normval(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "␀"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    out = df.map(normval)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


def test_oracle_covers_subset_of_queries():
    q = set(entrymod.queries().keys())
    o = set(entrymod.oracle_sql().keys())
    assert o <= q, o - q


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entrymod.queries()[name]
    got = qfn(spark, SF_DIR).toPandas()
    want = ddb.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        sorted(got.columns),
        sorted(want.columns),
    )
    assert len(got) == len(want), (name, len(got), len(want))
    g, w = _norm(got), _norm(want)
    eq = g.eq(w)
    if not eq.all().all():
        bad = (~eq.all(axis=1)).idxmax()
        raise AssertionError(
            f"{name}: first mismatching row {bad}:\nspark={g.iloc[bad].to_dict()}\n"
            f"duckdb={w.iloc[bad].to_dict()}"
        )


def test_every_query_is_oracle_checked():
    """Round 2 eliminated the rows-only tier: every queries() entry
    must carry an oracle_sql() mirror (and vice versa) — a new query
    without an oracle fails here instead of silently downgrading the
    driver's correctness gate."""
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
