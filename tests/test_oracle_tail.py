"""Local oracle gate for the queries that rotate OUTSIDE the driver's
50-entry CORRECTNESS window (round-4 tail) and have no operator pytest
of their own — each must stay verified by SOMETHING every round, so
this runs the exact driver comparison (row count + column names +
value hash vs DuckDB) at sf0.001.
"""

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TAIL_QUERIES = [
    "vocab_topk",
    "corpus_quantiles",
    "corpus_split",
    "tpch_q4",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q18",
    # round-4 additions (correlated/anti-join/distribution shapes)
    "tpch_q7",
    "tpch_q8",
    "tpch_q13",
    "tpch_q15",
    "tpch_q21",
    "tpch_q22",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
]


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry():
    return _load(os.path.join(REPO, "__spark_entry__.py"), "entry_for_tail")


@pytest.fixture(scope="module")
def checker():
    return _load(os.path.join(REPO, "tools", "check_oracle.py"), "check_oracle")


@pytest.fixture(scope="module")
def con(checker):
    c = duckdb.connect()
    for t in checker.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", TAIL_QUERIES)
def test_tail_query_matches_oracle(spark, entry, checker, con, name):
    sdf = entry.queries()[name](spark, SF_DIR).toPandas()
    odf = con.sql(entry.oracle_sql()[name]).df()
    s_rows, s_cols, s_hash = checker.canon(sdf)
    o_rows, o_cols, o_hash = checker.canon(odf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert s_rows == o_rows, f"{name}: row count {s_rows} vs {o_rows}"
    assert s_hash == o_hash, f"{name}: value hash mismatch"
    assert s_rows > 0, f"{name}: empty result proves nothing"
