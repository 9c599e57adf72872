"""Local oracle gate for the queries that rotate OUTSIDE the driver's
50-entry CORRECTNESS window (round-4 tail) and have no operator pytest
of their own — each must stay verified by SOMETHING every round, so
this runs the exact driver comparison (row count + column names +
value hash vs DuckDB). Round-3 holdovers run at sf0.001; the round-4
TPC-H additions (never driver-checked — the window is full of
higher-priority engine queries) run at BOTH sf0.001 and sf0.01 so the
larger scale's join/broadcast behavior stays continuously covered.
"""

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_MED = "/root/testdata/sf0.01"

TAIL_QUERIES = [
    "vocab_topk",
    "corpus_quantiles",
    "corpus_split",
    "tpch_q4",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q18",
]

# round-4 additions (correlated/anti-join/distribution shapes) — both scales
TPCH_R4 = [
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

#: single-row scalar aggregates always return 1 row — the row-count
#: vacuity guard is useless for them, so assert the named count column
#: is positive (the filter actually matched something)
NONEMPTY_COL = {
    "tpch_q17": "n_small_lines",
    "tpch_q19": "n_lines",
}


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


def _con(checker, sf_dir):
    c = duckdb.connect()
    for t in checker.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.fixture(scope="module")
def cons(checker):
    return {sf: _con(checker, sf) for sf in (SF_SMALL, SF_MED)}


def _check(spark, entry, checker, cons, name, sf_dir):
    sdf = entry.queries()[name](spark, sf_dir).toPandas()
    odf = cons[sf_dir].sql(entry.oracle_sql()[name]).df()
    s_rows, s_cols, s_hash = checker.canon(sdf)
    o_rows, o_cols, o_hash = checker.canon(odf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert s_rows == o_rows, f"{name}: row count {s_rows} vs {o_rows}"
    assert s_hash == o_hash, f"{name}: value hash mismatch"
    if name in NONEMPTY_COL:
        col = NONEMPTY_COL[name]
        assert int(sdf[col].iloc[0]) > 0, f"{name}: {col} == 0 proves nothing"
    else:
        assert s_rows > 0, f"{name}: empty result proves nothing"


@pytest.mark.skipif(not os.path.isdir(SF_SMALL), reason="driver testdata absent")
@pytest.mark.parametrize("name", TAIL_QUERIES)
def test_tail_query_matches_oracle(spark, entry, checker, cons, name):
    _check(spark, entry, checker, cons, name, SF_SMALL)


@pytest.mark.skipif(not os.path.isdir(SF_MED), reason="driver testdata absent")
@pytest.mark.parametrize("name", TPCH_R4)
@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_tpch_r4_matches_oracle(spark, entry, checker, cons, name, sf_dir):
    _check(spark, entry, checker, cons, name, sf_dir)
