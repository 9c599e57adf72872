"""Driver-session sensitivity gate (round-5, VERDICT r4 item 2).

Every local gate before round 5 ran under ``get_spark()``'s pinned
config (session.py: UTC timezone, ``inferTimestampNTZ=false``, …), so
the verification harness shared the engine's session assumptions and
structurally could not catch driver-session sensitivities — exactly how
``sessionize_events`` shipped green locally and failed under the
driver's default-config Spark 4 session (TIMESTAMP_NTZ inference on →
``unix_micros`` AnalysisException, CORRECTNESS_r04).

This module closes the CLASS, not the instance: it runs EVERY
``queries()`` entry under a session whose *semantic* knobs are Spark
defaults — parquet NTZ inference ON, session timezone unset (JVM
default), output timestamp type unset — and compares row count, column
names, and the value hash against the DuckDB oracle at sf0.001, i.e.
the exact driver comparison. Only performance knobs (shuffle partition
count) are kept small; they cannot mask a dtype/timezone divergence.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

#: session.py knobs that change SQL *semantics* (dtype inference,
#: timezone, on-disk timestamp type) — reverted to Spark defaults here.
#: Performance-only knobs (AQE, partitions, arrow batch size, codec)
#: stay: they cannot produce a value divergence, only a slow test.
_SEMANTIC_KNOBS = [
    "spark.sql.parquet.inferTimestampNTZ.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.parquet.outputTimestampType",
]


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry():
    return _load(os.path.join(REPO, "__spark_entry__.py"), "entry_for_default_session")


@pytest.fixture(scope="module")
def checker():
    return _load(os.path.join(REPO, "tools", "check_oracle.py"), "check_oracle")


@pytest.fixture(scope="module")
def default_spark(spark):
    """A sibling session with Spark-default semantics.

    ``newSession()`` shares the JVM/SparkContext but owns its SQLConf;
    ``conf.unset`` reverts each semantic knob to the stock default
    (NTZ inference ON — the driver's config that broke sessionize).
    """
    ns = spark.newSession()
    for k in _SEMANTIC_KNOBS:
        try:
            ns.conf.unset(k)
        except Exception:
            pass
    assert ns.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "true", (
        "default session must infer TIMESTAMP_NTZ — the driver-session "
        "condition this gate exists to reproduce"
    )
    # keep the test fast; partition COUNT is not a semantic knob
    ns.conf.set("spark.sql.shuffle.partitions", "4")
    return ns


@pytest.fixture(scope="module")
def oracle(checker):
    con = duckdb.connect()
    for t in checker.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _names(entry):
    return sorted(entry.queries().keys())


# collect the parametrize list at import time without building a session
_ENTRY_FOR_IDS = _load(os.path.join(REPO, "__spark_entry__.py"), "entry_ids_probe")
ALL_QUERIES = sorted(_ENTRY_FOR_IDS.queries().keys())


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_green_under_default_session(default_spark, entry, checker, oracle, name):
    qmap = entry.queries()
    omap = entry.oracle_sql()
    sdf = qmap[name](default_spark, SF_DIR).toPandas()
    s_rows, s_cols, s_hash = checker.canon(sdf)
    if name not in omap:
        # non-SQL-expressible ops get the driver's weaker rows-only check
        assert s_rows >= 0
        return
    odf = oracle.sql(omap[name]).df()
    o_rows, o_cols, o_hash = checker.canon(odf)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert s_rows == o_rows, f"{name}: row count {s_rows} vs {o_rows}"
    assert s_hash == o_hash, f"{name}: value hash mismatch under DEFAULT session"
