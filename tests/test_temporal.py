"""As-of join + sessionization vs brute-force / hand-computed oracles."""

from __future__ import annotations

import datetime as dt

import pytest

from clinvar_ingest_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute, seconds=second)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, _ts(0), 100, "t0"),
        (1, _ts(10), 101, "t1"),
        (1, _ts(10), 102, "t1b"),  # duplicate ts → tie on id (102 wins)
        (2, _ts(5), 200, "t2"),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, id long, v string")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, _ts(0), 1, "before-all"),  # equal ts as left t0 → inclusive match
        (1, _ts(7), 2, "mid"),
        (1, _ts(10), 3, "at-t1"),
        (2, _ts(6), 4, "after-left"),  # after left's only row → no match
        (3, _ts(1), 5, "other-key"),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, id long, q string")


def test_asof_basic(trades, quotes):
    out = (
        asof_join(trades, quotes, ["k"], payload=["q"], tie_col="id")
        .orderBy("k", "ts", "id")
        .collect()
    )
    # left t0 @0: match quote @0 (inclusive)
    assert out[0]["asof_q"] == "before-all" and out[0]["asof_ts"] == _ts(0)
    # left t1/t1b @10: match quote @10
    assert out[1]["asof_q"] == "at-t1"
    assert out[2]["asof_q"] == "at-t1"
    # k=2 @5: quote is @6 (later) → NULL
    assert out[3]["asof_q"] is None and out[3]["asof_ts"] is None


def test_asof_right_duplicate_ts_is_deterministic(spark, trades):
    dup = spark.createDataFrame(
        [(1, _ts(0), 10, "lo"), (1, _ts(0), 20, "hi")],
        "k long, ts timestamp, id long, q string",
    )
    out = asof_join(trades, dup, ["k"], payload=["q"], tie_col="id").collect()
    matched = {r["id"]: r["asof_q"] for r in out if r["k"] == 1}
    assert set(matched.values()) == {"hi"}  # max id wins, always


def test_asof_tolerance(trades, quotes):
    out = asof_join(
        trades, quotes, ["k"], payload=["q"], tie_col="id", tolerance_seconds=60
    ).collect()
    by_id = {r["id"]: r for r in out}
    # t1 @10 matches quote @10 (gap 0 ≤ 60 s)
    assert by_id[101]["asof_q"] == "at-t1"
    # t0 @0 matches quote @0 exactly (gap 0)
    assert by_id[100]["asof_q"] == "before-all"
    tight = asof_join(
        trades.filter("id = 101"),
        quotes.filter("q = 'mid'"),
        ["k"],
        payload=["q"],
        tie_col="id",
        tolerance_seconds=60,
    ).collect()
    # only candidate is @7, gap 180 s > 60 → suppressed
    assert tight[0]["asof_q"] is None


def test_asof_matches_bruteforce_on_fixture(spark):
    """Randomized (seeded) cross-check against the O(L·R) definition."""
    import random

    rnd = random.Random(42)
    L = [(rnd.randrange(4), _ts(0, rnd.randrange(3600)), i) for i in range(120)]
    R = [
        (rnd.randrange(4), _ts(0, rnd.randrange(3600)), 1000 + i, f"p{i}")
        for i in range(80)
    ]
    ldf = spark.createDataFrame(L, "k long, ts timestamp, id long")
    rdf = spark.createDataFrame(R, "k long, ts timestamp, id long, p string")
    got = {
        r["id"]: (r["asof_ts"], r["asof_p"])
        for r in asof_join(ldf, rdf, ["k"], payload=["p"], tie_col="id").collect()
    }
    for k, ts, i in L:
        cands = [r for r in R if r[0] == k and r[1] <= ts]
        if not cands:
            assert got[i] == (None, None)
        else:
            best = max(cands, key=lambda r: (r[1], r[2]))
            assert got[i] == (best[1], best[3]), i


def test_asof_plan_single_exchange(trades, quotes):
    plan = asof_join(trades, quotes, ["k"], payload=["q"], tie_col="id")._jdf.queryExecution().executedPlan().toString()
    # right-side dedup shuffles on (k, ts); the sweep shuffles on k; no joins at all
    assert "Join" not in plan
    assert plan.count("Exchange") <= 3  # dedup partial/final + window


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, _ts(0), 1),
        (1, _ts(10), 2),  # gap 600 s ≤ 1800 → same session
        (1, _ts(50), 3),  # gap 2400 s > 1800 → new session
        (1, _ts(55), 4),
        (2, _ts(0), 5),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, id long")
    out = {
        r["id"]: r["session_n"]
        for r in sessionize(df, ["user"], "ts", 1800, tie_cols=["id"]).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_exact_gap_is_same_session(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(30), 2)], "user long, ts timestamp, id long"
    )
    out = sessionize(df, ["user"], "ts", 1800, tie_cols=["id"]).collect()
    assert {r["session_n"] for r in out} == {1}  # 1800 s gap is NOT > gap


def test_session_stats(spark):
    rows = [
        (1, _ts(0), 1, 2.0),
        (1, _ts(10), 2, 3.0),
        (1, _ts(50), 3, 5.0),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, id long, value double")
    out = {
        (r["user"], r["session_n"]): r
        for r in session_stats(
            df, ["user"], "ts", 1800, tie_cols=["id"], value_col="value"
        ).collect()
    }
    s1 = out[(1, 1)]
    assert s1["n_events"] == 2 and s1["total_value"] == 5.0
    assert s1["session_start"] == _ts(0) and s1["session_end"] == _ts(10)
    assert out[(1, 2)]["n_events"] == 1


def test_session_stats_matches_builtin_session_window(spark):
    """A/B vs Spark's built-in F.session_window: same gap semantics on
    strict-less comparisons? The built-in treats a gap EQUAL to the
    duration as the SAME session closing boundary differently — it uses
    [start, last+gap) half-open windows, i.e. an event exactly gap
    after the previous one starts a NEW session, while our sessionize
    keeps it (> vs >=). Verify agreement everywhere ties don't occur
    and document the off-by-boundary difference where they do."""
    import random

    rnd = random.Random(9)
    rows = [
        (rnd.randrange(5), _ts(0, rnd.randrange(7200)), i, 1.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, id long, value double")
    from pyspark.sql import functions as F

    ours = session_stats(df, ["user"], "ts", 600, tie_cols=["id"]).select(
        "user", "session_start", "session_end", "n_events"
    )
    builtin = (
        df.groupBy("user", F.session_window("ts", "600 seconds").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user", "session_start", "session_end", "n_events")
    )
    a = sorted(map(tuple, ours.collect()))
    b = sorted(map(tuple, builtin.collect()))
    # random microsecond timestamps -> no exact-gap ties -> must agree
    assert a == b


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1)], "user long, ts timestamp, id long"
    )
    plan = (
        sessionize(df, ["user"], "ts", 1800, tie_cols=["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # lag + running sum share one shuffle
