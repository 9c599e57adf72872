"""Column-level LWW (patch-upsert fold): null = column untouched;
each column independently takes the latest non-null write."""

from clinvar_ingest_spark.operators.patch import patch_lww_state


def test_patch_fold_per_column(spark):
    # key k1: event 1 sets (a=1, b=x), event 2 sets only b=y, event 3
    # sets only a=3. Folded state must be a=3 (ev3), b=y (ev2).
    rows = [
        ("k1", 1, 1, "x"),
        ("k1", 2, None, "y"),
        ("k1", 3, 3, None),
        ("k2", 1, None, None),  # key whose events never touch a column
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "a", "b"])
    out = {
        r["k"]: r
        for r in patch_lww_state(
            df,
            keys=["k"],
            order_by=["seq"],
            patch_cols={"a": "a", "b": "b"},
            extra_aggs={"n": "count(*)"},
        ).collect()
    }
    assert (out["k1"]["a"], out["k1"]["b"], out["k1"]["n"]) == (3, "y", 3)
    # never-written columns stay NULL (not 0 / '')
    assert out["k2"]["a"] is None and out["k2"]["b"] is None


def test_patch_order_tiebreaker(spark):
    """Two writes at the same ts: the order_by tiebreaker decides —
    deterministically, not by arrival order."""
    rows = [
        ("k", 5, 2, "later-id-wins"),
        ("k", 5, 1, "earlier-id"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "event_id", "v"])
    out = patch_lww_state(
        df, ["k"], ["ts", "event_id"], {"v": "v"}
    ).collect()[0]
    assert out["v"] == "later-id-wins"


def test_patch_single_aggregate_plan(spark):
    """The fold is ONE hash aggregate with a map-side partial — the
    event stream itself never crosses the Exchange."""
    df = spark.createDataFrame([("k", 1, 1)], ["k", "seq", "a"])
    plan = (
        patch_lww_state(df, ["k"], ["seq"], {"a": "a"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "partial_max_by" in plan or "partial" in plan.lower()
