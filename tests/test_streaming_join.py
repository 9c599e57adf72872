"""Stream-stream interval join: window boundaries, cross-batch
matching under a sufficient watermark, batch/stream agreement."""

from datetime import datetime

import pytest

from clinvar_ingest_spark.streaming.join import (
    EVENTS_SCHEMA,
    interval_join,
    run_click_attribution,
)


def _ev(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    full = [(i, ts, u, t, v, None) for i, ts, u, t, v in rows]
    return spark.createDataFrame(full, EVENTS_SCHEMA)


T0 = datetime(2024, 1, 1, 12, 0, 0)
T30 = datetime(2024, 1, 1, 12, 30, 0)
T60 = datetime(2024, 1, 1, 13, 0, 0)
T61 = datetime(2024, 1, 1, 13, 0, 1)


def test_window_boundaries_batch_form(spark):
    clicks = _ev(spark, [(1, T0, 7, "click", 0.0)])
    purchases = _ev(
        spark,
        [
            (2, T30, 7, "purchase", 5.0),   # inside
            (3, T60, 7, "purchase", 6.0),   # boundary: inclusive
            (4, T61, 7, "purchase", 7.0),   # one second past: excluded
            (5, T30, 8, "purchase", 8.0),   # other user: excluded
        ],
    )
    got = sorted(
        r["r.event_id"] if "r.event_id" in r.__fields__ else r["event_id"]
        for r in interval_join(clicks, purchases)
        .select("r.event_id")
        .collect()
    )
    assert got == [2, 3]


def test_streaming_matches_cross_batch(spark, tmp_path):
    """Clicks arrive in micro-batch 1, purchases in micro-batch 2: the
    click side is held in the state store (watermark not yet past it)
    and the pair still emits."""
    cdir, pdir = tmp_path / "clicks", tmp_path / "purchases"
    cdir.mkdir(), pdir.mkdir()
    _ev(spark, [(1, T0, 7, "click", 0.0)]).coalesce(1).write.parquet(
        str(cdir / "seg0"), mode="overwrite"
    )
    _ev(spark, [(2, T30, 7, "purchase", 5.0)]).coalesce(1).write.parquet(
        str(pdir / "seg0"), mode="overwrite"
    )
    out = str(tmp_path / "out")
    q = run_click_attribution(
        spark,
        str(cdir / "seg0"),
        str(pdir / "seg0"),
        str(tmp_path / "ckpt"),
        out,
        max_files_per_trigger=1,  # forces multiple micro-batches
    )
    q.awaitTermination(300)
    if q.isActive:  # pragma: no cover
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert [(r["click_id"], r["purchase_id"], r["purchase_cents"])
            for r in rows] == [(1, 2, 500)]
