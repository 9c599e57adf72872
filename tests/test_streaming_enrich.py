"""Stream-static enrichment: per-micro-batch broadcast join against a
pinned engine snapshot; flags equal the batch recompute; the stream
side never shuffles."""

import os

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)
from clinvar_ingest_spark.streaming.enrich import enrich_with_state, run_enrich_feed


@pytest.fixture()
def setup(spark, tmp_path):
    pdf = generate_changelog(ChangelogSpec(n_events=1000, n_urls=200, seed=31))
    clp = str(tmp_path / "cl.parquet")
    write_changelog_parquet(pdf, clp)
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(spark.read.parquet(clp).filter(F.col("seq") < 500), batch_size=500)
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    write_changelog_parquet(
        pdf[pdf["seq"] >= 500], str(seg_dir / "seg-01.parquet")
    )
    return eng, str(seg_dir), pdf


def test_enrich_flags_match_batch(spark, tmp_path, setup):
    eng, seg_dir, pdf = setup
    out = str(tmp_path / "out")
    q = run_enrich_feed(spark, seg_dir, str(tmp_path / "ckpt"), out, eng.live())
    q.awaitTermination(300)
    if q.isActive:  # pragma: no cover
        q.stop()
    got = {r["seq"]: r["was_known"] for r in spark.read.parquet(out).collect()}

    known = {r["url"] for r in eng.live().select("url").collect()}
    second = pdf[pdf["seq"] >= 500]
    assert len(got) == second["seq"].nunique()
    for _, ev in second.iterrows():
        assert got[ev["seq"]] == (ev["url"] in known), ev["url"]


def test_enrich_plan_broadcasts_dim(spark, setup):
    """Batch form of the same join: BroadcastHashJoin, and the
    broadcast side is the one-column key set."""
    eng, _, _ = setup
    stream_like = eng.spark.createDataFrame(
        [(1, "http://a/x")], ["seq", "url"]
    )
    plan = (
        enrich_with_state(stream_like, eng.live())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_enrich_unknown_keys_flag_false(spark, setup):
    eng, _, _ = setup
    df = spark.createDataFrame([(1, "http://never-seen/x")], ["seq", "url"])
    row = enrich_with_state(df, eng.live()).collect()[0]
    assert row["was_known"] is False
