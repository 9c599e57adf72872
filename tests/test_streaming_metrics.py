"""Watermarked windowed rollups (SURVEY.md §2.9): streaming result must
equal the batch plan for windows the watermark has closed."""

import os

import pytest

from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)
from clinvar_ingest_spark.streaming.metrics import (
    host_window_counts,
    stream_host_window_counts,
)


@pytest.fixture()
def segments(tmp_path):
    df = generate_changelog(ChangelogSpec(n_events=2000, n_urls=300, seed=21))
    d = tmp_path / "segs"
    d.mkdir()
    per = 500
    for i in range(4):
        seg = df[(df["seq"] >= i * per) & (df["seq"] < (i + 1) * per)]
        write_changelog_parquet(seg, str(d / f"seg-{i:02d}.parquet"))
    return str(d)


def test_batch_rollup_counts(spark, segments):
    cl = spark.read.parquet(segments)
    agg = host_window_counts(cl, window="1 hour")
    total = agg.agg({"n_events": "sum"}).collect()[0][0]
    assert total == cl.count()
    r = agg.first()
    assert r["window_end"] > r["window_start"]
    assert r["n_events"] >= r["n_inserts"] + r["n_updates"] + r["n_deletes"]


def test_stream_rollup_matches_batch_for_closed_windows(spark, tmp_path, segments):
    out = str(tmp_path / "out")
    q = stream_host_window_counts(
        spark, segments, str(tmp_path / "ckpt"), out,
        window="1 hour", watermark="2 hours",
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    got = spark.read.parquet(out)
    batch = host_window_counts(spark.read.parquet(segments), window="1 hour")

    # append mode emits only windows the watermark closed; every emitted
    # row must exactly match the batch computation for that window/host
    joined = got.join(
        batch,
        ["window_start", "window_end", "host"],
        "left",
    ).select(
        got["n_events"].alias("g"),
        batch["n_events"].alias("b"),
    )
    rows = joined.collect()
    assert len(rows) > 0
    assert all(r["g"] == r["b"] for r in rows)
