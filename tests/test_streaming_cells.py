"""Streaming cell-LWW feed: the last emission per url equals the batch
patch engine's resolved row; checkpoint redelivery emits nothing."""

import hashlib

import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)
from clinvar_ingest_spark.streaming.cells import run_cells_feed


@pytest.fixture()
def setup(spark, tmp_path):
    pdf = generate_changelog(
        ChangelogSpec(n_events=900, n_urls=120, seed=29, p_patch=0.35)
    )
    clp = str(tmp_path / "cl.parquet")
    write_changelog_parquet(pdf, clp)
    d = tmp_path / "segs"
    d.mkdir()
    for i in range(3):
        seg = pdf[(pdf["seq"] >= i * 300) & (pdf["seq"] < (i + 1) * 300)]
        write_changelog_parquet(seg, str(d / f"seg-{i:02d}.parquet"))
    return clp, str(d)


def _drain(spark, seg_dir, ckpt, name):
    q = run_cells_feed(spark, seg_dir, ckpt, query_name=name,
                       max_files_per_trigger=1)
    q.awaitTermination(300)
    if q.isActive:  # pragma: no cover
        q.stop()


def test_feed_converges_to_batch_engine(spark, tmp_path, setup):
    clp, seg_dir = setup
    _drain(spark, seg_dir, str(tmp_path / "ckpt"), "t_cells")
    feed = spark.sql("SELECT * FROM t_cells").toPandas()
    assert len(feed) > 0
    last = (
        feed.sort_values(["warc_ts", "seq"], kind="stable")
        .groupby("url", sort=False)
        .tail(1)
        .set_index("url")
    )

    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4, patch_ops=True)
    eng.replay(spark.read.parquet(clp), batch_size=300)
    live = {r["url"]: r for r in eng.live().collect()}
    dead = {
        r["url"]: r
        for r in eng.read().filter("_deleted").collect()
    }

    # every live engine row appears as the key's final LIVE emission
    for url, row in live.items():
        f = last.loc[url]
        assert bool(f["live"]), url
        assert f["seq"] == row["_seq"], url
        assert f["lang"] == row["lang"], url
        assert f["props"] == row["props"], url
        want_sha = (
            hashlib.sha256(bytes(row["html"])).hexdigest()
            if row["html"] is not None
            else None
        )
        assert f["html_sha"] == want_sha, url
    # every tombstone's final emission is live=false at the delete pos
    for url, row in dead.items():
        f = last.loc[url]
        assert not bool(f["live"]) and f["seq"] == row["_seq"], url


def test_null_warc_ts_event_emits_nat(spark, tmp_path):
    """A NULL-warc_ts event whose position becomes the observable row
    position must emit warc_ts=NULL, not overflow on the _NEG sentinel
    (the batch kernel masks this case; the feed must match)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "seq": pd.array([1, 2], dtype="int64"),
            "op": ["insert", "insert"],
            "url": ["http://null-ts.example/only", "http://real-ts.example/x"],
            "warc_ts": [pd.NaT, pd.Timestamp("2024-01-01T00:00:00")],
            "html": [b"<p>a</p>", b"<p>b</p>"],
            "lang": ["en", "de"],
            "schema_ver": pd.array([1, 1], dtype="int32"),
            "extra": [None, None],
        }
    )
    d = tmp_path / "segs_null"
    d.mkdir()
    write_changelog_parquet(pdf, str(d / "seg-00.parquet"))
    _drain(spark, str(d), str(tmp_path / "ckpt_null"), "t_cells_null")
    feed = (
        spark.sql("SELECT * FROM t_cells_null").toPandas().set_index("url")
    )
    f = feed.loc["http://null-ts.example/only"]
    assert pd.isna(f["warc_ts"])
    assert bool(f["live"]) and f["seq"] == 1 and f["lang"] == "en"
    g = feed.loc["http://real-ts.example/x"]
    assert g["warc_ts"] == pd.Timestamp("2024-01-01T00:00:00")


def test_duplicate_segment_emits_nothing(spark, tmp_path, setup):
    """A verbatim re-delivered segment (same events, later micro-batch)
    changes no observable state — zero additional emissions."""
    import shutil

    _, seg_dir = setup
    _drain(spark, seg_dir, str(tmp_path / "ckpt2"), "t_cells2")
    n = spark.sql("SELECT count(*) FROM t_cells2").first()[0]

    dup_dir = tmp_path / "segs_dup"
    shutil.copytree(seg_dir, dup_dir)
    # seg-99 sorts last -> delivered as the final micro-batch
    shutil.copy(
        str(dup_dir / "seg-00.parquet"), str(dup_dir / "seg-99.parquet")
    )
    _drain(spark, str(dup_dir), str(tmp_path / "ckpt3"), "t_cells3")
    assert spark.sql("SELECT count(*) FROM t_cells3").first()[0] == n
