"""Incrementally-maintained inverted index: maintained == full rebuild
at every snapshot, postings follow updates/deletes, refresh is
idempotent and hot-token capped."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.operators.index import InvertedIndex, url_tokens
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)


@pytest.fixture(scope="module")
def changelog(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("idx") / "cl.parquet")
    write_changelog_parquet(
        generate_changelog(ChangelogSpec(n_events=1200, n_urls=150, seed=13)), p
    )
    return spark.read.parquet(p)


def _rebuild(eng):
    """Full-rebuild reference: tokenize the live snapshot from scratch."""
    live = ~F.coalesce(F.col("_deleted"), F.lit(False))
    pairs = url_tokens(eng.read().filter(live))
    return {
        (r["token"], r["url"]) for r in pairs.collect()
    }


def _materialized(idx):
    return {
        (r["token"], u)
        for r in idx.read().collect()
        for u in r["urls"]
    }


def test_index_tracks_every_snapshot(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    idx = InvertedIndex(eng, str(tmp_path / "index"), n_buckets=8)
    for _ in eng.replay(changelog, batch_size=400):
        idx.refresh()
        assert idx.indexed_snapshot_id() == eng.table.current_snapshot_id()
        assert _materialized(idx) == _rebuild(eng)


def test_postings_sorted_and_deduped(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(changelog, batch_size=1200)
    idx = InvertedIndex(eng, str(tmp_path / "index"), n_buckets=8)
    idx.refresh()
    for r in idx.read().collect():
        assert list(r["urls"]) == sorted(set(r["urls"]))


def test_refresh_idempotent_and_single_hop(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(changelog.filter("seq < 400"), batch_size=400)
    idx = InvertedIndex(eng, str(tmp_path / "index"), n_buckets=8)
    s1 = idx.refresh()
    assert idx.refresh() == s1  # no movement -> no-op
    # 2 commits behind -> ONE delta hop
    eng.replay(changelog.filter("seq >= 400"), batch_size=400)
    idx.refresh()
    assert _materialized(idx) == _rebuild(eng)
    assert len(idx.table.history()) == 3  # genesis + 2 index commits


def test_delete_removes_postings(spark, tmp_path):
    pdf = generate_changelog(ChangelogSpec(n_events=200, n_urls=30, seed=5))
    p = str(tmp_path / "cl.parquet")
    write_changelog_parquet(pdf, p)
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=4)
    eng.replay(spark.read.parquet(p), batch_size=200)
    idx = InvertedIndex(eng, str(tmp_path / "index"), n_buckets=4)
    idx.refresh()
    victim = eng.pages().select("url").first()["url"]
    assert any(victim in r["urls"] for r in idx.read().collect())
    dels = pd.DataFrame(
        {
            "seq": [900],
            "op": ["delete"],
            "url": [victim],
            "warc_ts": [pd.Timestamp("2031-01-01")],
            "html": [None],
            "lang": ["en"],
            "schema_ver": [0],
            "extra": [None],
        }
    )
    p2 = str(tmp_path / "cl2.parquet")
    write_changelog_parquet(dels, p2)
    eng.replay(spark.read.parquet(p2), batch_size=100)
    idx.refresh()
    assert not any(victim in r["urls"] for r in idx.read().collect())
    assert _materialized(idx) == _rebuild(eng)


def test_point_lookup_prunes_to_one_bucket(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(changelog, batch_size=1200)
    idx = InvertedIndex(eng, str(tmp_path / "index"), n_buckets=8)
    idx.refresh()
    tok = idx.read().filter(F.size("urls") > 1).first()["token"]
    got = idx.postings(tok).collect()
    assert len(got) == 1 and got[0]["token"] == tok


def test_hot_token_cap(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(changelog, batch_size=1200)
    idx = InvertedIndex(eng, str(tmp_path / "index"), n_buckets=8, max_posting=50)
    idx.refresh()
    sizes = {r["token"]: len(r["urls"]) for r in idx.read().collect()}
    assert all(v <= 50 for v in sizes.values())
    # the fixture's every-url token is capped out: kept as an EMPTY
    # marker row (once capped, always capped — a later delta alone
    # could not reconstruct the full posting)
    assert sizes["page"] == 0
    # ... and it STAYS capped across a refresh that adds more pages
    import pandas as pd

    from clinvar_ingest_spark.sources.changelog import write_changelog_parquet

    adds = pd.DataFrame(
        {
            "seq": [5000],
            "op": ["insert"],
            "url": ["https://hostX.example.com/page/999999"],
            "warc_ts": [pd.Timestamp("2031-06-01")],
            "html": [b"<html><body>x</body></html>"],
            "lang": ["en"],
            "schema_ver": [0],
            "extra": [None],
        }
    )
    p2 = str(tmp_path / "cl_add.parquet")
    write_changelog_parquet(adds, p2)
    eng.replay(spark.read.parquet(p2), batch_size=100)
    idx.refresh()
    sizes2 = {r["token"]: len(r["urls"]) for r in idx.read().collect()}
    assert sizes2["page"] == 0  # did NOT resurrect with a partial posting
