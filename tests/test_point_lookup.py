"""Point lookups: bucket pruning + per-delta-file key bloom skipping.

The lookup must be plannable from manifest metadata alone (Iceberg's
file-stats contract; the reference's analogue is BigQuery clustered
tables). Bloom false positives only cost an extra file open; a false
negative would silently drop a row — so correctness tests compare
every lookup against the full resolved read.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.lakelet.bloom import bloom_build, bloom_maybe_contains
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)


def test_bloom_no_false_negatives_and_low_fpp():
    keys = [f"https://h{i % 17:03d}.example.com/page/{i:06d}" for i in range(4000)]
    b = bloom_build(keys)
    assert all(bloom_maybe_contains(b, k) for k in keys)  # the hard rule
    absent = [f"https://absent{i:03d}.example.com/x/{i:06d}" for i in range(2000)]
    fpp = sum(bloom_maybe_contains(b, k) for k in absent) / len(absent)
    assert fpp < 0.05, fpp


def test_bloom_empty_and_none_keys():
    b = bloom_build([])
    assert not bloom_maybe_contains(b, "anything")
    b2 = bloom_build(["a", None, "b"])
    assert bloom_maybe_contains(b2, "a") and bloom_maybe_contains(b2, "b")


@pytest.fixture(scope="module")
def changelog_pdf():
    return generate_changelog(
        ChangelogSpec(n_events=2000, n_urls=300, n_hosts=8, seed=77)
    )


@pytest.fixture()
def changelog_df(spark, changelog_pdf, tmp_path):
    p = str(tmp_path / "changelog.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            changelog_pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    return spark.read.parquet(p)


def _expected(eng, url):
    rows = (
        eng.read()
        .filter(f"url = '{url}'")
        .filter("NOT coalesce(_deleted, false)")
        .collect()
    )
    return {(r["url"], str(r["warc_ts"]), r["_seq"]) for r in rows}


def _got(eng, url, stats_out=None):
    return {
        (r["url"], str(r["warc_ts"]), r["_seq"])
        for r in eng.lookup(url, stats_out=stats_out).collect()
    }


def test_mor_lookup_skips_deltas_and_matches_full_read(
    spark, changelog_pdf, changelog_df, tmp_path
):
    eng = CdcEngine(
        spark, str(tmp_path / "pages"), n_buckets=4, write_mode="mor"
    )
    # many small batches → a deep delta stack per bucket
    eng.replay(changelog_df, batch_size=200)

    urls = sorted(changelog_pdf["url"].unique())[:12]
    skipped_total = 0
    for url in urls:
        stats: dict = {}
        assert _got(eng, url, stats) == _expected(eng, url)
        assert stats["files_read"] <= stats["files_in_bucket"]
        skipped_total += stats["files_skipped"]
    # 10 batches touch ~200 of 300 urls each; a given url misses several
    # batches, so blooms must skip a meaningful number of delta files
    assert skipped_total > 0

    # a key that never existed: metadata-only miss is allowed to read
    # the base file but must return nothing
    stats = {}
    assert _got(eng, "https://nope.example.com/x", stats) == set()


def test_lookup_deleted_key_is_empty_but_tombstone_wins(
    spark, changelog_pdf, changelog_df, tmp_path
):
    eng = CdcEngine(
        spark, str(tmp_path / "pages"), n_buckets=4, write_mode="mor"
    )
    eng.replay(changelog_df, batch_size=200)
    # find a url whose global LWW winner is a delete
    dead = (
        eng.read()
        .filter("coalesce(_deleted, false)")
        .select("url")
        .limit(1)
        .collect()
    )
    if not dead:
        pytest.skip("fixture produced no delete-winners")
    url = dead[0]["url"]
    assert _got(eng, url) == set()
    raw = eng.table.read_key(spark, url).collect()
    assert len(raw) == 1 and raw[0]["_deleted"]


def test_lookup_after_compaction_same_answers(
    spark, changelog_pdf, changelog_df, tmp_path
):
    eng = CdcEngine(
        spark, str(tmp_path / "pages"), n_buckets=4, write_mode="mor"
    )
    eng.replay(changelog_df, batch_size=200)
    urls = sorted(changelog_pdf["url"].unique())[:8]
    before = {u: _got(eng, u) for u in urls}
    eng.compact()
    for u in urls:
        stats: dict = {}
        assert _got(eng, u, stats) == before[u]
        # compacted bucket: exactly one base file, nothing to skip
        assert stats["files_in_bucket"] == 1
        assert stats["files_skipped"] == 0


def test_lookup_cow_table_single_file(spark, changelog_df, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=4)
    eng.replay(changelog_df, batch_size=1000)
    url = eng.pages().select("url").limit(1).collect()[0]["url"]
    stats: dict = {}
    got = _got(eng, url, stats)
    assert len(got) == 1
    assert stats["files_in_bucket"] == 1 and stats["files_read"] == 1
