"""Metadata tables + AS-OF-timestamp travel.

Iceberg exposes table internals as queryable relations
(``table.snapshots`` / ``table.files`` / ``table.refs``) and resolves
``FOR SYSTEM_TIME AS OF`` from per-snapshot commit timestamps; the
reference's analogue is the ``processing_history`` table it maintains
by hand (schema/src/main/jade-tables/processing_history.table.json).
These are driver-side metadata reads — bounded by retention, never a
data scan — so the tests focus on consistency with the real manifests.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)


@pytest.fixture(scope="module")
def changelog_pdf():
    return generate_changelog(
        ChangelogSpec(n_events=1500, n_urls=200, n_hosts=6, seed=55)
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


def test_snapshots_df_matches_chain(spark, changelog_df, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=4)
    stats = eng.replay(changelog_df, batch_size=500)
    t = eng.table
    rows = {r["snapshot_id"]: r for r in t.snapshots_df(spark).collect()}
    assert set(rows) == set(t.history())
    # every replay commit is present with monotone commit_seq + time
    seqs = [rows[s.snapshot_id]["commit_seq"] for s in stats]
    assert seqs == sorted(seqs)
    times = [rows[s.snapshot_id]["committed_at"] for s in stats]
    assert all(a <= b for a, b in zip(times, times[1:]))
    head = rows[t.current_snapshot_id()]
    assert head["total_rows"] == eng.read().count()
    assert head["n_delta_files"] == 0


def test_files_df_matches_data(spark, changelog_df, tmp_path):
    eng = CdcEngine(
        spark, str(tmp_path / "pages"), n_buckets=4, write_mode="mor"
    )
    eng.replay(changelog_df, batch_size=500)
    t = eng.table
    fdf = t.files_df(spark).collect()
    # physical row counts agree with an unresolved read
    assert sum(r["rows"] for r in fdf) == t.read(spark, resolve=False).count()
    # every delta file advertises a key bloom, base files never do
    for r in fdf:
        assert r["has_key_bloom"] == (r["kind"] == "delta")
    eng.compact()
    assert all(r["kind"] == "base" for r in t.files_df(spark).collect())


def test_refs_df_lists_main_branches_tags(spark, changelog_df, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=4)
    eng.replay(changelog_df, batch_size=1500)
    t = eng.table
    t.create_branch("audit")
    t.create_tag("v1")
    refs = {(r["name"], r["type"]): r["snapshot_id"]
            for r in t.refs_df(spark).collect()}
    cur = t.current_snapshot_id()
    assert refs[("main", "branch")] == cur
    assert refs[("audit", "branch")] == cur
    assert refs[("v1", "tag")] == cur


def test_snapshot_as_of(spark, changelog_df, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=4)
    stats = eng.replay(changelog_df, batch_size=500)
    t = eng.table
    mid = stats[1].snapshot_id
    mid_at = t.manifest(mid).summary["committed_at"]
    nxt_at = t.manifest(stats[2].snapshot_id).summary["committed_at"]
    # exactly at the commit time → that snapshot; just before the next
    # commit → still that snapshot; far future → current head
    assert t.snapshot_as_of(mid_at) == mid
    assert t.snapshot_as_of((mid_at + nxt_at) / 2) == mid
    assert t.snapshot_as_of(nxt_at + 10**9) == t.current_snapshot_id()
    # the as-of read is a normal snapshot read
    assert t.read(spark, snapshot_id=mid).count() > 0
    with pytest.raises(FileNotFoundError):
        t.snapshot_as_of(0.0)  # before the table existed


def test_partitions_df_rollups(spark, changelog_df, tmp_path):
    """partitions_df aggregates the manifest: totals agree with files_df
    and the physical read; zero data files touched."""
    eng = CdcEngine(spark, str(tmp_path / "pages_p"), n_buckets=4)
    eng.replay(changelog_df, batch_size=500)
    parts = eng.table.partitions_df(spark).collect()
    files = eng.table.files_df(spark).collect()
    assert sum(p["n_files"] for p in parts) == len(files)
    assert sum(p["rows"] for p in parts) == eng.read().count()  # pure COW: raw == resolved
    by_bucket = {}
    for f in files:
        by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + f["rows"]
    for p in parts:
        assert p["rows"] == by_bucket[p["bucket"]]
        assert p["n_delta_files"] == 0  # pure-COW replay
