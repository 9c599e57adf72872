"""Structured-Streaming changelog tail (SURVEY.md §2.9): the streaming
driver must produce the identical final state as the manual replay loop,
and redelivery (fresh checkpoint over already-applied segments) must
no-op via the ledger — exactly-once lives in the engine, not Spark."""

import os

import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)
from clinvar_ingest_spark.streaming.tail import tail_until_drained

N_EVENTS = 2_000
N_SEGMENTS = 4


@pytest.fixture()
def segments_dir(tmp_path):
    """Changelog split into closed segment files, like rotated binlog."""
    df = generate_changelog(ChangelogSpec(n_events=N_EVENTS, n_urls=400, seed=7))
    d = tmp_path / "segments"
    d.mkdir()
    per = N_EVENTS // N_SEGMENTS
    for i in range(N_SEGMENTS):
        seg = df[(df["seq"] >= i * per) & (df["seq"] < (i + 1) * per)]
        write_changelog_parquet(seg, str(d / f"segment-{i:04d}.parquet"))
    return str(d)


def test_tail_matches_manual_replay(spark, tmp_path, segments_dir):
    streamed = CdcEngine(spark, str(tmp_path / "t_stream"), n_buckets=8)
    tail_until_drained(
        streamed, segments_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )

    manual = CdcEngine(spark, str(tmp_path / "t_manual"), n_buckets=8)
    manual.replay(spark.read.parquet(segments_dir), batch_size=N_EVENTS // N_SEGMENTS)

    assert streamed.state_hash() == manual.state_hash()
    assert streamed.pages().count() > 0
    # one ledger record per non-empty micro-batch, all with lineage
    recs = streamed.ledger.all_records()
    assert len(recs) == N_SEGMENTS
    assert all(r["n_events"] > 0 and r["snapshot_id"] for r in recs)


def test_tail_redelivery_noops(spark, tmp_path, segments_dir):
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    tail_until_drained(eng, segments_dir, str(tmp_path / "ckpt1"))
    h1 = eng.state_hash()
    n_snapshots = len(eng.table.history())

    # fresh checkpoint: Spark redelivers every segment; ledger short-circuits
    tail_until_drained(eng, segments_dir, str(tmp_path / "ckpt2"))
    assert eng.state_hash() == h1
    assert len(eng.table.history()) == n_snapshots


def test_tail_resumes_from_checkpoint(spark, tmp_path, segments_dir):
    """New segments arriving after a drain are picked up incrementally."""
    d_partial = tmp_path / "partial"
    d_partial.mkdir()
    segs = sorted(os.listdir(segments_dir))
    for s in segs[:2]:
        os.link(os.path.join(segments_dir, s), d_partial / s)

    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    tail_until_drained(eng, str(d_partial), ckpt, max_files_per_trigger=1)
    assert len(eng.ledger.all_records()) == 2

    for s in segs[2:]:
        os.link(os.path.join(segments_dir, s), d_partial / s)
    tail_until_drained(eng, str(d_partial), ckpt, max_files_per_trigger=1)

    full = CdcEngine(spark, str(tmp_path / "t_full"), n_buckets=8)
    full.replay(spark.read.parquet(segments_dir), batch_size=N_EVENTS // N_SEGMENTS)
    assert eng.state_hash() == full.state_hash()
