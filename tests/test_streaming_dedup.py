"""Watermarked streaming dedup: emitted set == distinct events; state
bounded by the watermark; checkpoint redelivery no-ops."""

import glob

import pytest

from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)
from clinvar_ingest_spark.streaming.dedup import run_dedup_feed


@pytest.fixture()
def setup(tmp_path):
    # 10% duplicates so the dedup visibly bites
    pdf = generate_changelog(
        ChangelogSpec(n_events=1200, n_urls=200, seed=23, duplicate_rate=0.10)
    )
    d = tmp_path / "segs"
    d.mkdir()
    half = 600
    write_changelog_parquet(pdf[pdf["seq"] < half], str(d / "seg-00.parquet"))
    write_changelog_parquet(pdf[pdf["seq"] >= half], str(d / "seg-01.parquet"))
    return str(d), pdf


def _drain(spark, seg_dir, ckpt, out):
    q = run_dedup_feed(spark, seg_dir, ckpt, out, max_files_per_trigger=1)
    q.awaitTermination(300)
    if q.isActive:  # pragma: no cover
        q.stop()


def test_dedup_emits_distinct_events(spark, tmp_path, setup):
    seg_dir, pdf = setup
    out = str(tmp_path / "out")
    _drain(spark, seg_dir, str(tmp_path / "ckpt"), out)

    got = spark.read.parquet(out)
    n_raw = len(pdf)
    n_distinct = pdf["seq"].nunique()
    assert n_distinct < n_raw  # the fixture really contains duplicates
    assert got.count() == n_distinct
    # emitted rows are exactly the distinct events (seq is the event id)
    assert got.select("seq").distinct().count() == n_distinct


def test_dedup_redelivery_noop(spark, tmp_path, setup):
    """Restarting against the same checkpoint re-reads nothing: the
    sink gains no rows."""
    seg_dir, pdf = setup
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _drain(spark, seg_dir, ckpt, out)
    n_files = len(glob.glob(out + "/*.parquet"))
    n_rows = spark.read.parquet(out).count()
    _drain(spark, seg_dir, ckpt, out)  # same checkpoint: no new input
    assert spark.read.parquet(out).count() == n_rows
    assert len(glob.glob(out + "/*.parquet")) == n_files


def test_cross_segment_duplicates_dropped(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch (still inside the
    watermark) is dropped, not just intra-batch ones."""
    import pandas as pd

    pdf = generate_changelog(
        ChangelogSpec(n_events=400, n_urls=100, seed=5, duplicate_rate=0.0)
    )
    d = tmp_path / "segs"
    d.mkdir()
    first = pdf[pdf["seq"] < 200]
    # second segment = rest PLUS a verbatim replay of 50 early events
    second = pd.concat([pdf[pdf["seq"] >= 200], first.head(50)])
    write_changelog_parquet(first, str(d / "seg-00.parquet"))
    write_changelog_parquet(second, str(d / "seg-01.parquet"))

    out = str(tmp_path / "out3")
    _drain(spark, str(d), str(tmp_path / "ckpt3"), out)
    got = spark.read.parquet(out)
    assert got.count() == pdf["seq"].nunique()
