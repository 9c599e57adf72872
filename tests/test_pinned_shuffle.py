"""Engine-owned apply-stage parallelism pin (round 5).

The apply shuffle hashes on ``_bucket`` and is compute-dense per byte;
AQE's bytes-based partition coalescing (and ``parallelismFirst``)
collapses it to ~one task wave per core, making the stage wall the max
bucket-group cost. ``CdcEngine`` therefore pins
``spark.sql.shuffle.partitions`` to the bucket count and disables
coalescing FOR THE APPLY ONLY, restoring the session conf after
(measured effect: BENCH_SCALING_R5 raw 2→8-core efficiency 0.73→0.87).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clinvar_ingest_spark.engine import CdcEngine, _pinned_shuffle
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)


@pytest.fixture()
def changelog_df(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_changelog(
        ChangelogSpec(n_events=400, n_urls=80, n_hosts=5, seed=11)
    )
    p = str(tmp_path / "changelog.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    return spark.read.parquet(p)


def test_pinned_shuffle_sets_and_restores(spark):
    conf = spark.conf
    before_parts = conf.get("spark.sql.shuffle.partitions")
    before_coal = conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    with _pinned_shuffle(spark, 999):
        assert conf.get("spark.sql.shuffle.partitions") == "999"
        assert (
            conf.get("spark.sql.adaptive.coalescePartitions.enabled")
            == "false"
        )
    assert conf.get("spark.sql.shuffle.partitions") == before_parts
    assert (
        conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == before_coal
    )


def test_pinned_shuffle_never_lowers(spark):
    before = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert before > 2
    with _pinned_shuffle(spark, 2):
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == before


def test_pinned_shuffle_restores_on_error(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with _pinned_shuffle(spark, 777):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_engine_apply_restores_session_conf(spark, tmp_path, changelog_df):
    # restore means "put back whatever was set BEFORE the apply", not a
    # fixed value — another test sharing the session may legitimately
    # have left a different coalescing setting
    before_parts = spark.conf.get("spark.sql.shuffle.partitions")
    before_coal = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled"
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    cl = changelog_df.filter(F.col("seq") < 200)
    eng.replay(cl, batch_size=100)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before_parts
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == before_coal
    )
    assert eng.pages().count() > 0


def test_pinned_shuffle_nested_and_overlapping(spark):
    """Overlapping pins on one session must restore the ORIGINAL conf —
    the exact leak test_concurrent_commit exposed: pin B saving pin A's
    values and restoring them last left the session pinned forever."""
    conf = spark.conf
    before_parts = conf.get("spark.sql.shuffle.partitions")
    before_coal = conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    with _pinned_shuffle(spark, 50):
        with _pinned_shuffle(spark, 200):
            # concurrent pins take the max of their requests
            assert conf.get("spark.sql.shuffle.partitions") == "200"
        # still pinned (refcount 1) — inner exit must NOT restore yet
        assert (
            conf.get("spark.sql.adaptive.coalescePartitions.enabled")
            == "false"
        )
    assert conf.get("spark.sql.shuffle.partitions") == before_parts
    assert (
        conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == before_coal
    )


def test_concurrent_engine_applies_restore_conf(spark, tmp_path, changelog_df):
    """Two engines applying in parallel threads on ONE session — after
    both finish, the session conf is back to its pre-apply values."""
    import threading

    before = spark.conf.get("spark.sql.shuffle.partitions")
    before_coal = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled"
    )
    cl = changelog_df.filter(F.col("seq") < 200)
    errs = []

    def run(i):
        try:
            eng = CdcEngine(spark, str(tmp_path / f"t{i}"), n_buckets=4)
            eng.replay(cl, batch_size=100)
        except Exception as e:  # surfaced below
            errs.append(e)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == before_coal
    )


def test_engine_pin_opt_out(spark, tmp_path, changelog_df):
    eng = CdcEngine(
        spark, str(tmp_path / "t"), n_buckets=4, pin_apply_parallelism=False
    )
    cl = changelog_df.filter(F.col("seq") < 100)
    stats = eng.replay(cl, batch_size=100)
    assert sum(s.n_events for s in stats) > 0
