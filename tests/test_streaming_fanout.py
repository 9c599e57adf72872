"""Streaming fan-out feed (§2.8 × §2.9): continuous entity split."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.fanout import parse_entities
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)
from clinvar_ingest_spark.streaming.fanout import (
    PASSTHROUGH_TYPES,
    run_fanout_feed,
)


@pytest.fixture()
def seg_dir(tmp_path):
    """Changelog split into 3 closed segments (micro-batch boundaries)."""
    pdf = generate_changelog(ChangelogSpec(n_events=600, n_urls=120, seed=9))
    d = tmp_path / "segs"
    d.mkdir()
    for i, lo in enumerate(range(0, 600, 200)):
        part = pdf[(pdf["seq"] >= lo) & (pdf["seq"] < lo + 200)]
        pq.write_table(
            pa.Table.from_pandas(
                part, schema=changelog_arrow_schema(), preserve_index=False
            ),
            str(d / f"seg-{i}.parquet"),
        )
    return str(d)


def test_feed_equals_batch_parse(spark, seg_dir, tmp_path):
    """Union of the feed's per-batch appends == one batch parse of the
    whole changelog, for every passthrough stream."""
    out = str(tmp_path / "out")
    run_fanout_feed(
        spark, seg_dir, str(tmp_path / "ckpt"), out, max_files_per_trigger=1
    )
    cl = spark.read.parquet(seg_dir)
    want_tagged = parse_entities(cl.filter("op <> 'delete'")).persist()
    try:
        assert len(PASSTHROUGH_TYPES) == 10
        for et in PASSTHROUGH_TYPES:
            want = want_tagged.filter(F.col("entity_type") == et)
            got = spark.read.parquet(os.path.join(out, et))
            assert got.count() == want.count(), et
            # content equality on the FULL row multiset (k is NULL for
            # script/style, so n and warc_ts must be in the key too)
            key = F.concat_ws(
                "\x1f",
                "url",
                F.col("seq").cast("string"),
                F.coalesce("k", F.lit("")),
                F.coalesce("v", F.lit("")),
                F.col("n").cast("string"),
                F.col("warc_ts").cast("string"),
            )
            diff = (
                got.select(key.alias("x"))
                .exceptAll(want.select(key.alias("x")))
                .count()
            )
            assert diff == 0, et
        # more than one micro-batch actually ran (partitioned appends)
        batches = {
            f for f in os.listdir(os.path.join(out, "heading"))
            if f.startswith("batch=")
        }
        assert len(batches) >= 2
    finally:
        want_tagged.unpersist()


def test_feed_redelivery_no_op(spark, seg_dir, tmp_path):
    """Re-running with the SAME checkpoint re-emits nothing (Spark's
    offset log) — counts identical after the second drain."""
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")
    run_fanout_feed(spark, seg_dir, ck, out, max_files_per_trigger=1)
    n1 = spark.read.parquet(os.path.join(out, "anchor")).count()
    run_fanout_feed(spark, seg_dir, ck, out, max_files_per_trigger=1)
    n2 = spark.read.parquet(os.path.join(out, "anchor")).count()
    assert n1 == n2 > 0


def test_feed_rejects_treated_streams(spark, seg_dir, tmp_path):
    with pytest.raises(ValueError, match="stateful consumer"):
        run_fanout_feed(
            spark, seg_dir, str(tmp_path / "c"), str(tmp_path / "o"),
            entity_types=("page",),
        )


def test_feed_rejects_fresh_checkpoint_over_populated_out(
    spark, seg_dir, tmp_path
):
    """A NEW checkpoint lineage restarts epoch numbering at 0 — pointing
    it at an out_dir populated by an earlier lineage would silently mix
    stale and new batch partitions, so the feed refuses to start."""
    out = str(tmp_path / "out")
    run_fanout_feed(
        spark, seg_dir, str(tmp_path / "ckpt1"), out, max_files_per_trigger=1
    )
    with pytest.raises(ValueError, match="checkpoint .* is fresh"):
        run_fanout_feed(spark, seg_dir, str(tmp_path / "ckpt2"), out)


def test_feed_guard_resolves_paths_through_hadoop_fs(
    spark, seg_dir, tmp_path
):
    """The fresh-checkpoint guard resolves paths through Hadoop's
    FileSystem API: explicit file:// URIs (which os.path would treat as
    a literal directory name) drive the full guard end-to-end, and the
    populated-out_dir refusal still fires across lineages."""
    out = "file://" + str(tmp_path / "out")
    run_fanout_feed(
        spark, seg_dir, "file://" + str(tmp_path / "ckpt1"), out,
        max_files_per_trigger=1,
    )
    assert (tmp_path / "out").is_dir()  # the URI really landed locally
    with pytest.raises(ValueError, match="checkpoint .* is fresh"):
        run_fanout_feed(
            spark, seg_dir, "file://" + str(tmp_path / "ckpt2"), out
        )


def test_feed_guard_refuses_unreachable_filesystem(spark, seg_dir, tmp_path):
    """A filesystem the guard cannot reach (no s3a jars in this sandbox)
    must refuse to start the feed — an uninspectable out_dir is exactly
    the silent epoch-mix risk the guard exists for."""
    with pytest.raises(ValueError, match="cannot inspect"):
        run_fanout_feed(
            spark, seg_dir, str(tmp_path / "c"), "s3a://bucket/out"
        )
