"""Streaming fan-out feed — the continuous form of the 15-way entity
split (SURVEY.md §2.8 × §2.9).

The reference fans each release's archives out to 15 entity tables in
one batch pass (ArchiveBranches.scala:52-113). This feed does the same
continuously: tail the changelog, parse each micro-batch ONCE
(`operators/fanout.parse_entities`), and append every passthrough
entity stream to its own partitioned parquet table.

Exactly-once contract: each micro-batch writes every entity's rows
under ``out_dir/<entity>/batch=<epoch>/`` with ``overwrite`` — the
write is idempotent per (checkpoint, epoch), so a crashed/retried
trigger rewrites the same deterministic directory instead of
duplicating rows (the standard foreachBatch idempotent-sink recipe,
same shape as the engine's ledger-keyed applies).

Treatment split: only the 10 PASSTHROUGH streams append incrementally
— the 4 dedupByDate streams and the host aggregate are CUMULATIVE
reductions, so their continuous form is a stateful consumer over the
appended feed (``streaming/stateful.run_lww_feed`` keyed on the entity
id gives exactly the dedup'd streams; ``fanout_archive`` gives them in
batch). Emitting "deduped-so-far" per micro-batch here would be a
different (retractionful) contract — see ``streaming/stateful.py`` for
that form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from clinvar_ingest_spark.operators.fanout import (
    AGGREGATE_TYPES,
    DEDUP_ID_COL,
    ENTITY_TYPES,
    parse_entities,
)

#: the 10 streams the reference passes through untreated
PASSTHROUGH_TYPES = tuple(
    et
    for et in ENTITY_TYPES
    if et not in DEDUP_ID_COL and et not in AGGREGATE_TYPES
)


def _fs_check(spark, path: str, *, as_dir: bool = False) -> bool:
    """Existence (or directory-ness) of ``path`` through Hadoop's
    FileSystem API — valid for every scheme the session's Hadoop conf
    can reach, unlike ``os.path``, which reports any remote URI as
    absent. A filesystem the guard cannot reach raises instead of
    returning False: a guard that cannot look must refuse, not pass."""
    jvm = spark._jvm
    try:
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if as_dir:
            return bool(
                fs.exists(hpath) and fs.getFileStatus(hpath).isDirectory()
            )
        return bool(fs.exists(hpath))
    except Exception as e:
        raise ValueError(
            f"fresh-checkpoint guard cannot inspect {path!r} "
            f"({e.__class__.__name__}): checkpoint_dir and out_dir must "
            "be reachable through Hadoop FileSystem before the feed "
            "starts — fix the scheme/credentials/jars or use a "
            "reachable path"
        ) from e


def run_fanout_feed(
    spark,
    seg_dir: str | None,
    checkpoint_dir: str,
    out_dir: str,
    entity_types: tuple[str, ...] = PASSTHROUGH_TYPES,
    max_files_per_trigger: int = 8,
    timeout_secs: float = 600.0,
    source=None,
) -> None:
    """Drain the changelog segment dir through the fan-out parse,
    appending each entity stream under ``out_dir/<entity>/`` (one
    ``batch=<epoch>`` partition per micro-batch, idempotent rewrite).

    ``source``: any ``bus.ChangelogSource`` — defaults to the file
    analogue over ``seg_dir``; pass ``bus.KafkaChangelogSource(...)``
    on a cluster with the Kafka package (same seam as
    ``streaming/tail.tail_changelog``).

    Read an entity's accumulated stream back with
    ``spark.read.parquet(os.path.join(out_dir, entity))`` — the
    ``batch=N`` layer is a plain partition column.

    The epoch-keyed overwrite is idempotent only WITHIN one checkpoint
    lineage — epoch numbering restarts at 0 under a fresh checkpoint,
    so pointing a new lineage at a populated ``out_dir`` would mix
    stale and new partitions silently. That combination is refused;
    delete (or re-point) ``out_dir`` when resetting the checkpoint.
    """
    bad = [et for et in entity_types if et not in PASSTHROUGH_TYPES]
    if bad:
        raise ValueError(
            f"{bad} are not passthrough streams — dedup'd/aggregated "
            "entities need a stateful consumer (see module docstring)"
        )
    # The guard resolves paths through Hadoop's FileSystem API, so any
    # scheme the session can actually write to (file://, hdfs://,
    # s3a://, …) is also inspectable; os.path here would report remote
    # URIs as absent and the fresh-lineage-over-populated-out_dir
    # refusal would silently pass — the exact mix failure it exists to
    # refuse. An UNREACHABLE filesystem is itself a refusal, never a
    # silent pass.
    fresh_lineage = not _fs_check(
        spark, os.path.join(checkpoint_dir, "offsets")
    )
    populated = any(
        _fs_check(spark, os.path.join(out_dir, et), as_dir=True)
        for et in entity_types
    )
    if fresh_lineage and populated:
        raise ValueError(
            f"out_dir {out_dir!r} already holds entity batches but "
            f"checkpoint {checkpoint_dir!r} is fresh — epoch numbering "
            "would restart at 0 and mix stale with new partitions; "
            "remove the out_dir (or reuse the original checkpoint)"
        )
    if source is None:
        from clinvar_ingest_spark.bus import FileChangelogSource

        source = FileChangelogSource(seg_dir, max_files_per_trigger)
    stream = source.stream(spark)

    def fan_batch(batch: DataFrame, epoch_id: int) -> None:
        tagged = parse_entities(
            batch.filter(F.col("op") != "delete")
        ).persist()
        try:
            for et in entity_types:
                (
                    tagged.filter(F.col("entity_type") == et)
                    .drop("entity_type")
                    .write.mode("overwrite")
                    .parquet(os.path.join(out_dir, et, f"batch={epoch_id}"))
                )
        finally:
            tagged.unpersist()

    q = (
        stream.writeStream.foreachBatch(fan_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_secs):
            raise TimeoutError(
                f"fanout feed did not drain within {timeout_secs}s"
            )
    finally:
        if q.isActive:
            q.stop()
