"""Watermarked streaming deduplication — bounded-state redelivery
absorption at the SOURCE side of the pipeline.

The engine's exactly-once ledger (streaming/ledger.py) dedupes at BATCH
granularity (a redelivered micro-batch no-ops); this operator dedupes at
EVENT granularity inside the stream itself, with state bounded by the
watermark: ``dropDuplicatesWithinWatermark`` keeps one state entry per
key only until event time passes ``delay``, so a 10^10-event stream
holds state proportional to the duplicate horizon, not the stream
length (plain ``dropDuplicates`` on an unbounded stream would grow
state forever — the classic production incident this API exists for).

The changelog generator's duplicates are verbatim re-emissions sharing
``seq`` (sources/changelog.py duplicate_rate), so the emitted set has an
exact batch mirror: one row per distinct event. First-arrival wins and
duplicates are byte-identical, so emission is deterministic row-wise
even though arrival order inside a micro-batch is not.

Reference parallel: the reference tolerates re-delivered release files
via idempotent count gates (count-processing-history-rows.sh); here the
same guarantee is continuous and stateful.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def stream_dedup(
    stream: DataFrame,
    keys: Sequence[str] = ("seq",),
    event_time: str = "warc_ts",
    delay: str = "2 hours",
) -> DataFrame:
    """Drop re-delivered events within the watermark horizon.

    ``keys`` identifies an event (the changelog's ``seq`` is unique per
    original event; duplicates share it). State: one entry per key seen
    in the last ``delay`` of event time — evicted when the watermark
    passes, after which an EXTREMELY late duplicate would be re-emitted
    (the documented trade; widen ``delay`` to widen the guarantee).
    """
    return stream.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_dedup_feed(
    spark,
    changelog_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    keys: Sequence[str] = ("seq",),
    delay: str = "2 hours",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Tail changelog segments → watermarked dedup → append parquet
    sink. Returns the StreamingQuery (availableNow self-terminates)."""
    from clinvar_ingest_spark.streaming.tail import CHANGELOG_SCHEMA

    reader = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(changelog_dir)
    deduped = stream_dedup(stream, keys=keys, delay=delay)
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
