"""Watermarked windowed rollups over the changelog tail.

The reference computes per-release aggregate gates (row counts per
release_date, orchestration/scripts/count-processing-history-rows.sh);
the streaming analogue is an event-time windowed aggregate with a
watermark bounding lateness — late events inside the bound revise their
window, older ones are dropped (reference parallel: LWW absorbs late
deliveries inside a release, ArchiveBranches.scala:140-156).

``host_window_counts`` is the plan used both batch-side (for tests /
backfill parity) and stream-side (Structured Streaming with watermark +
append mode): per (event-time window, host) event counts and op mix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_host(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    )


def host_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per (window, host): event count + per-op counts.

    Pass ``watermark`` (e.g. ``"2 hours"``) on a streaming DataFrame to
    bound state: windows close once event time passes window_end +
    watermark, after which later events are dropped instead of revising
    closed windows (exactly the micro-batch lateness contract).
    """
    df = with_host(events)
    if watermark is not None:
        df = df.withWatermark("warc_ts", watermark)
    return (
        df.groupBy(F.window("warc_ts", window).alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("op") == "insert", 1).otherwise(0)).alias("n_inserts"),
            F.sum(F.when(F.col("op") == "update", 1).otherwise(0)).alias("n_updates"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_events",
            "n_inserts",
            "n_updates",
            "n_deletes",
        )
    )


def stream_host_window_counts(
    spark,
    changelog_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming rollup: tail changelog segments → watermarked windowed
    counts → parquet append sink. Returns the StreamingQuery."""
    from clinvar_ingest_spark.streaming.tail import CHANGELOG_SCHEMA

    stream = spark.readStream.schema(CHANGELOG_SCHEMA).parquet(changelog_dir)
    agg = host_window_counts(stream, window=window, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
