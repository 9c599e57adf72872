"""Watermarked stream-stream interval join.

The remaining Structured-Streaming primitive in the §2.9 family: two
live streams joined on a key PLUS an event-time range (clicks ⋈
purchases within an attribution window — the canonical funnel join).
Spark keeps both sides in the state store and evicts rows once the
watermark proves no future match can arrive: state is bounded by
``watermark + window``, not stream length — the property that makes
this runnable against 10^10-event streams where a batch join of two
unbounded tables cannot even be expressed.

Emission contract: inner join, append mode — a pair emits exactly once,
when both sides have arrived; the emitted SET over a drained input
equals the batch interval join (the SQL mirror), which is what the
driver oracle checks.

Late-data contract: a row older than ``watermark`` below the observed
max event time may be dropped before matching. The fixture drain runs
availableNow without maxFilesPerTrigger (one micro-batch), so the
watermark cannot evict anything before matching completes; production
deployments size ``watermark`` to the source's lateness bound exactly
like the engine's LWW lateness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """left ⋈ right where right.ts ∈ [left.ts, left.ts + window].
    Works on two streams (state bounded by watermark + window) and on
    two batch frames (the oracle form) with the identical expression."""
    l = left.withWatermark(time_col, watermark).alias("l")
    r = right.withWatermark(time_col, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{time_col} >= l.{time_col} "
        f"AND r.{time_col} <= l.{time_col} + INTERVAL {window}"
    )
    return l.join(r, cond, "inner")


def run_click_attribution(
    spark,
    clicks_dir: str,
    purchases_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Tail two event-stream directories → interval join → append
    parquet sink. Returns the StreamingQuery."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    clicks = reader.parquet(clicks_dir)
    purch = reader.parquet(purchases_dir)
    joined = interval_join(
        clicks, purch, window=window, watermark=watermark
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("purchase_ts"),
        F.round(F.col("r.value") * 100, 0).cast("long").alias("purchase_cents"),
    )
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
