"""Stream-static enrichment: a changelog tail joined per-micro-batch
against a PINNED table snapshot (broadcast).

The canonical CDC sidecar: classify in-flight events against the state
they are about to mutate — "does this key already exist?" (insert-vs-
upsert routing, fraud/alerting lookups, dimension decoration). The
static side is a lakelet snapshot read: pinning a snapshot id makes the
enrichment REPRODUCIBLE (same feed + same snapshot ⇒ same output, no
read-your-own-writes race with the apply loop mutating the table
underneath).

Spark specifics: a stream-static join is stateless — no watermark, no
state store; Spark re-executes the static side per micro-batch, and
``F.broadcast`` pins the strategy to BroadcastHashJoin so each trigger
ships the dim once per executor instead of shuffling the stream. At
10^10 events the stream side never shuffles at all; the static side must
fit in executor memory (key + flag projection, not whole rows — project
BEFORE broadcasting). For a dim too big to broadcast, drop the hint and
let AQE pick a shuffle join per micro-batch.

Reference parallel: the reference's diff step joins each release against
the PREVIOUS release snapshot (docker/diff/diff.py) — this is the same
semantics run continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_state(
    stream: DataFrame,
    state_df: DataFrame,
    key: str = "url",
    flag_col: str = "was_known",
) -> DataFrame:
    """Left-join the stream against the key set of ``state_df``
    (projected to key+flag BEFORE the broadcast — the dim that ships is
    one column wide regardless of table width)."""
    dim = state_df.select(F.col(key)).distinct().withColumn(flag_col, F.lit(True))
    return stream.join(F.broadcast(dim), key, "left").withColumn(
        flag_col, F.coalesce(F.col(flag_col), F.lit(False))
    )


def run_enrich_feed(
    spark,
    changelog_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    state_df: DataFrame,
    key: str = "url",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Tail changelog segments → stream-static enrichment → append
    parquet sink. Returns the StreamingQuery."""
    from clinvar_ingest_spark.streaming.tail import CHANGELOG_SCHEMA

    reader = spark.readStream.schema(CHANGELOG_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(changelog_dir)
    enriched = enrich_with_state(stream, state_df, key=key).select(
        "seq", "op", key, "warc_ts", "was_known"
    )
    writer = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
