"""NDJSON interchange — the reference's wire format, round-trippable.

The reference moves data as newline-delimited JSON end-to-end (JSON-list
shards in, ClinVarPipelineBuilder.scala:17-22; BigQuery NDJSON export
out, docker/diff/diff.py:185-207). Our engine exports diff slices as
NDJSON with base64 html (`CdcEngine.export_diff_ndjson`); this module
reads them back with the declared schema — so a diff consumer can be
another instance of this engine (changelog-over-NDJSON), not just Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of an exported pages diff slice (html base64-encoded, plus the
#: change tag when reading the combined dir)
PAGES_NDJSON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.StringType()),  # base64
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("props", T.StringType()),  # canonical JSON residue
    ]
)


def read_pages_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """Read an exported diff slice back into input-hint shape
    (url, warc_ts, html:binary, text, lang)."""
    df = (
        spark.read.schema(PAGES_NDJSON_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )
    return df.withColumn("html", F.unbase64("html"))


def diff_slices_to_changelog(
    spark: SparkSession,
    export_dir: str,
    start_seq: int,
) -> DataFrame:
    """Turn an `export_diff_ndjson` directory into a replayable
    changelog: created/updated → upsert events, deleted → delete events.
    Sequence numbers are assigned deterministically (order by url within
    each slice) from ``start_seq`` — applying the result to a copy of
    the OLD snapshot reproduces the NEW one (the reference's
    diff-consumer contract, notify-clingen-kafka.py:17-48).

    **Precondition**: ``start_seq`` MUST exceed the consumer table's max
    applied ``_seq`` (e.g. ``ledger.last_applied_seq() + 1`` or the
    producer's seq high-water mark). An 'updated' row whose ``warc_ts``
    ties the old row's (the producer's LWW was decided by *seq*) would
    otherwise lose the (warc_ts, seq) tie-break against the old row's
    larger ``_seq`` and be silently dropped as a late event."""
    import os

    from pyspark.sql import Window

    if start_seq <= 0:
        raise ValueError(
            "start_seq must be > the consumer's max applied _seq "
            "(use consumer_ledger.last_applied_seq() + 1); got "
            f"{start_seq} — timestamp-tied updates would be dropped"
        )

    parts = []
    for kind, op in (("created", "insert"), ("updated", "update"), ("deleted", "delete")):
        p = os.path.join(export_dir, f"change={kind}")
        if not os.path.isdir(p):  # zero-row slice → no partition dir
            df = spark.createDataFrame([], schema=PAGES_NDJSON_SCHEMA).withColumn(
                "html", F.unbase64("html")
            )
        else:
            df = read_pages_ndjson(spark, p)
        parts.append(df.withColumn("op", F.lit(op)))
    all_rows = parts[0]
    for q in parts[1:]:
        all_rows = all_rows.unionByName(q)
    w = Window.orderBy("url", "op")
    return (
        all_rows.withColumn("seq", F.row_number().over(w) + F.lit(start_seq - 1))
        .withColumn("schema_ver", F.lit(1))
        .select(
            "seq", "op", "url", "warc_ts", "html", "lang", "schema_ver",
            "text", "props",
        )
    )
