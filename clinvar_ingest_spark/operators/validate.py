"""Batch validation + dead-letter (quarantine) routing.

A CDC tailer meets malformed events — null keys, missing timestamps,
op codes from a newer producer. The reference's posture is
fail-the-run: an XML record that doesn't parse aborts the whole
ingest workflow and a human re-triggers it
(/root/reference/.github/workflows/ingest-xml-archive.yaml:206-294 —
the "file ingested but row missing" repair path exists precisely
because a failed run leaves partial state). At 10^10-event scale a
poison event must not stop the stream, so the engine re-expresses
that contract Spark-side: each micro-batch is split by ordered
validation rules, violating events are APPENDED to a quarantine
store (one overwrite-idempotent parquet dir per batch — replaying or
retrying a batch can never duplicate its dead letters), and the merge
applies only the surviving rows. Routing is part of the exactly-once
envelope: quarantine is written BEFORE the table commit, so a crash
at any point reconverges (re-run overwrites the same deterministic
content), and a ledger-skipped batch skips its (already written)
quarantine too.

Scale notes: the tag is a single JVM `CASE` expression (whole-stage
codegen, no Python), the split is two filters off one plan, and the
quarantine write shuffles nothing — events stay in their scan
partitioning. Cost is one extra write job per batch, only when
validation is enabled.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tag column carried between tag_invalid() and the split; dropped
#: before the merge, persisted (as `reason`) in the quarantine store
TAG_COL = "_quarantine_reason"


@dataclass(frozen=True)
class ValidationRule:
    """One ordered rule: ``condition`` is a SQL boolean expression over
    the changelog columns; True means the event is INVALID and is
    quarantined under ``reason``. Rules are evaluated in order — the
    first matching rule names the reason (CASE precedence), so an
    event violating several rules is counted exactly once."""

    reason: str
    condition: str


def default_rules(
    key_col: str = "url",
    ops: Sequence[str] = ("insert", "update", "delete"),
) -> list[ValidationRule]:
    """The contract every changelog event must meet before a merge:
    a non-null key (the MERGE identity), a non-null event time (the
    LWW order), and a known op code (unknown ops are a producer from
    the future — quarantine beats misinterpreting them as upserts).
    ``ops`` widens the accepted set — a patch-aware engine passes
    ``(..., 'patch')``; a row-LWW engine must NOT, since it would
    misread a partial image as a full one."""
    lst = ", ".join(f"'{o}'" for o in ops)
    return [
        ValidationRule("null_key", f"{key_col} IS NULL"),
        ValidationRule("null_ts", "warc_ts IS NULL"),
        ValidationRule("bad_op", f"op IS NULL OR op NOT IN ({lst})"),
    ]


def tag_invalid(batch: DataFrame, rules: Sequence[ValidationRule]) -> DataFrame:
    """Add ``TAG_COL``: the first matching rule's reason, NULL if the
    event passes every rule. Pure column expression — codegen'd."""
    tag = F.lit(None).cast("string")
    for r in reversed(rules):
        tag = F.when(F.expr(r.condition), F.lit(r.reason)).otherwise(tag)
    return batch.withColumn(TAG_COL, tag)


class Quarantine:
    """Dead-letter store beside a lakelet table: one parquet dir per
    batch (``batch-<batch_id>/``), each row the ORIGINAL event plus
    ``reason`` and ``batch_id``. Overwrite-per-batch makes routing
    idempotent under replay, commit-conflict retries, and crash-rerun;
    plain columns (not hive partitions) keep the root readable as one
    dataset with no hidden-dir surprises."""

    def __init__(self, root: str):
        self.root = root

    def _batch_dir(self, batch_id: str) -> str:
        return os.path.join(self.root, f"batch-{batch_id}")

    def write_batch(self, invalid: DataFrame, batch_id: str) -> int:
        """Persist one batch's dead letters (overwrite = idempotent).
        Returns the number of quarantined events — read back from the
        parquet footers, not a second pass over the data."""
        out = self._batch_dir(batch_id)
        (
            invalid.withColumnRenamed(TAG_COL, "reason")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(out)
        )
        spark = invalid.sparkSession
        return spark.read.parquet(out).count()  # footer row-count only

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Every quarantined event across all batches, or None if
        nothing was ever quarantined."""
        if not os.path.isdir(self.root):
            return None
        dirs = sorted(
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith("batch-")
        )
        if not dirs:
            return None
        return spark.read.parquet(*dirs)
