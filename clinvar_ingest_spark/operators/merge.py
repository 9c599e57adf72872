"""Key-partitioned MERGE apply (copy-on-write) — the engine's flagship operator.

Semantics (north rule + reference parity):

1. **LWW-reduce the batch**: one surviving event per ``url`` by
   ``(warc_ts, seq)`` — reference ``dedupByDate``
   (ArchiveBranches.scala:140-156) with the deterministic ``seq``
   tie-break (SURVEY.md §7(b)).
2. **Extract text** once per surviving upsert (Arrow-vectorized pandas
   UDF; the reference's heavy decode step, process-xml-release.yaml:70-90).
3. **Classify vs the current snapshot** restricted to *touched buckets*
   (manifest-level partition pruning): insert / update / delete — the
   reference's three-way diff (docker/diff/diff.py:117-182) folded into
   ONE full-outer join instead of three.
4. **Late-event guard**: a batch row only wins if
   ``struct(warc_ts, seq) > struct(cur.warc_ts, cur._seq)`` — replays
   and out-of-order deliveries reconverge instead of regressing state.
5. **Copy-on-write**: rewrite only touched buckets' files — the
   reference's soft-delete+append upsert
   (process-and-reingest-release.yaml:226-280) at file granularity.

Scale shape: the only wide exchanges are (a) the LWW partial-agg
shuffle on ``url`` and (b) the merge join on ``url`` — both on the same
key. The snapshot side is pre-bucketed by the same hash, and the batch
side is typically ≪ snapshot, so AQE broadcasts it; skewed batch keys
collapse to one row per key *before* the join (the groupBy's map-side
partial aggregation is the skew absorber).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.extract import extract_text_udf
from clinvar_ingest_spark.lakelet.table import LakeletTable, bucket_expr, spark_type
from clinvar_ingest_spark.operators.lww import lww_latest


@dataclass
class MergeStats:
    batch_id: str
    snapshot_id: str
    n_events: int
    n_keys: int
    n_inserts: int
    n_updates: int
    n_deletes: int
    touched_buckets: int
    watermark: str | None = None  # max warc_ts seen in the batch (ISO)
    bucket_rows: dict = field(default_factory=dict)  # per-bucket lineage
    write_secs: float = 0.0   # Spark write job (parallel phase)
    commit_secs: float = 0.0  # driver-side promote+manifest (serial phase)
    #: "cow" (classified rewrite; insert/update split is exact) or "mor"
    #: (delta append; insert-vs-update is unknowable without reading the
    #: table, so upserts are reported under n_upserts and the split is 0)
    mode: str = "cow"
    n_upserts: int = 0


class MorCarryoverRequired(RuntimeError):
    """A merge-on-read apply cannot represent this batch: the table's
    current schema has payload columns the batch does not speak (schema
    evolution added them), and COW's carry-over semantics ("update keeps
    the current value of columns the batch lacks") require reading the
    current row. The engine catches this and falls back to a COW apply
    for the batch — correctness over write amplification."""

    def __init__(self, missing: list[str]):
        super().__init__(
            f"batch lacks table payload columns {missing}; carry-over "
            "requires a COW merge"
        )
        self.missing = missing


def reduce_batch(batch: DataFrame, extract_kernel: str = "python") -> DataFrame:
    """LWW-reduce a raw changelog micro-batch to one row per url,
    then extract text (and canonicalize the `extra` residue into
    `props`) for surviving upserts only. Batches without an ``html``
    column (entity tables with arbitrary payload schemas, e.g. array /
    struct columns) skip the extraction step — everything else is
    schema-driven.
    """
    batch = batch.withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    latest = lww_latest(batch, keys=("url",), order_by=("warc_ts", "seq"))
    out = latest
    if "html" in out.columns:
        if extract_kernel == "jvm":
            from clinvar_ingest_spark.functions.extract import extract_text_expr

            text = extract_text_expr(F.col("html"))
        else:
            text = extract_text_udf(F.col("html"))
        out = out.withColumn("text", F.when(F.col("op") != "delete", text))
    if "props" not in out.columns and "extra" in out.columns:
        from clinvar_ingest_spark.functions.canonical_json import canonical_json_udf

        out = out.withColumn(
            "props",
            F.when(F.col("op") != "delete", canonical_json_udf(F.col("extra"))),
        )
    return out


def _batch_payload_expr(manifest, name: str, src_col: str, batch_dtype):
    """Column expression presenting a batch payload column as the
    table's CURRENT column ``name``.

    Handles schema drift between producer and table: if the batch's
    dtype doesn't match the current column type, search the manifest's
    schema HISTORY for the version whose shape the batch speaks (by
    col_id), then remap nested fields col-id-wise — so a changelog
    carrying ``xrefs: array<struct<db,xid>>`` lands correctly in a
    table that renamed the field to ``ref_id`` and added ``note``
    (positional casts would fail on the arity change). Falls back to a
    plain cast for scalar widens.
    """
    from clinvar_ingest_spark.lakelet.table import _remap_expr

    tgt_spec = next(cs for cs in manifest.columns if cs.name == name)
    tgt_t = spark_type(tgt_spec)
    if batch_dtype.simpleString() == tgt_t.simpleString():
        return F.col(src_col)
    for ver in sorted(manifest.schemas, reverse=True):
        old = next(
            (c for c in manifest.schemas[ver] if c.col_id == tgt_spec.col_id),
            None,
        )
        if old is not None and spark_type(old).simpleString() == batch_dtype.simpleString():
            return _remap_expr(F.col(src_col), old, tgt_spec)
    return F.col(src_col).cast(tgt_t)


def merge_apply(
    spark: SparkSession,
    table: LakeletTable,
    batch: DataFrame,
    batch_id: str,
    extract_kernel: str = "python",
    partial_to: int | None = None,
) -> MergeStats:
    """Apply one micro-batch to the table; returns lineage stats.

    ``batch`` columns: seq, op, url, warc_ts, html, lang[, schema_ver].

    Job shape (exactly TWO Spark jobs per micro-batch):

    1. a tiny column-pruned distinct over the batch's bucket ids (plans
       which snapshot files to read — manifest-level partition pruning);
    2. the merge write itself, with every lineage metric (event count,
       watermark, per-action counts) riding along as ``observe()``
       CollectMetrics — no separate count/agg jobs, no persist of
       intermediate state, and the extraction UDF runs exactly once.
    """
    m = table.manifest()

    # job 1: touched buckets from batch keys only (no UDF, url col only)
    touched = [
        r["_b"]
        for r in batch.select(bucket_expr("url", m.n_buckets).alias("_b"))
        .distinct()
        .collect()
    ]
    # partition-spec evolution: expand to whole legacy-spec files so the
    # COW replacement carries their untouched rows (identity pre-grow)
    touched = table.rewrite_closure(touched)

    batch_obs = Observation()
    observed = batch.observe(
        batch_obs,
        F.count(F.lit(1)).alias("n_events"),
        F.max("warc_ts").alias("watermark"),
    )

    reduced = reduce_batch(observed, extract_kernel)
    current = table.read(spark, buckets=touched)

    # payload columns of the table schema; those also present in the
    # batch come from the batch on insert/update, the rest carry over
    # from the current row (post-evolution columns backfill as NULL
    # on insert).
    from clinvar_ingest_spark.operators.merge_cogroup import batch_alias_map

    table_cols = [cs.name for cs in m.columns]
    batch_payload = set(reduced.columns)
    # renamed-table-column → batch-column map (changelogs produced
    # against an older schema version keep the old upstream name)
    alias = batch_alias_map(m, list(reduced.columns))

    b = reduced.select(*[F.col(cn).alias(f"_b_{cn}") for cn in reduced.columns])
    c = current.select(
        *[F.col(cname).alias(f"_c_{cname}") for cname in current.columns]
    )
    j = b.join(c, b["_b_url"] == c["_c_url"], "full_outer")

    batch_wins = F.col("_c_url").isNull() | (
        F.struct(F.col("_b_warc_ts"), F.col("_b_seq"))
        > F.struct(F.col("_c_warc_ts"), F.col("_c__seq"))
    )
    is_batch = F.col("_b_url").isNotNull()
    is_delete = F.col("_b_op") == "delete"
    cur_live = F.col("_c_url").isNotNull() & ~F.coalesce(
        F.col("_c__deleted"), F.lit(False)
    )

    # delete winners become TOMBSTONE rows (soft delete): retained with
    # (warc_ts, _seq, _deleted=True) so late events can never resurrect
    # a deleted key — mirrors merge_cogroup's classification exactly
    action = (
        F.when(~is_batch, F.lit("keep"))  # untouched key in touched bucket
        .when(~batch_wins, F.lit("keep_late"))  # late event loses
        .when(is_delete & cur_live, F.lit("delete"))
        .when(is_delete, F.lit("noop_delete"))  # delete of absent/dead key
        .when(~cur_live, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    j = j.withColumn("_action", action)

    merge_obs = Observation()

    def n_act(a: str):
        return F.sum(F.when(F.col("_action") == a, 1).otherwise(0)).alias(a)

    j = j.observe(
        merge_obs,
        n_act("insert"),
        n_act("update"),
        n_act("delete"),
        n_act("noop_delete"),
        n_act("keep_late"),
    )

    # every classified row is written — tombstones included
    take_batch = F.col("_action").isin("insert", "update")
    tomb = F.col("_action").isin("delete", "noop_delete")
    wins = take_batch | tomb

    def out_col(name: str):
        cur = F.col(f"_c_{name}")
        if name in ("url", "warc_ts", "_seq"):
            src = {"url": "_b_url", "warc_ts": "_b_warc_ts", "_seq": "_b_seq"}[name]
            return F.when(wins, F.col(src)).otherwise(cur).alias(name)
        if name == "_deleted":
            return (
                F.when(wins, tomb)
                .otherwise(F.coalesce(cur, F.lit(False)))
                .alias(name)
            )
        src = alias.get(name, name)
        if src in batch_payload:
            bval = _batch_payload_expr(m, name, f"_b_{src}", reduced.schema[src].dataType)
            return (
                F.when(take_batch, bval)
                .when(tomb, F.lit(None))
                .otherwise(cur)
                .alias(name)
            )
        # evolved column unknown to this batch: NULL on tombstone
        return F.when(tomb, F.lit(None)).otherwise(cur).alias(name)

    new_rows = j.select(*[out_col(cn) for cn in table_cols]).withColumn(
        "_bucket", bucket_expr("url", m.n_buckets)
    )

    # job 2: the copy-on-write rewrite — observations fire with it.
    # expected_parent_id pins the commit to the snapshot this merge was
    # planned against: a concurrent writer landing in between raises
    # CommitConflictError instead of losing its updates silently.
    commit_stats: dict = {}
    sid = table.commit_rewrite(
        spark,
        new_rows,
        touched_buckets=touched,
        batch_id=batch_id,
        stats_out=commit_stats,
        expected_parent_id=m.snapshot_id,
        # stamp the apply's delivered frontier ATOMICALLY with the
        # commit: a crash between this commit and the ledger append is
        # repaired by reading it back (engine._apply_batch_once) — the
        # ledger caller's own partial_to at repair time may be a LATER
        # delivery and must not be trusted (skip-and-lose)
        summary={"apply_partial_to": partial_to},
    )

    if commit_stats.get("skipped"):
        # crash-recovery path: manifest existed, no action ran — the
        # observations never fired, so report a zero-stats no-op.
        return MergeStats(
            batch_id=batch_id, snapshot_id=sid, n_events=0, n_keys=0,
            n_inserts=0, n_updates=0, n_deletes=0,
            touched_buckets=len(touched),
        )
    bm = batch_obs.get
    mm = merge_obs.get
    counts = {k: int(mm.get(k) or 0) for k in
              ("insert", "update", "delete", "noop_delete", "keep_late")}
    wm = bm.get("watermark")
    return MergeStats(
        batch_id=batch_id,
        snapshot_id=sid,
        n_events=int(bm.get("n_events") or 0),
        n_keys=sum(counts.values()),
        n_inserts=counts["insert"],
        n_updates=counts["update"],
        n_deletes=counts["delete"],
        touched_buckets=len(touched),
        watermark=wm.isoformat() if wm is not None else None,
        bucket_rows=commit_stats.get("bucket_rows", {}),
        write_secs=commit_stats.get("write_secs", 0.0),
        commit_secs=commit_stats.get("commit_secs", 0.0),
    )


def merge_apply_mor(
    spark: SparkSession,
    table: LakeletTable,
    batch: DataFrame,
    batch_id: str,
    extract_kernel: str = "python",
    assume_all_buckets: bool = False,
    partial_to: int | None = None,
) -> MergeStats:
    """Merge-on-read apply: LWW-reduce + extract the batch, then APPEND
    the surviving row versions (tombstones included) as delta files —
    the current table state is never read and no bucket is rewritten.

    Write cost is ∝ batch size: at 10^10 events over a 100 TB table a
    micro-batch touching every bucket still writes only its own rows,
    where COW would rewrite the full content of each touched bucket
    (the classic write-amplification cliff for small hot batches).
    Readers LWW-resolve base+delta stacks (LakeletTable.read); the
    late-event guard, delete-wins and no-resurrection rules all fall
    out of the SAME (warc_ts, _seq) order the COW classifier uses, so
    resolved state is bit-identical to a COW apply of the same stream
    (A/B'd by state hash in tests/test_mor.py).

    Raises :class:`MorCarryoverRequired` when the table schema has
    payload columns the batch doesn't carry (post-evolution drift) —
    those need COW carry-over; ``CdcEngine.apply_batch`` falls back.

    Job shape: the same TWO jobs as the COW path (touched-buckets
    distinct + the delta write with observe() metrics riding along),
    minus the snapshot read and the merge join inside job 2.
    """
    from clinvar_ingest_spark.operators.merge_cogroup import batch_alias_map

    m = table.manifest()

    if assume_all_buckets:
        # events ≫ buckets: the distinct would return every bucket —
        # skip the job (MOR only uses the list for repartition sizing
        # and lineage; no snapshot files are read either way)
        touched = list(range(m.n_buckets))
    else:
        touched = [
            r["_b"]
            for r in batch.select(bucket_expr("url", m.n_buckets).alias("_b"))
            .distinct()
            .collect()
        ]
    # Delta write width stays = touched buckets (commit_delta default),
    # NOT delta-row-proportional: the write stage carries the batch's
    # Arrow extract work (ExtractPythonUDFs places the Python eval above
    # the bucket exchange), so narrowing the width serializes compute,
    # not just parquet encode — measured 1.7x slower per hot batch at
    # width=1 vs width=64 in an interleaved same-session A/B (PLANS.md
    # "MOR hot-batch apply"). Schedulers handle near-empty tasks in ~ms;
    # serialized extract costs real seconds.

    batch_obs = Observation()
    observed = batch.observe(
        batch_obs,
        F.count(F.lit(1)).alias("n_events"),
        F.max("warc_ts").alias("watermark"),
    )
    reduced = reduce_batch(observed, extract_kernel)

    table_cols = [cs.name for cs in m.columns]
    batch_payload = set(reduced.columns)
    alias = batch_alias_map(m, list(reduced.columns))
    lineage = {"url", "warc_ts", "_seq", "_deleted"}
    missing = [
        c for c in table_cols
        if c not in lineage and alias.get(c, c) not in batch_payload
    ]
    if missing:
        raise MorCarryoverRequired(missing)

    is_delete = F.col("op") == "delete"

    def out_col(name: str):
        if name == "url":
            return F.col("url")
        if name == "warc_ts":
            return F.col("warc_ts")
        if name == "_seq":
            return F.col("seq").cast("long").alias("_seq")
        if name == "_deleted":
            return is_delete.alias("_deleted")
        src = alias.get(name, name)
        bval = _batch_payload_expr(m, name, src, reduced.schema[src].dataType)
        return F.when(~is_delete, bval).alias(name)

    merge_obs = Observation()
    new_rows = (
        reduced.observe(
            merge_obs,
            F.sum(F.when(is_delete, 1).otherwise(0)).alias("deletes"),
            F.sum(F.when(~is_delete, 1).otherwise(0)).alias("upserts"),
        )
        .select(*[out_col(cn) for cn in table_cols])
        .withColumn("_bucket", bucket_expr("url", m.n_buckets))
    )

    commit_stats: dict = {}
    sid = table.commit_delta(
        spark,
        new_rows,
        touched_buckets=touched,
        batch_id=batch_id,
        stats_out=commit_stats,
        expected_parent_id=m.snapshot_id,
        summary={"apply_partial_to": partial_to},  # see merge_apply
    )

    if commit_stats.get("skipped"):
        return MergeStats(
            batch_id=batch_id, snapshot_id=sid, n_events=0, n_keys=0,
            n_inserts=0, n_updates=0, n_deletes=0,
            touched_buckets=len(touched), mode="mor",
        )
    bm = batch_obs.get
    mm = merge_obs.get
    n_up = int(mm.get("upserts") or 0)
    n_del = int(mm.get("deletes") or 0)
    wm = bm.get("watermark")
    return MergeStats(
        batch_id=batch_id,
        snapshot_id=sid,
        n_events=int(bm.get("n_events") or 0),
        n_keys=n_up + n_del,
        n_inserts=0,
        n_updates=0,
        n_deletes=n_del,
        touched_buckets=len(touched),
        watermark=wm.isoformat() if wm is not None else None,
        bucket_rows=commit_stats.get("bucket_rows", {}),
        write_secs=commit_stats.get("write_secs", 0.0),
        commit_secs=commit_stats.get("commit_secs", 0.0),
        mode="mor",
        n_upserts=n_up,
    )
