"""Debezium-envelope changelog adapter — real-world binlog JSON → the
engine's changelog schema.

The synthetic generator (:mod:`sources.changelog`) plays the role of the
reference's FTP/XML source path; real CDC deployments instead tail a
Kafka topic of `Debezium <https://debezium.io>`_ envelopes — one JSON
record per row change, shaped::

    {"payload": {
        "op": "c" | "r" | "u" | "d",
        "before": {"url": ...} | null,          # populated for u/d
        "after":  {"url", "warc_ts_us", "html_b64", "lang",
                   "schema_ver", "extra"} | null,   # populated for c/r/u
        "source": {"ts_us": <epoch µs>, "seq": <total-order offset>}}}

plus **tombstones** — records whose *value is NULL* — that Debezium
emits after every delete so log-compacted Kafka topics drop the key.
This module maps that surface onto FIXTURES.md §2's
``(seq, op, url, warc_ts, html, lang, schema_ver, extra)`` with pure
column expressions (``from_json`` / ``unbase64`` / ``timestamp_micros``
— all JVM-side, scan-fused, zero Python workers), so the adapter adds
no Exchange of its own: downstream cost is exactly the engine's.

Semantics (mirroring Debezium's contract):

- ``c`` (create) and ``r`` (snapshot read) → ``insert``; ``u`` →
  ``update``; ``d`` → ``delete``. The engine's MERGE classify is
  op-insensitive for upserts (J5), so c-vs-u mislabeling upstream is
  harmless, but ``d`` must map exactly.
- Tombstones (NULL value) are dropped silently — they carry no change.
- The key is ``coalesce(after.url, before.url)`` — deletes only carry
  ``before``.
- The LWW ordering timestamp is ``coalesce(after.warc_ts_us,
  source.ts_us)``: deletes carry no row image, so they order by the
  source (binlog) clock, exactly how Debezium consumers resolve
  delete-vs-late-update races.
- Malformed records (unparseable JSON, unknown ``op``, missing key)
  are **rejected, not guessed**: :func:`parse_debezium` with
  ``with_rejects=True`` returns them on a side output for the engine's
  quarantine path (A3 / `quarantine_routing`) instead of silently
  corrupting state.

Reference parity: this is the same normalization seam as the
reference's XML→JSON "content" spill (Content.scala:16-22) — an
evolving external encoding is canonicalized once, at the boundary, so
everything downstream sees one schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: envelope schema — permissive (all fields nullable) so schema drift
#: in the source becomes a reject row, not an analysis error.
DEBEZIUM_SCHEMA = (
    "payload STRUCT<"
    "op: STRING, "
    "before: STRUCT<url: STRING>, "
    "after: STRUCT<url: STRING, warc_ts_us: BIGINT, html_b64: STRING, "
    "lang: STRING, schema_ver: INT, extra: STRING>, "
    "source: STRUCT<ts_us: BIGINT, seq: BIGINT>"
    ">"
)

_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


#: after-fields the fixed schema consumes; anything else is schema
#: drift from the upstream source
_KNOWN_AFTER = ("url", "warc_ts_us", "html_b64", "lang", "schema_ver", "extra")


def _spilled_extra() -> "F.Column":
    """Unknown ``after`` fields → merged into the ``extra`` JSON.

    This is the reference's evolving-schema rule (Content.scala:16-22 —
    unmodeled upstream fields spill into the ``content`` residue, they
    are never silently dropped) applied to Debezium schema drift: a
    producer that starts shipping a new column keeps flowing, the new
    field rides ``extra`` into the table's ``props`` residue, and a
    later ``add_column`` can promote it without a backfill gap.

    Pure column expressions: ``after`` re-parses as
    ``map<string,string>`` — scalar values as strings, nested
    objects/arrays as their raw JSON text (lossless) — and unknown
    keys merge into the (flat) ``extra`` object, existing ``extra``
    keys winning collisions. The unparseable-map fallback (raw
    ``after`` under ``_after_raw``) is defense in depth; a value that
    reached this point parsed as an object already."""
    after_raw = F.col("_after_raw")
    amap = F.from_json(after_raw, "map<string,string>")
    residue = F.map_filter(
        amap, lambda k, _: ~k.isin(*_KNOWN_AFTER)
    )
    extra = F.col("_p.after.extra")
    emap = F.from_json(extra, "map<string,string>")
    # extra wins key collisions (mapKeyDedupPolicy defaults to EXCEPTION
    # — never feed map_concat overlapping keys)
    residue_no_clash = F.when(
        emap.isNotNull(),
        F.map_filter(
            residue,
            lambda k, _: ~F.array_contains(F.map_keys(emap), k),
        ),
    ).otherwise(residue)
    return (
        F.when(after_raw.isNull(), extra)  # delete: no row image
        .when(amap.isNull(), F.to_json(F.create_map(F.lit("_after_raw"), after_raw)))
        .when(F.size(residue) == 0, extra)
        .when(extra.isNull(), F.to_json(residue))
        .when(
            emap.isNotNull(),
            F.to_json(F.map_concat(residue_no_clash, emap)),
        )
        .otherwise(  # extra present but not a flat object: keep it raw
            F.to_json(
                F.map_concat(
                    residue,
                    F.create_map(F.lit("_extra_raw"), extra),
                )
            )
        )
    )


def parse_debezium(
    envelopes: DataFrame,
    value_col: str = "value",
    with_rejects: bool = False,
    spill_unknown_after: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Debezium JSON envelopes → engine changelog rows.

    ``envelopes`` needs one string column (``value_col``) holding the
    record value (NULL = tombstone). Returns the changelog DataFrame,
    or ``(changelog, rejects)`` when ``with_rejects=True`` — rejects
    keep the raw value plus a ``_reject_reason`` column.

    ``spill_unknown_after=True`` preserves schema drift: ``after``
    fields outside the fixed schema are merged into ``extra`` (see
    :func:`_spilled_extra`) instead of being dropped by ``from_json``.
    """
    val = F.col(value_col)
    p = F.from_json(val, DEBEZIUM_SCHEMA).getField("payload")

    parsed = envelopes.where(val.isNotNull()).select(
        val.alias("_raw"),
        p.alias("_p"),
        F.get_json_object(val, "$.payload.after").alias("_after_raw"),
    )

    op_in = F.col("_p.op")
    op = F.coalesce(
        *[F.when(op_in == k, F.lit(v)) for k, v in _OP_MAP.items()]
    )
    url = F.coalesce(F.col("_p.after.url"), F.col("_p.before.url"))
    ts_us = F.coalesce(
        F.col("_p.after.warc_ts_us"), F.col("_p.source.ts_us")
    )

    reason = (
        F.when(F.col("_p").isNull(), F.lit("unparseable"))
        .when(op.isNull(), F.lit("unknown_op"))
        .when(url.isNull(), F.lit("missing_key"))
        .when(F.col("_p.source.seq").isNull(), F.lit("missing_seq"))
        .when(ts_us.isNull(), F.lit("missing_ts"))
    )

    annotated = parsed.select(
        "_raw",
        reason.alias("_reject_reason"),
        F.col("_p.source.seq").alias("seq"),
        op.alias("op"),
        url.alias("url"),
        F.timestamp_micros(ts_us).alias("warc_ts"),
        F.unbase64(F.col("_p.after.html_b64")).alias("html"),
        F.col("_p.after.lang").alias("lang"),
        F.coalesce(F.col("_p.after.schema_ver"), F.lit(1)).alias(
            "schema_ver"
        ),
        (
            _spilled_extra() if spill_unknown_after
            else F.col("_p.after.extra")
        ).alias("extra"),
    )

    good = annotated.where(F.col("_reject_reason").isNull()).drop(
        "_raw", "_reject_reason"
    )
    if not with_rejects:
        return good
    rejects = annotated.where(F.col("_reject_reason").isNotNull()).select(
        F.col("_raw").alias(value_col), "_reject_reason"
    )
    return good, rejects


def to_debezium(changelog: DataFrame) -> DataFrame:
    """Engine changelog rows → Debezium envelope strings (the CDC-out
    direction; inverse of :func:`parse_debezium` up to tombstones).

    Emits one ``(key, value)`` row per change. Deletes carry
    ``before`` only; a downstream compactor can synthesize tombstones
    from them. Pure column expressions; ``to_json`` drops NULL struct
    fields, matching Debezium's sparse envelopes.
    """
    from clinvar_ingest_spark.functions.timeutil import epoch_micros

    is_del = F.col("op") == "delete"
    ts_us = epoch_micros(changelog, "warc_ts")
    after = F.when(
        ~is_del,
        F.struct(
            F.col("url"),
            ts_us.alias("warc_ts_us"),
            F.base64(F.col("html")).alias("html_b64"),
            F.col("lang"),
            F.col("schema_ver"),
            F.col("extra"),
        ),
    )
    payload = F.struct(
        # full-image ops only: anything else (e.g. the cell engine's
        # 'patch') maps to a NULL op, which parse_debezium rejects as
        # unknown_op — never silently re-labeled as a delete
        F.when(F.col("op") == "insert", F.lit("c"))
        .when(F.col("op") == "update", F.lit("u"))
        .when(F.col("op") == "delete", F.lit("d"))
        .alias("op"),
        F.when(is_del, F.struct(F.col("url"))).alias("before"),
        after.alias("after"),
        F.struct(
            ts_us.alias("ts_us"), F.col("seq").alias("seq")
        ).alias("source"),
    )
    return changelog.select(
        F.col("url").alias("key"),
        F.to_json(F.struct(payload.alias("payload"))).alias("value"),
    )
