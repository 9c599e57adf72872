"""Single-pass multi-entity fan-out — SURVEY.md §2.8, the reference's
signature dataflow operator.

The reference parses each VariationArchive once and emits to 14 side
outputs + 1 main output (ArchiveBranches.scala:52-113); Beam guarantees
the input is read once. Spark has no side outputs, so the same shape
is: parse once into a tagged long-thin DataFrame (one row per emitted
entity) → ``persist()`` → N filtered projections/writes. The persist
replaces Beam's single-pass guarantee.

Entities emitted per page event (the web analogue of the reference's
15-way entity split — exactly 15 streams, ArchiveBranches.scala:16-32):

- ``page``      — the page itself (k=lang, n=len(text))
- ``host``      — one row per page for per-host rollups (k=host)
- ``link``      — one row per outgoing href (k=href)
- ``title``     — <title> contents (k=title)
- ``heading``   — one row per <h1>-<h6> (k=heading text)
- ``anchor``    — one row per <a> inner text (k=text)
- ``meta_lang`` — declared <html lang=…> (k=lang attr)
- ``script``    — one row per page that carries <script> tags (n=count)
- ``image``     — one row per <img src=…> (k=src)
- ``style``     — one row per page that carries <style> tags (n=count)
- ``paragraph`` — one row per <p>…</p> (k=contents)
- ``division``  — one row per <div>…</div> (k=contents)
- ``comment``   — one row per <!-- … --> (k=contents)
- ``query_param``   — one row per href carrying a ?query (k=query)
- ``external_link`` — one row per absolute http(s) href (k=href)

Post-parse operators mirror the reference's stream treatments:

- :func:`fanout` with ``dedup=True`` — source-level LWW dedup: entities
  derive from each url's latest non-deleted event only.
- :func:`fanout_archive` — the reference's EXACT per-stream mix
  (ArchiveBranches.scala:115-137): every non-delete event is parsed,
  then 4 streams are ``dedupByDate``-reduced per entity id
  (:data:`DEDUP_ID_COL`), 1 stream (``host``) is aggregated like
  ``aggregateSubmitters`` (latest scalars + sorted set-union across
  all versions, ArchiveBranches.scala:158-172), and the other 10 pass
  through untouched.
- :func:`resolve_link_targets` — cross-entity id fixup: link hrefs are
  normalized and resolved against the page stream to attach the target
  page's id (reference's SCV-accession rewrite, VCV.scala:167-174).

Parsing is one Arrow-batched pandas pass (mapInPandas) — the html is
decoded exactly once per event, like the reference's single parse.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from clinvar_ingest_spark.functions.extract import extract_text_series

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("entity_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),   # source event seq (order tiebreak)
        T.StructField("k", T.StringType()),   # entity-specific key
        T.StructField("v", T.StringType()),   # entity-specific value
        T.StructField("n", T.LongType()),     # entity-specific measure
    ]
)

ENTITY_TYPES = (
    "page", "host", "link", "title", "heading", "anchor",
    "meta_lang", "script", "image", "style", "paragraph", "division",
    "comment", "query_param", "external_link",
)

#: streams the reference would LWW-dedup (ArchiveBranches.scala:115-119)
DEDUP_ENTITY_TYPES = ("page", "host", "link", "title", "meta_lang")

#: the reference's per-stream mix: 4 dedupByDate'd streams keyed by the
#: entity's OWN id (gene/trait_set/trait/submission ↔ these), 1
#: aggregated stream (submitters ↔ host), 10 passthrough
#: (ArchiveBranches.scala:115-137)
DEDUP_ID_COL = {"page": "url", "title": "url", "meta_lang": "url", "link": "k"}
AGGREGATE_TYPES = ("host",)

# Patterns are pinned (like the extractor): every one has an exact RE2
# mirror used by the DuckDB oracle, so keep them RE2-compatible.
_RE_HREF = re.compile(r'(?i)href\s*=\s*["\']([^"\'>\s]+)["\']')
_RE_HOST = re.compile(r"^[a-z]+://([^/]+)")
_RE_TITLE = re.compile(r"(?is)<title[^>]*>(.*?)</title\s*>")
_RE_HEADING = re.compile(r"(?is)<h[1-6][^>]*>(.*?)</h[1-6]\s*>")
_RE_ANCHOR = re.compile(r"(?is)<a\b[^>]*>(.*?)</a\s*>")
_RE_META_LANG = re.compile(r'(?i)<html[^>]+lang\s*=\s*"([^"]*)"')
_RE_SCRIPT = re.compile(r"(?i)<script\b")
_RE_IMG_SRC = re.compile(r'(?i)<img\b[^>]*src\s*=\s*["\']([^"\'>\s]+)["\']')
_RE_STYLE = re.compile(r"(?i)<style\b")
_RE_PARAGRAPH = re.compile(r"(?is)<p[^>]*>(.*?)</p\s*>")
_RE_DIVISION = re.compile(r"(?is)<div[^>]*>(.*?)</div\s*>")
_RE_COMMENT = re.compile(r"(?s)<!--(.*?)-->")
_RE_QUERY_PARAM = re.compile(r'(?i)href\s*=\s*["\'][^"\'>\s?]*\?([^"\'>\s]+)["\']')
_RE_EXTERNAL_LINK = re.compile(r'(?i)href\s*=\s*["\'](https?://[^"\'>\s]+)["\']')

#: href → canonical target url (strip query + fragment)
_RE_HREF_NORM = r"[?#].*$"


def parse_entities(changelog: DataFrame) -> DataFrame:
    """One parse pass over page events → tagged entity rows.

    Input: changelog columns (url, warc_ts, html, lang, ...); delete
    events (html NULL) emit nothing.
    """

    def _per_match(pdf: pd.DataFrame, html: pd.Series, pat, entity: str):
        """One output row per regex capture-group match."""
        found = html.str.findall(pat)
        counts = found.map(len)
        if counts.sum() == 0:
            return None
        return pd.DataFrame(
            {
                "entity_type": entity,
                "url": pdf["url"].repeat(counts).to_numpy(),
                "warc_ts": pdf["warc_ts"].repeat(counts).to_numpy(),
                "seq": pdf["seq"].repeat(counts).to_numpy(),
                "k": [m for ms in found for m in ms],
                "v": None,
                "n": 1,
            }
        )

    def _per_page_count(pdf: pd.DataFrame, html: pd.Series, pat, entity: str):
        """One output row per page that matches at all (n=match count)."""
        cnt = html.str.count(pat)
        withs = cnt > 0
        if not withs.any():
            return None
        return pd.DataFrame(
            {
                "entity_type": entity,
                "url": pdf.loc[withs, "url"],
                "warc_ts": pdf.loc[withs, "warc_ts"],
                "seq": pdf.loc[withs, "seq"],
                "k": None,
                "v": None,
                "n": cnt[withs].astype("int64"),
            }
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["html"].notna()]
            if not len(pdf):
                continue
            html = pdf["html"].map(
                lambda b: b.decode("utf-8", "replace") if b is not None else ""
            ).astype("string")
            text = extract_text_series(pdf["html"])
            yield pd.DataFrame(
                {
                    "entity_type": "page",
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "seq": pdf["seq"],
                    "k": pdf["lang"],
                    "v": None,
                    "n": text.str.len().astype("int64"),
                }
            )
            hosts = pdf["url"].str.extract(_RE_HOST, expand=False)
            yield pd.DataFrame(
                {
                    "entity_type": "host",
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "seq": pdf["seq"],
                    "k": hosts,
                    "v": None,
                    "n": 1,
                }
            )
            for pat, entity in (
                (_RE_HREF, "link"),
                (_RE_TITLE, "title"),
                (_RE_HEADING, "heading"),
                (_RE_ANCHOR, "anchor"),
                (_RE_META_LANG, "meta_lang"),
                (_RE_IMG_SRC, "image"),
                (_RE_PARAGRAPH, "paragraph"),
                (_RE_DIVISION, "division"),
                (_RE_COMMENT, "comment"),
                (_RE_QUERY_PARAM, "query_param"),
                (_RE_EXTERNAL_LINK, "external_link"),
            ):
                out = _per_match(pdf, html, pat, entity)
                if out is not None:
                    yield out
            for pat, entity in ((_RE_SCRIPT, "script"), (_RE_STYLE, "style")):
                out = _per_page_count(pdf, html, pat, entity)
                if out is not None:
                    yield out

    return changelog.mapInPandas(run, schema=ENTITY_SCHEMA)


def lww_winning_events(changelog: DataFrame) -> DataFrame:
    """Latest non-deleted event per url by (warc_ts, seq) — the stream
    the reference's dedup'd entity branches see (dedupByDate,
    ArchiveBranches.scala:140-156)."""
    from clinvar_ingest_spark.operators.lww import lww_latest

    latest = lww_latest(changelog, keys=("url",), order_by=("warc_ts", "seq"))
    return latest.filter(F.col("op") != "delete")


def fanout(
    changelog: DataFrame,
    entity_types: tuple[str, ...] = ENTITY_TYPES,
    dedup: bool = False,
) -> dict[str, DataFrame]:
    """Parse once, return one filtered projection per entity type.

    ``dedup=True`` first LWW-reduces the changelog so every stream
    derives from each url's winning event only. The tagged frame is
    persisted so the N downstream actions share one parse (Beam
    side-output parity); call ``unpersist`` via the returned
    ``_tagged`` frame (or let the context expire) when done.
    """
    src = lww_winning_events(changelog) if dedup else changelog
    tagged = parse_entities(src).persist()
    out: dict[str, DataFrame] = {"_tagged": tagged}
    for et in entity_types:
        out[et] = tagged.filter(F.col("entity_type") == et).drop("entity_type")
    return out


def dedup_by_date(tagged_stream: DataFrame, id_col: str) -> DataFrame:
    """Reference ``dedupByDate`` (ArchiveBranches.scala:140-156): one
    row per entity id — the latest by (warc_ts, seq, k). NULL warc_ts
    sorts lowest (the reference keeps an arbitrary element when no
    version is dated; seq makes our pick deterministic). ``k`` is the
    final tiebreak because one EVENT can emit several rows for the
    same entity id (e.g. two <title> tags in one document share
    (url, warc_ts, seq)) — without it the pick is nondeterministic.

    Delegates to :func:`~clinvar_ingest_spark.operators.lww.lww_latest`
    (max_by on an order struct): ONE hash aggregation with a partial
    (map-side) max_by, so the shuffle carries one candidate row per
    (input partition, entity id) — same LWW code path as the engine.
    """
    from clinvar_ingest_spark.operators.lww import lww_latest

    order = ["warc_ts", "seq"] + ([] if id_col == "k" else ["k"])
    out = lww_latest(tagged_stream, keys=(id_col,), order_by=order)
    return out.select(*tagged_stream.columns)  # original column order


def aggregate_hosts(tagged_stream: DataFrame) -> DataFrame:
    """Reference ``aggregateSubmitters`` (ArchiveBranches.scala:158-172)
    applied to the host stream: per host id, the LATEST version wins
    every scalar field, while ``v`` becomes the sorted set-union of all
    urls ever seen for the host (the reference unions allNames /
    allAbbrevs across versions and sorts). ``n`` counts versions.

    Plan: one hash aggregation on the host key — ``max_by`` and
    ``collect_set`` both have partial (map-side) implementations, so
    the shuffle carries one partially-reduced row per (partition, host).
    """
    latest = F.max_by(
        F.struct("url", "warc_ts", "seq"), F.struct("warc_ts", "seq")
    ).alias("_latest")
    return (
        tagged_stream.groupBy("k")
        .agg(
            latest,
            F.array_join(F.array_sort(F.collect_set("url")), ",").alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("_latest.url").alias("url"),
            F.col("_latest.warc_ts").alias("warc_ts"),
            F.col("_latest.seq").alias("seq"),
            "k",
            "v",
            "n",
        )
    )


def fanout_archive(
    changelog: DataFrame,
    entity_types: tuple[str, ...] = ENTITY_TYPES,
) -> dict[str, DataFrame]:
    """The reference's exact 15-stream split with per-stream treatments
    (ArchiveBranches.scala:115-137): parse EVERY non-delete event once,
    then

    - 4 streams dedup to the latest version per entity id
      (:data:`DEDUP_ID_COL` — reference dedupByDate on gene /
      trait_set / trait / submission),
    - 1 stream (``host``) aggregates latest-scalars + sorted set-union
      (reference aggregateSubmitters),
    - the remaining 10 pass through untouched (one row per emission,
      like the reference's scv* / rcv / vcv / geneAssociation /
      traitMapping side outputs).

    Returns ``{"_tagged": <persisted parse>, <entity>: <treated DF>}``;
    unpersist ``_tagged`` when the downstream actions are done.
    """
    src = changelog.filter(F.col("op") != "delete")
    tagged = parse_entities(src).persist()
    out: dict[str, DataFrame] = {"_tagged": tagged}
    for et in entity_types:
        stream = tagged.filter(F.col("entity_type") == et).drop("entity_type")
        if et in DEDUP_ID_COL:
            out[et] = dedup_by_date(stream, DEDUP_ID_COL[et])
        elif et in AGGREGATE_TYPES:
            out[et] = aggregate_hosts(stream)
        else:
            out[et] = stream
    return out


def resolve_link_targets(tagged: DataFrame) -> DataFrame:
    """Cross-entity id fixup (reference VCV.scala:167-174: internal id →
    accession rewrite by scanning the sibling stream): normalize each
    link's href (strip query/fragment) and resolve it against the page
    stream, attaching the target page id when the link is internal.

    Plan: the page-url dim is distinct urls only — broadcast when small;
    at 100 TB both sides hash-join on the url key (AQE decides).
    """
    pages = (
        tagged.filter(F.col("entity_type") == "page")
        .select(F.col("url").alias("_target_url"))
        .distinct()
        .withColumn("target_page_id", F.md5(F.col("_target_url")))
    )
    links = tagged.filter(F.col("entity_type") == "link").withColumn(
        "_norm_href", F.regexp_replace(F.col("k"), _RE_HREF_NORM, "")
    )
    return (
        links.join(pages, links["_norm_href"] == pages["_target_url"], "left")
        .withColumn(
            "target_kind",
            F.when(F.col("target_page_id").isNotNull(), F.lit("internal")).otherwise(
                F.lit("external")
            ),
        )
        .drop("_target_url")
    )


def write_fanout(
    changelog: DataFrame,
    out_dir: str,
    entity_types: tuple[str, ...] = ENTITY_TYPES,
    dedup: bool = False,
) -> dict[str, int]:
    """Fan out to one parquet table per entity (reference: 15 JSON-list
    sinks, ClinVarPipelineBuilder.scala:39-113). Returns row counts."""
    import os

    frames = fanout(changelog, entity_types, dedup=dedup)
    tagged = frames.pop("_tagged")
    counts: dict[str, int] = {}
    try:
        for et, df in frames.items():
            path = os.path.join(out_dir, et)
            df.write.mode("overwrite").parquet(path)
            counts[et] = df.count()
    finally:
        tagged.unpersist()
    return counts


def write_fanout_lakelet(
    changelog: DataFrame,
    root: str,
    batch_id: str,
    entity_types: tuple[str, ...] = ENTITY_TYPES,
    n_buckets: int = 16,
    dedup: bool = True,
) -> dict[str, str]:
    """Fan out into VERSIONED lakelet tables — one snapshot table per
    entity under ``root/<entity>/``, a new snapshot per batch.

    This is the reference's actual sink model (every release's 15
    entity tables live side by side, keyed by (id, release_date) —
    README.md:13-22): each call commits a complete new version of every
    entity table with a deterministic ``batch_id``-derived snapshot id
    (idempotent: re-running the same batch re-points, never rewrites),
    and older versions stay time-travelable. Entity key =
    ``url ␟ k`` (composite key flattened; the reference's per-table PK
    override, diff.py:122-129).

    Returns entity → committed snapshot id.
    """
    import os

    from clinvar_ingest_spark.lakelet.manifest import ColumnSpec
    from clinvar_ingest_spark.lakelet.table import LakeletTable, bucket_expr

    cols = [
        ColumnSpec(1, "ek", "string"),
        ColumnSpec(2, "url", "string"),
        ColumnSpec(3, "warc_ts", "timestamp"),
        ColumnSpec(4, "k", "string"),
        ColumnSpec(5, "v", "string"),
        ColumnSpec(6, "n", "long"),
    ]
    frames = fanout(changelog, entity_types, dedup=dedup)
    tagged = frames.pop("_tagged")
    out: dict[str, str] = {}
    try:
        for et, df in frames.items():
            t = LakeletTable.create(
                os.path.join(root, et), cols, n_buckets=n_buckets, key_col="ek"
            )
            if t.manifest().batch_id == batch_id:
                # already-committed batch (the engine's ledger-style
                # short-circuit): re-running is a no-op
                out[et] = t.current_snapshot_id()
                continue
            rows = (
                df.withColumn(
                    "ek",
                    F.concat_ws("\x1f", F.col("url"), F.coalesce("k", F.lit(""))),
                )
                .withColumn("_bucket", bucket_expr("ek", n_buckets))
                .select("ek", "url", "warc_ts", "k", "v", "n", "_bucket")
            )
            out[et] = t.commit_rewrite(
                rows.sparkSession,
                rows,
                touched_buckets=list(range(n_buckets)),  # full table version
                batch_id=batch_id,
            )
    finally:
        tagged.unpersist()
    return out
