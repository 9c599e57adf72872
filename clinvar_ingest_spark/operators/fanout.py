"""Single-pass multi-entity fan-out — SURVEY.md §2.8, the reference's
signature dataflow operator.

The reference parses each VariationArchive once and emits to 14 side
outputs + 1 main output (ArchiveBranches.scala:52-113); Beam guarantees
the input is read once. Spark has no side outputs, so the same shape
is: parse once into a tagged long-thin DataFrame (one row per emitted
entity) → ``persist()`` → N filtered projections/writes. The persist
replaces Beam's single-pass guarantee — without it Catalyst re-runs the
parse per action.

Entities emitted per page event here (the web analogue of the
reference's entity split):

- ``page``  — the page itself (url, ts, lang, text length)
- ``link``  — one row per outgoing href found in the html
- ``host``  — one row per page for per-host rollups

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
        T.StructField("k", T.StringType()),   # entity-specific key (href, host)
        T.StructField("v", T.StringType()),   # entity-specific value
        T.StructField("n", T.LongType()),     # entity-specific measure
    ]
)

_RE_HREF = re.compile(r'(?i)href\s*=\s*["\']([^"\'>\s]+)["\']')
_RE_HOST = re.compile(r"^[a-z]+://([^/]+)")


def parse_entities(changelog: DataFrame) -> DataFrame:
    """One parse pass over page events → tagged entity rows.

    Input: changelog columns (url, warc_ts, html, lang, ...); delete
    events (html NULL) emit nothing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["html"].notna()]
            if not len(pdf):
                continue
            html = pdf["html"].map(
                lambda b: b.decode("utf-8", "replace") if b is not None else ""
            )
            text = extract_text_series(pdf["html"])
            # page entity
            yield pd.DataFrame(
                {
                    "entity_type": "page",
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "k": pdf["lang"],
                    "v": None,
                    "n": text.str.len().astype("int64"),
                }
            )
            # host entity
            hosts = pdf["url"].str.extract(_RE_HOST, expand=False)
            yield pd.DataFrame(
                {
                    "entity_type": "host",
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "k": hosts,
                    "v": None,
                    "n": 1,
                }
            )
            # link entities (explode hrefs)
            links = html.map(_RE_HREF.findall)
            counts = links.map(len)
            if counts.sum() > 0:
                yield pd.DataFrame(
                    {
                        "entity_type": "link",
                        "url": pdf["url"].repeat(counts).to_numpy(),
                        "warc_ts": pdf["warc_ts"].repeat(counts).to_numpy(),
                        "k": [h for hs in links for h in hs],
                        "v": None,
                        "n": 1,
                    }
                )

    return changelog.mapInPandas(run, schema=ENTITY_SCHEMA)


def fanout(
    changelog: DataFrame,
    entity_types: tuple[str, ...] = ("page", "host", "link"),
) -> dict[str, DataFrame]:
    """Parse once, return one filtered projection per entity type.

    The tagged frame is persisted so the N downstream actions share one
    parse (Beam side-output parity); call ``unpersist_fanout`` (or let
    the context expire) when done.
    """
    tagged = parse_entities(changelog).persist()
    out: dict[str, DataFrame] = {"_tagged": tagged}
    for et in entity_types:
        out[et] = tagged.filter(F.col("entity_type") == et).drop("entity_type")
    return out


def write_fanout(
    changelog: DataFrame,
    out_dir: str,
    entity_types: tuple[str, ...] = ("page", "host", "link"),
) -> dict[str, int]:
    """Fan out to one parquet table per entity (reference: 15 JSON-list
    sinks, ClinVarPipelineBuilder.scala:39-113). Returns row counts."""
    import os

    frames = fanout(changelog, entity_types)
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
