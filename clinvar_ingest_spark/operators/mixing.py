"""Dataset mixing — deterministic weighted up/down-sampling per source.

Every LLM training corpus is assembled as a WEIGHTED MIXTURE of
sources (The Pile's per-set epochs, Dolma/RedPajama mixture tables):
source A at weight 0.3 (keep 30 %), source B at weight 2.5 (take every
doc twice, plus a 50 % chance of a third copy). This operator applies
such a mixture spec exactly and deterministically:

    copies(doc) = floor(w) + [frac_hash(doc, floor(w)) < w - floor(w)]

where ``frac_hash`` is the cross-engine md5-48 hash of
``key || ':' || epoch`` scaled to [0, 1) — a pure function of the doc
key and the copy index, so the SAME docs get the SAME copy counts on
any engine, any partitioning, any run (reproducible training sets; the
same discipline as `operators/sampling.hash_sample`). The fractional
tie-break hashes the LAST epoch index so integral weights (w = 2.0)
never consult randomness at all.

Output one row per (doc, epoch) with ``epoch ∈ [0, copies)`` — the
downstream shuffle/tokenizer sees upsampled docs as distinct rows, and
``epoch`` lets it salt sequence-level shuffling per copy.

Plan shape: a broadcast of the (tiny) mixture table, one JVM hash per
doc, and an `explode(sequence(...))` for the copy fan-out — no shuffle
at all; the operator fuses into the scan stage. Weight skew is the
caller's policy knob, not a plan hazard.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.xhash import md5_long48

#: hash domain of md5_long48
_DOMAIN = 1 << 48


def apply_mixture(
    df: DataFrame,
    weights: Dict[str, float],
    source_col: str = "source",
    key_cols: Sequence[str] = ("doc_id",),
    default_weight: float = 0.0,
    precision: int = 1_000_000,
) -> DataFrame:
    """Apply a mixture spec: per source, emit ``floor(w)`` full copies
    of every doc plus one more with probability ``w - floor(w)``
    (deterministic per doc). Sources absent from ``weights`` get
    ``default_weight`` (0 ⇒ dropped). Adds an ``epoch`` column.

    Weights are snapped to ``1/precision`` so the fractional test is
    integer arithmetic (``hash % precision < round(frac·precision)``) —
    bit-identical in any engine, no float thresholds."""
    rows = []
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {src!r}")
        whole = int(w)
        frac_num = round((w - whole) * precision)
        if frac_num == precision:  # e.g. 1.9999999 snapping up
            whole, frac_num = whole + 1, 0
        rows.append((src, whole, frac_num))
    spark = df.sparkSession
    mix = spark.createDataFrame(
        rows, f"{source_col} string, _whole int, _frac_num long"
    )

    d_whole = int(default_weight)
    d_frac = round((default_weight - d_whole) * precision)
    joined = df.join(F.broadcast(mix), on=source_col, how="left").select(
        df["*"],
        F.coalesce(F.col("_whole"), F.lit(d_whole)).alias("_whole"),
        F.coalesce(F.col("_frac_num"), F.lit(d_frac)).alias("_frac_num"),
    )

    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    # the fractional copy consults the hash of (key, epoch=_whole): a
    # doc's extra-copy decision is independent of its full copies
    h = md5_long48(F.concat_ws(":", key, F.col("_whole").cast("string")))
    copies = F.col("_whole") + F.when(
        (F.col("_frac_num") > 0)
        & (F.pmod(h, F.lit(precision)) < F.col("_frac_num")),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = (
        joined.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1))
        )
        .drop("_whole", "_frac_num", "_copies")
    )
    return out


def mixture_sql(
    weights: Dict[str, float],
    source_col: str = "source",
    key_expr: str = "CAST(doc_id AS VARCHAR)",
    precision: int = 1_000_000,
) -> str:
    """DuckDB mirror of :func:`apply_mixture` over a table named
    ``documents`` — used by the driver oracle and as executable
    documentation of the exact semantics."""
    cases_whole, cases_frac = [], []
    for src, w in weights.items():
        whole = int(w)
        frac_num = round((w - whole) * precision)
        if frac_num == precision:
            whole, frac_num = whole + 1, 0
        cases_whole.append(f"WHEN '{src}' THEN {whole}")
        cases_frac.append(f"WHEN '{src}' THEN {frac_num}")
    whole_sql = f"CASE {source_col} " + " ".join(cases_whole) + " ELSE 0 END"
    frac_sql = f"CASE {source_col} " + " ".join(cases_frac) + " ELSE 0 END"
    h = (
        "('0x' || substr(md5("
        + key_expr
        + " || ':' || CAST(w AS VARCHAR)), 1, 12))::BIGINT"
    )
    return f"""
        WITH w AS (
          SELECT *, {whole_sql} AS w, {frac_sql} AS fnum FROM documents
        ),
        c AS (
          SELECT *, w + CASE WHEN fnum > 0
                              AND {h} % {precision} < fnum
                             THEN 1 ELSE 0 END AS copies
          FROM w
        )
        SELECT * EXCLUDE (w, fnum, copies),
               unnest(range(0, copies)) AS epoch
        FROM c WHERE copies > 0
    """
