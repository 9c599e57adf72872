"""Gopher-style document quality gate: compose the integer text signals
into per-gate booleans and one keep decision.

The published webtext recipes (Gopher's quality heuristics, C4's
cleanup) gate documents on length, within-document repetition, and
"looks like natural language" signals. This operator composes the
engine's existing integer kernels (:mod:`..functions.text`) into that
decision — as column expressions only, so the gate fuses into the same
codegen stage as the signal computation: at 100 TB the whole filter is
one scan with zero shuffles and zero Python.

Thresholds are **parts-per-thousand integers** compared via
cross-multiplication (``top_token_count * 1000 <= thresh * n_tokens``)
— no floating-point ratios, so the DuckDB oracle agrees exactly and
results are bit-stable across engines and hardware.

Gate semantics (each True = document passes that gate):

- ``g_len``: ``min_tokens <= n_tokens <= max_tokens``.
- ``g_top_token``: most frequent token ≤ ``max_top_token_permille`` of
  all tokens (catches "foo foo foo ..." spam); empty docs fail.
- ``g_dup_trigram``: duplicated trigram mass ≤
  ``max_dup_trigram_permille`` (catches boilerplate/looping text);
  docs with no trigrams pass vacuously.
- ``g_stopword``: at least ``min_stopwords`` English stopwords
  (Gopher's "contains ≥2 stop words" natural-language check).
- ``keep`` = all gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clinvar_ingest_spark.functions.text import (
    distinct_trigram_count,
    stopword_count,
    token_count,
    top_token_count,
    trigram_count,
)

__all__ = ["quality_gate", "quality_filter"]


def quality_gate(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_top_token_permille: int = 100,
    max_dup_trigram_permille: int = 20,
    min_stopwords: int = 2,
) -> DataFrame:
    """Append ``g_len``/``g_top_token``/``g_dup_trigram``/``g_stopword``
    boolean columns and the combined ``keep``."""
    c = F.col(text_col)
    n_tok = token_count(c)
    top = top_token_count(c)
    n_tri = trigram_count(c)
    n_dtri = distinct_trigram_count(c)
    n_sw = stopword_count(c, "en")

    g_len = (n_tok >= F.lit(min_tokens)) & (n_tok <= F.lit(max_tokens))
    g_top = (n_tok > 0) & (top * 1000 <= F.lit(max_top_token_permille) * n_tok)
    g_tri = (n_tri == 0) | (
        (n_tri - n_dtri) * 1000 <= F.lit(max_dup_trigram_permille) * n_tri
    )
    g_sw = n_sw >= F.lit(min_stopwords)

    return (
        df.withColumn("g_len", g_len)
        .withColumn("g_top_token", g_top)
        .withColumn("g_dup_trigram", g_tri)
        .withColumn("g_stopword", g_sw)
        .withColumn("keep", g_len & g_top & g_tri & g_sw)
    )


def quality_filter(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """``df`` restricted to rows passing every gate, original columns
    only — the filtering form of :func:`quality_gate`."""
    gated = quality_gate(df, text_col=text_col, **thresholds)
    return gated.filter("keep").select(*df.columns)
