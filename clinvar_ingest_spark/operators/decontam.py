"""Train/eval decontamination: n-gram overlap against a holdout corpus.

The step every serious training-data pipeline runs between dedup and
tokenization: remove (or flag) training documents that share word
n-grams with evaluation/benchmark sets, so benchmark numbers measure
generalization rather than memorization (the published recipes —
GPT-3's 13-gram, PaLM/Gopher's 8-gram filters — are exactly this
shape; n is a parameter here).

Plan shape at 100 TB:

- both sides shingle through :func:`~clinvar_ingest_spark.operators
  .dedupe.ngram_shingles` (per-doc-distinct word n-grams) and reduce to
  8-byte ``xxhash64`` keys immediately — the join never carries gram
  strings;
- the benchmark side is per-gram distinct (map-side partial distinct)
  and is typically tiny next to the corpus (eval sets are MBs, corpora
  are TBs), so ``broadcast_benchmarks=True`` (default) makes the
  overlap probe a broadcast hash join: the corpus is never shuffled.
  Disable it for benchmark sets beyond broadcast size and the same
  plan runs as a shuffle equi-join, still corpus-linear;
- the per-doc hit count is a map-side-combining groupBy on doc id.

Collision note: a 64-bit hash can alias two distinct grams; at any
plausible gram cardinality the expected number of aliased PAIRS stays
≪1 until ~10^9 distinct grams (birthday bound), and an alias can only
add a hit, never lose one — acceptable for a contamination FILTER
(same trade the MinHash/SimHash family documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.dedupe import ngram_shingles

__all__ = ["ngram_overlap", "decontaminate"]


def ngram_overlap(
    docs: DataFrame,
    benchmarks: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast_benchmarks: bool = True,
) -> DataFrame:
    """Per-document benchmark n-gram overlap: ``(doc_id,
    n_overlap_grams, contaminated)`` for EVERY row of ``docs`` (zero /
    false when clean). ``n_overlap_grams`` counts the doc's distinct
    grams that appear anywhere in the benchmark corpus."""
    bench_sh = (
        ngram_shingles(
            benchmarks, bench_text_col or text_col, id_col, n
        )
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
    )
    if broadcast_benchmarks:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = ngram_shingles(docs, text_col, id_col, n).select(
        "id", F.xxhash64("shingle").alias("sh")
    )
    hits = (
        doc_sh.join(bench_sh, "sh")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap_grams"))
    )
    return (
        docs.select(F.col(id_col))
        .join(hits.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap_grams", F.lit(0)).alias("n_overlap_grams"),
            (F.coalesce("n_overlap_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmarks: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """``docs`` minus every row sharing an ``n``-gram with
    ``benchmarks`` — the filtering form of :func:`ngram_overlap`,
    keeping all original columns."""
    flags = ngram_overlap(
        docs, benchmarks, n=n, text_col=text_col, id_col=id_col, **kwargs
    )
    return docs.join(
        flags.filter(~F.col("contaminated")).select(id_col), id_col, "inner"
    )
