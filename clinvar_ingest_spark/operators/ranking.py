"""BM25 ranked retrieval over a document corpus — the query side of the
inverted index (operators/index.py maintains the postings; this scores).

The reference has no ranking (its "search" is BigQuery point SQL); BM25
is the standard lexical ranking a training-data pipeline needs for
corpus triage (find near-query documents to exclude/inspect) and it
composes with the engine's derived-index machinery. Formula is the
Lucene/Robertson variant with the +1 idf floor (idf is never negative):

    idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))

Scale shape (100 TB corpus, handful of query terms):
- The term filter is an ``isin`` over a literal list — Catalyst pushes
  it into the parquet scan (only rows whose token matches survive the
  explode filter; the scan itself still reads `text`, which is
  inherent: lexical scoring reads the text once. With a maintained
  inverted index the explode is replaced by a postings read).
- Per-(doc, term) tf is one partial-aggregated groupBy — map-side
  combine shrinks the Exchange to matched (doc, term) pairs only.
- Corpus stats (N, avgdl) are ONE aggregate row, broadcast back via
  ``crossJoin(broadcast(stats))`` — no driver round-trip in the plan.
- Per-term df is a window count over the already-filtered tf table
  (one Exchange of matched pairs), NOT a groupBy+join back — that
  would recompute tf's lineage and re-tokenize the corpus a third
  time. The corpus is read exactly twice (stats pass + tf pass).
- Top-k is ``orderBy(...).limit(k)`` → TakeOrderedAndProject: each
  partition keeps a k-heap, the driver merges k·P candidates; no
  global sort. Ranking ties are broken on the e4-rounded integer score
  then doc id, so the cut is deterministic and oracle-mirrorable
  (float last-ulp noise cannot reorder the boundary).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from clinvar_ingest_spark.functions.text import token_count, tokens


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 over whitespace tokens.

    Returns ``(doc_id, n_terms, bm25_e4)`` — ``bm25_e4`` is the score
    rounded to 1e-4 and cast to long (the repo's float-determinism
    contract: order-of-addition noise across engines is ~1e-16
    relative, far under the rounding grain), ``n_terms`` the count of
    distinct query terms the document matched.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    term_lits = [str(t) for t in terms]

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_toks"),
        token_count(F.col(text_col)).alias("dl"),
    )

    # ONE aggregate row with the corpus constants, broadcast to every
    # matched row — cheaper than two scalar subqueries and keeps the
    # whole computation in a single plan.
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    tf = (
        base.select("doc_id", "dl", F.explode("_toks").alias("token"))
        .filter(F.col("token").isin(term_lits))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    # Per-term document frequency as a window over the (small, already
    # filtered) tf table — one Exchange of matched pairs — instead of a
    # groupBy+join back, which would RECOMPUTE tf's whole lineage and
    # re-tokenize the corpus a third time (the corpus is read exactly
    # twice: the stats pass and the tf pass; at production scale N and
    # avgdl come free from table-stat manifests and it drops to once).
    dfreq_w = Window.partitionBy("token")

    scored = (
        tf.withColumn(
            "dfreq", F.count(F.lit(1)).over(dfreq_w).cast("double")
        )
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5) + 1.0),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("w") * 10000.0, 0).cast("long").alias("bm25_e4"),
        )
    )
    return scored.orderBy(F.desc("bm25_e4"), F.asc("doc_id")).limit(k)
