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

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from clinvar_ingest_spark.functions.text import token_count, tokens


def _dl_from_toks(toks):
    """``token_count`` derived from an already-split token array —
    guarantees ONE tokenization per row without leaning on codegen
    subexpression elimination. ``split(trim(''))`` yields ``['']``,
    exactly token_count's blank→0 case; NULL propagates identically."""
    return F.when(
        (F.size(toks) == 1) & (F.element_at(toks, 1) == ""), F.lit(0)
    ).otherwise(F.size(toks))


def _score_topk(
    tf_with_dfreq: DataFrame,
    stats_df: DataFrame,
    k1: float,
    b: float,
    id_col: str,
    k: int,
) -> DataFrame:
    """Shared BM25 scoring tail — idf, per-(doc,term) weight, e4-rounded
    sum, deterministic top-k cut. The formula lives ONCE so the brute
    and index-backed paths cannot drift apart (their row-for-row
    agreement is pytest-pinned). Input: (id_col, dl, token, tf, dfreq)
    rows; ``stats_df`` one (n_docs, avgdl) row, broadcast."""
    scored = (
        tf_with_dfreq.crossJoin(F.broadcast(stats_df))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("dfreq") + 0.5)
                / (F.col("dfreq") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("w") * 10000.0, 0).cast("long").alias("bm25_e4"),
        )
    )
    return scored.orderBy(F.desc("bm25_e4"), F.asc(id_col)).limit(k)


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
    ).select("doc_id", "_toks", _dl_from_toks(F.col("_toks")).alias("dl"))

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

    return _score_topk(
        tf.withColumn("dfreq", F.count(F.lit(1)).over(dfreq_w).cast("double")),
        stats,
        k1, b, "doc_id", k,
    )


def text_token_pairs(pages: DataFrame, text_col: str = "text", url_col: str = "url") -> DataFrame:
    """Content tokenizer for :class:`operators.index.InvertedIndex`:
    distinct (token, url) membership pairs from whitespace tokens of
    ``text_col`` — the "swap in a text tokenizer" the index docstring
    promises. Pure column expressions; distinct-pair output is exactly
    the membership contract the index maintenance delta needs."""
    return (
        pages.select(
            F.explode(tokens(F.col(text_col))).alias("token"),
            F.col(url_col).alias("url"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


#: SQL-expr mirror of functions.text.token_count (whitespace token
#: count, 0 for blank) — usable as an AggViewSpec sum measure so the
#: corpus doc-length total can be MAINTAINED from the CDC feed instead
#: of recomputed. The '\\s+' doubling survives Spark SQL's string
#: unescaping to reach the regex engine as \s+ (pytest-pinned equal to
#: the Column form).
DOC_LEN_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE size(split(trim(text), '\\\\s+')) END"
)


def corpus_stats_view(engine, root: str):
    """A GLOBAL :class:`operators.ivm.MaterializedAggView` holding the
    BM25 corpus constants — ``n_docs`` (live document count) and
    ``sum_dl`` (summed whitespace-token doc length) — maintained from
    changed buckets only. ``refresh()`` after each replay; pass the
    view to :func:`bm25_topk_indexed` as ``stats_view`` and query-time
    cost loses its last corpus-sized touch."""
    from clinvar_ingest_spark.operators.ivm import AggViewSpec, MaterializedAggView

    spec = AggViewSpec(
        group_cols=[],
        measures=[("n_docs", "count"), ("sum_dl", "sum", DOC_LEN_SQL)],
    )
    return MaterializedAggView(engine, spec, root)


def bm25_topk_indexed(
    index,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "url",
    stats: Optional[Tuple[float, float]] = None,
    stats_view=None,
) -> DataFrame:
    """Top-``k`` BM25 using the maintained inverted index as the
    retrieval side — the 100 TB query path.

    Where :func:`bm25_topk` tokenizes the whole corpus per query (two
    full scans), this reads the query terms' POSTING rows from the
    index table (bucket-pruned: only index buckets holding a query
    token are scanned), takes per-term document frequency directly
    from ``size(urls)`` (postings are distinct membership, so that IS
    df), and re-tokenizes ONLY the candidate documents — a left-semi
    join on the posting union, co-located with the pages table's own
    url bucketing. Query cost is ∝ candidate set, never corpus size.

    ``stats``: optional precomputed ``(n_docs, avgdl)`` corpus
    constants. ``stats_view``: a :func:`corpus_stats_view` maintained
    against the same engine — the constants then come from ONE stored
    row (incrementally maintained from changed buckets, never a
    corpus scan) and are freshness-checked like the index. When
    neither is given they are computed with one column-pruned agg
    pass, the only remaining corpus-sized touch.

    Capped ("too common to index", ``max_posting``) tokens have empty
    postings and are skipped — the standard stopword rule; the brute
    scorer would still count them, so compare the two only on uncapped
    indexes.

    Requires the index to be fresh (``indexed_snapshot ==`` current)
    and built with a tokenizer whose membership matches whitespace
    ``tokens()`` of ``text_col`` (:func:`text_token_pairs`); raises on
    a stale index rather than silently scoring against old postings.
    """
    if not terms:
        raise ValueError("bm25_topk_indexed needs at least one query term")
    cur = index.engine.table.current_snapshot_id()
    if index.indexed_snapshot_id() != cur:
        raise ValueError(
            f"index is stale (indexed={index.indexed_snapshot_id()!r}, "
            f"current={cur!r}); call refresh() first"
        )
    term_lits = [str(t) for t in terms]

    posts = index.read().filter(
        F.col("token").isin(term_lits) & (F.size("urls") > 0)
    )
    # df per term = posting size; explode to the candidate pairs
    cand_pairs = posts.select(
        "token",
        F.size("urls").cast("double").alias("dfreq"),
        F.explode("urls").alias(id_col),
    )
    cand_ids = cand_pairs.select(id_col).distinct()

    pages = index.engine.pages()
    fwd = (
        pages.join(cand_ids, on=id_col, how="left_semi")
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(id_col, "_toks", _dl_from_toks(F.col("_toks")).alias("dl"))
    )

    if stats is None and stats_view is not None:
        if stats_view.current_snapshot_id() != cur:
            raise ValueError(
                f"stats_view is stale (view={stats_view.current_snapshot_id()!r}, "
                f"current={cur!r}); call refresh() first"
            )
        rows = stats_view.read().collect()  # global view: ≤ 1 row
        if not rows or rows[0]["n_docs"] == 0:
            raise ValueError("stats_view reports an empty corpus")
        # integer sums < 2^53 ⇒ this division equals F.avg exactly
        stats = (float(rows[0]["n_docs"]), rows[0]["sum_dl"] / rows[0]["n_docs"])
    if stats is None:
        st = pages.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg(token_count(F.col(text_col))).alias("avgdl"),
        )
    else:
        n_docs, avgdl = stats
        st = index.engine.spark.range(1).select(
            F.lit(float(n_docs)).alias("n_docs"), F.lit(float(avgdl)).alias("avgdl")
        )

    tf = (
        fwd.select(id_col, "dl", F.explode("_toks").alias("token"))
        .filter(F.col("token").isin(term_lits))
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    return _score_topk(
        tf.join(
            F.broadcast(cand_pairs.select("token", "dfreq").distinct()), "token"
        ),
        st,
        k1, b, id_col, k,
    )
