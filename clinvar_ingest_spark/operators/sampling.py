"""Deterministic corpus sampling + stratified selection — the two ops a
training-data pipeline runs between dedup and export: cut a reproducible
subsample, then keep the best-k documents per stratum.

- :func:`hash_sample` — keep rows where ``hash(key) mod den < num``.
  Hash-based (not ``df.sample``): the decision is a pure function of
  the KEY, so it is reproducible across runs/engines/partitionings,
  stable under re-partitioning, and consistent between tables sharing
  the key (sampling documents and their embeddings by the same id
  selects matching rows). Uses the cross-engine md5 family
  (functions/xhash.py), so DuckDB oracles reproduce it bit-exactly.
- :func:`stratified_topk` — top-k rows per stratum by a score with a
  deterministic tie-break; rank window partitioned by the stratum
  (shuffle key = stratum; skewed strata are bounded by k output rows,
  and the rank window prunes with WindowGroupLimit pushdown).

Reference analogue: the pipeline's per-release slice selection +
ordered dedup (latest-k-per-key) generalized to score-ordered
selection (dedupByDate keeps k=1 by date; this keeps k by any score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hash_sample(
    df: DataFrame,
    key_col: str,
    num: int = 10,
    den: int = 100,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``num/den`` sample keyed on ``key_col``.

    ``salt`` derives independent samples from the same keys (different
    salt ⇒ statistically independent membership).
    """
    from clinvar_ingest_spark.functions.xhash import md5_long48

    if not (0 <= num <= den) or den <= 0:
        raise ValueError(f"invalid rate {num}/{den}")
    h = md5_long48(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.filter(h % den < num)


def stratified_topk(
    df: DataFrame,
    strata_col: str,
    score,
    k: int,
    tie_col: str,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per ``strata_col`` by ``score`` (desc), ties
    broken deterministically by ``tie_col`` (asc) — replay-stable
    selection, never ``ORDER BY`` + ``LIMIT`` per group in a loop."""
    w = Window.partitionBy(strata_col).orderBy(
        score.desc(), F.col(tie_col).asc()
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
