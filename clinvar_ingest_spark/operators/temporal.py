"""Temporal operators: as-of (point-in-time) join and sessionization.

Why these belong in a CDC engine: the lakelet keeps *every* version of
every row (reference keeps all releases side by side, README.md:13-22;
`clinvar_release` asset pins one consistent cut per release_date,
schema/src/main/jade-assets/clinvar_release.asset.json:1-60). The
natural read-side counterpart is "enrich each fact with the state that
was current AT ITS OWN timestamp" — an as-of join — and "segment an
ordered change stream into bursts" — sessionization. The reference gets
the first implicitly by equi-joining on release_date (every query
carries `release_date =`, docker/diff/diff.py:79,160-162); we provide
the general event-time form.

**As-of join** (:func:`asof_join`): for each left row, the single right
row with the greatest ``right_ts`` ≤ left's ``ts`` within the same key
(optionally bounded by a tolerance). Spark has no built-in as-of join;
the naive range join explodes to |L|·|R| per key. We use the
union-tagged sweep formulation instead:

    tag rows (right=0, left=1) → one shuffle on key →
    last(right_payload, ignorenulls) over
        (partitionBy key orderBy ts, tag, tie rowsBetween unbounded, current)
    → keep left rows.

One Exchange, one per-key sort, zero Python, output size exactly |L|.
At 10^10 rows both inputs shuffle once on the join key — same cost
shape as the MERGE apply itself — and a hot key degrades to a single
sorted partition rather than a quadratic blowup. Right-side duplicate
timestamps are pre-reduced per (key, ts) with ``max_by`` on the tie
column so the match is deterministic (same discipline as LWW ties on
``seq``, operators/lww.py).

**Sessionization** (:func:`sessionize`): gap-based session ids per key
(new session when the gap to the previous event exceeds ``gap``),
expressed as lag → boundary flag → running sum — two window passes over
ONE shuffle (both windows share the (key, ts) partitioning/sort, and
Catalyst plans them in a single Exchange + Sort). This is the batch
equivalent of Structured Streaming's session windows; the streaming
path (`streaming/stateful.py`) covers the continuous form.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Optional[Sequence[str]] = None,
    tie_col: Optional[str] = None,
    prefix: str = "asof_",
    tolerance_seconds: Optional[int] = None,
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    Returns ``left.*`` plus ``{prefix}{right_ts}`` and ``{prefix}{c}``
    for each payload column (NULL when no right row precedes the left
    row, or none within ``tolerance_seconds``).

    ``tie_col``: right-side column whose maximum breaks duplicate
    (key, right_ts) rows deterministically (required if duplicates are
    possible — nondeterministic matches break replay reconvergence).
    """
    keys = list(keys)
    if payload is None:
        payload = [
            c for c in right.columns if c not in keys and c != right_ts and c != tie_col
        ]
    payload = list(payload)

    # Deterministic right side: one row per (key, ts).
    if tie_col is not None:
        r = right.groupBy(*keys, right_ts).agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]), F.col(tie_col)
            ).alias("_r")
        )
    else:
        r = right.select(
            *keys, right_ts, F.struct(*[F.col(c) for c in payload]).alias("_r")
        ).dropDuplicates(keys + [right_ts])

    match_t = r.schema["_r"].dataType
    l_cols = [c for c in left.columns]

    l_tag = left.select(
        *[F.col(c) for c in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
        F.lit(None).cast(match_t).alias("_r"),
    )
    r_tag = r.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.col("_r"),
    )

    # Right rows sort BEFORE left rows at equal ts → inclusive (ts >= match).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .withColumn(
            "_match_ts", F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w)
        )
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = F.col("_match_ts") >= (
            F.col("_ts") - F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        )
        swept = swept.withColumn(
            "_match", F.when(in_tol, F.col("_match"))
        ).withColumn("_match_ts", F.when(in_tol, F.col("_match_ts")))

    out_cols = [F.col(f"_l.{c}").alias(c) for c in l_cols]
    out_cols.append(F.col("_match_ts").alias(f"{prefix}{right_ts}"))
    out_cols.extend(F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in payload)
    return swept.select(*out_cols)


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    gap_seconds: int = 1800,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session numbers per key.

    Adds ``session_n`` (1-based, in ts order per key): a new session
    starts when the gap to the previous row exceeds ``gap_seconds``.
    ``tie_cols`` make the intra-key order total when timestamps can
    collide (determinism contract, same as LWW ``seq``).
    """
    order = [F.col(ts)] + [F.col(c) for c in tie_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    # Compare as a day-time INTERVAL, exact to the microsecond and —
    # unlike unix_micros, which is TIMESTAMP-only and raises on
    # TIMESTAMP_NTZ — valid for BOTH timestamp dtypes. A default-config
    # Spark 4 session (parquet inferTimestampNTZ on) reads tz-naive
    # parquet as TIMESTAMP_NTZ, so the gap test must be dtype-robust;
    # interval subtraction is also timezone-free (pure wall-clock for
    # NTZ, pure instant for TIMESTAMP), so no DST edge can disagree
    # with a naive-arithmetic oracle.
    gap_iv = F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
    is_new = (prev.isNull() | ((F.col(ts) - prev) > gap_iv)).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_n", F.sum(is_new).over(wsum))


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    gap_seconds: int = 1800,
    tie_cols: Sequence[str] = (),
    value_col: Optional[str] = None,
) -> DataFrame:
    """Per-session aggregate view: bounds, event count, optional value sum."""
    s = sessionize(df, keys, ts, gap_seconds, tie_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return s.groupBy(*keys, "session_n").agg(*aggs)
