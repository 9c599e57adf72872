"""Column-level LWW: patch-upsert folding (Debezium-style partial
updates).

Row-level LWW (operators/lww.py; the engine's merge) replaces the WHOLE
row with the latest event. Real CDC feeds also carry PARTIAL updates —
an event sets some columns and leaves the rest alone (Debezium "patch"
payloads, Kafka Connect partial upserts, mobile profile-field writes).
The folded state is then per-COLUMN last-writer-wins: each column
independently takes its value from the latest event in which it was
present (non-null).

Plan: ONE hash aggregate — per column
``max_by(col, ord) FILTER (WHERE col IS NOT NULL)`` — so the fold is
map-side combined (partial max_by per column before the Exchange) and
the shuffle carries one combined row per key per map partition, never
the event stream. No window, no sort, no join: at 10^10 events this is
the same shape as the engine's A1 dedup and scales identically. Skewed
keys are absorbed by the partial aggregation (a hot key's events
combine within each map task first).

Reference parallel: the reference folds whole-release rows by date
(dedupByDate, ArchiveBranches.scala:140-156); this generalizes the fold
to column granularity for sources that ship deltas, not images.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F


def patch_lww_state(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    patch_cols: Mapping[str, str],
    extra_aggs: Mapping[str, str] | None = None,
) -> DataFrame:
    """Fold a partial-update event stream into per-key state.

    ``patch_cols`` maps output column name → SQL expression giving that
    column's value in an event (NULL = "this event does not touch the
    column"). ``order_by`` columns build the LWW position (compared as
    a struct, lexicographic — pass tiebreakers explicitly, e.g.
    ``["ts", "event_id"]``; nondeterministic ordering is a silent
    correctness bug at any scale). ``extra_aggs`` adds plain aggregate
    SQL expressions (counts, maxes) computed in the SAME single pass.
    """
    ord_sql = "struct(" + ", ".join(order_by) + ")"
    aggs = [
        F.expr(
            f"max_by({expr}, {ord_sql}) FILTER (WHERE ({expr}) IS NOT NULL)"
        ).alias(name)
        for name, expr in patch_cols.items()
    ]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(F.expr(expr).alias(name))
    return df.groupBy(*keys).agg(*aggs)
