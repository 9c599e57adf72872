"""Z-order (Morton) interleave keys for sorted data layout.

Multi-dimensional clustering for the lakelet's sorted-rewrite
maintenance op (:func:`clinvar_ingest_spark.lakelet.maintenance
.sort_rewrite`): each participating column is min/max-normalized to a
``bits``-wide integer rank, and the ranks' bits are interleaved into
one long. Sorting by that long places rows close in EVERY participating
dimension close on disk, so parquet row-group / page statistics become
tight in all of them at once — the multi-column generalization of a
plain ``ORDER BY``, and the same layout trick Iceberg/Delta expose as
``zorder by``. The whole key is built from JVM column expressions
(shifts, masks, ORs) — codegen'd, zero Python in the hot path.

Normalization uses global min/max bounds (one bounded agg — a
``collect()`` of a single row, the documented driver-side metadata
exception). Rank resolution is ``bits`` per column with
``bits * n_cols <= 63``; ties inside a rank cell are harmless — the
key orders CELLS, row order inside a cell doesn't affect stats
tightness at row-group granularity.

Supported column types: any numeric, timestamp (via epoch seconds),
date (via epoch days), boolean. Strings are rejected — a linear
projection of a string is not order-preserving without sampled range
boundaries (the range-partitioner trick); keep string dimensions out
of the key or pre-map them to a numeric rank upstream.

Reference parity: the reference's tables lean on BigQuery clustered
tables for this (cluster-by on release_date/id columns, the TDR side
of schema/*.table.json); sort_rewrite + zorder_key is the lakelet's
explicit equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["column_bounds", "zorder_key", "rank_expr"]

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _as_double(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.TimestampType):
        # timestamp→double is epoch seconds incl. fractional micros
        return col.cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, T.BooleanType):
        return col.cast("int").cast("double")
    if isinstance(dtype, _NUMERIC):
        return col.cast("double")
    raise TypeError(f"zorder_key: unsupported column type {dtype.simpleString()}")


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Global (min, max) per participating column — ONE aggregate job,
    single-row collect (bounded metadata)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in cols:
        d = _as_double(F.col(c), schema[c])
        aggs.append(F.min(d).alias(f"_min_{c}"))
        aggs.append(F.max(d).alias(f"_max_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"_min_{c}"], row[f"_max_{c}"]
        out[c] = (float(lo if lo is not None else 0.0), float(hi if hi is not None else 0.0))
    return out


def rank_expr(
    col: Column, dtype: T.DataType, lo: float, hi: float, bits: int
) -> Column:
    """``bits``-wide integer rank of ``col`` in [lo, hi]; NULLs rank 0
    (sort first, like NULLS FIRST)."""
    span = hi - lo
    maxrank = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    d = _as_double(col, dtype)
    r = F.floor(((d - F.lit(lo)) / F.lit(span)) * F.lit(float(maxrank)))
    r = F.least(F.greatest(r, F.lit(0)), F.lit(maxrank))
    return F.coalesce(r, F.lit(0)).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton-interleaved sort key over ``cols`` as one long column
    expression. ``bounds`` (from :func:`column_bounds`) may be passed
    to reuse bounds across calls (e.g. rewrite planning vs tests);
    computed in one agg when omitted.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if bits * n > 63:
        raise ValueError(f"zorder_key: bits*n_cols = {bits * n} exceeds 63")
    if bounds is None:
        bounds = column_bounds(df, cols)
    schema = {f.name: f.dataType for f in df.schema.fields}
    ranks = [
        rank_expr(F.col(c), schema[c], bounds[c][0], bounds[c][1], bits) for c in cols
    ]
    if n == 1:
        return ranks[0]
    # out |= ((rank_i >> b) & 1) << (b*n + i), all JVM bitwise exprs
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key
