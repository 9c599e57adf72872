"""Timestamp-dtype-robust helpers.

Spark has two timestamp types and the split is a correctness trap for a
CDC engine that must run under ANY session config: the engine's own
session factory pins ``spark.sql.parquet.inferTimestampNTZ.enabled=false``
(session.py), but a caller's default-config Spark 4 session reads
tz-naive parquet as ``TIMESTAMP_NTZ``, where ``F.unix_micros`` raises at
analysis time and a plain ``cast("timestamp")`` silently re-interprets
the wall clock in the session timezone (wrong epoch under any non-UTC
zone, DST holes under zones that observe it).

``epoch_micros`` gives the exact integer microsecond value for BOTH
dtypes with zero timezone involvement:

- ``TIMESTAMP`` (instant): ``unix_micros`` — already tz-free.
- ``TIMESTAMP_NTZ`` (wall clock): decomposed field arithmetic
  ``days*86_400e6 + hour/minute/second(decimal(8,6))`` — the naive
  epoch, bit-identical to what DuckDB's ``epoch_us`` computes over the
  same tz-naive parquet.

Reference parity: clinvar-ingest normalizes every ClinVar release date
to a single canonical representation before diffing
(docker/diff/diff.py release_date handling); this module is the same
"one canonical clock" rule applied to Spark's dual timestamp dtypes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000
_US_PER_MIN = 60_000_000


def _ntz_epoch_micros(c: Column) -> Column:
    """Naive (wall-clock) epoch micros for a TIMESTAMP_NTZ column.

    Pure field decomposition — no timezone enters the computation, so
    the result is exact for any session timezone and any DST rule.
    ``date_part('SECOND')`` returns decimal(8,6) (fractional seconds
    preserved); scaling by 1e6 in decimal then casting is lossless.
    """
    days = F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01"))).cast("long")
    sec_us = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
    return (
        days * F.lit(_US_PER_DAY)
        + F.hour(c).cast("long") * F.lit(_US_PER_HOUR)
        + F.minute(c).cast("long") * F.lit(_US_PER_MIN)
        + sec_us
    )


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Exact integer epoch-microseconds for ``df[col]``, either dtype.

    TIMESTAMP → ``unix_micros`` (true epoch of the instant);
    TIMESTAMP_NTZ → naive epoch of the wall clock (matches a naive
    oracle such as DuckDB reading the same tz-naive parquet). Null in,
    null out.
    """
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, TimestampNTZType):
        return _ntz_epoch_micros(c)
    return F.unix_micros(c)
