"""timeutil.epoch_micros + sessionize dtype robustness.

The trap being tested: TIMESTAMP_NTZ under a NON-UTC session. A naive
``cast("timestamp")`` re-interprets the wall clock in the session zone
(wrong epoch, DST holes); ``unix_micros`` raises outright. epoch_micros
must return the NAIVE epoch for NTZ — bit-identical to DuckDB's
``epoch_us`` over the same tz-naive parquet — for ANY session timezone.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.timeutil import epoch_micros
from clinvar_ingest_spark.operators.temporal import sessionize

# 2024-03-10 02:30 is inside the US spring-forward DST hole — the
# adversarial wall clock for any session-zone cast under America/New_York
WALL = "2024-03-10 02:30:00.123456"
NAIVE_US = int(
    datetime.datetime(2024, 3, 10, 2, 30, 0, 123456, tzinfo=datetime.timezone.utc)
    .timestamp() * 1_000_000
)


@pytest.fixture(scope="module")
def ny_spark(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    ns.conf.set("spark.sql.shuffle.partitions", "2")
    return ns


def test_epoch_micros_ntz_is_tz_free(ny_spark):
    df = ny_spark.sql(f"SELECT timestamp_ntz'{WALL}' AS c")
    got = df.select(epoch_micros(df, "c").alias("u")).collect()[0][0]
    assert got == NAIVE_US  # naive epoch, even in a DST hole under NY tz


def test_epoch_micros_timestamp_is_instant(ny_spark):
    # TIMESTAMP literal parsed in session tz → instant; unix_micros path
    df = ny_spark.sql("SELECT timestamp'2024-06-01 12:00:00' AS c")
    got = df.select(epoch_micros(df, "c").alias("u")).collect()[0][0]
    want = int(
        datetime.datetime(2024, 6, 1, 12, 0, 0).replace(
            tzinfo=datetime.timezone(datetime.timedelta(hours=-4))
        ).timestamp() * 1_000_000
    )
    assert got == want


def test_epoch_micros_null_in_null_out(ny_spark):
    df = ny_spark.sql("SELECT cast(NULL as timestamp_ntz) AS c")
    assert df.select(epoch_micros(df, "c").alias("u")).collect()[0][0] is None


@pytest.mark.parametrize("ts_sql_type", ["timestamp", "timestamp_ntz"])
def test_sessionize_both_timestamp_dtypes(ny_spark, ts_sql_type):
    """The CORRECTNESS_r04 failure shape: sessionize must analyze AND
    agree on boundaries for both dtypes (gap exactly at / just past the
    threshold, microsecond precision)."""
    rows = [
        ("u1", "2024-01-01 00:00:00.000000", "e1"),
        ("u1", "2024-01-01 00:30:00.000000", "e2"),  # gap == 1800s → same session
        ("u1", "2024-01-01 01:00:00.000001", "e3"),  # gap 1800.000001s → new session
        ("u2", "2024-01-01 00:00:00.000000", "e4"),
    ]
    df = ny_spark.createDataFrame(rows, "user_id string, ts_s string, event_id string")
    df = df.select(
        "user_id",
        F.col("ts_s").cast(ts_sql_type).alias("ts"),
        "event_id",
    )
    out = {
        (r["user_id"], r["event_id"]): r["session_n"]
        for r in sessionize(df, ["user_id"], "ts", 1800, tie_cols=["event_id"]).collect()
    }
    assert out == {
        ("u1", "e1"): 1,
        ("u1", "e2"): 1,
        ("u1", "e3"): 2,
        ("u2", "e4"): 1,
    }
