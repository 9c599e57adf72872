"""LWW dedup: reference semantics (ArchiveBranchesSpec.scala:50-228 —
latest-dated survivor per key) plus our deterministic seq tie-break."""

import datetime as dt

import pandas as pd
import pytest

from clinvar_ingest_spark.operators.lww import (
    lww_apply_in_pandas,
    lww_latest,
    lww_latest_window,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def events_df(spark):
    rows = [
        # key a: later warc_ts wins regardless of seq order
        (0, "a", _ts("2024-01-02T00:00:00"), "v1"),
        (1, "a", _ts("2024-01-05T00:00:00"), "v2"),  # winner
        (2, "a", _ts("2024-01-03T00:00:00"), "v3"),  # late arrival
        # key b: warc_ts tie → higher seq wins
        (3, "b", _ts("2024-01-01T00:00:00"), "w1"),
        (4, "b", _ts("2024-01-01T00:00:00"), "w2"),  # winner (seq)
        # key c: single row
        (5, "c", _ts("2024-01-01T00:00:00"), "x1"),
    ]
    return spark.createDataFrame(rows, ["seq", "url", "warc_ts", "payload"])


EXPECT = {"a": "v2", "b": "w2", "c": "x1"}


def _as_map(df):
    return {r["url"]: r["payload"] for r in df.collect()}


def test_lww_latest(events_df):
    out = lww_latest(events_df, keys=("url",), order_by=("warc_ts", "seq"))
    assert _as_map(out) == EXPECT
    assert out.count() == 3


def test_lww_window_parity(events_df):
    out = lww_latest_window(events_df, keys=("url",), order_by=("warc_ts", "seq"))
    assert _as_map(out) == EXPECT


def test_lww_apply_in_pandas_parity(events_df):
    out = lww_apply_in_pandas(
        events_df, keys=("url",), order_by=("warc_ts", "seq"), n_salts=4
    )
    assert _as_map(out) == EXPECT


def test_lww_apply_in_pandas_finalize_runs_once_per_key(events_df):
    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["payload"] = pdf["payload"] + "!"
        return pdf

    out = lww_apply_in_pandas(events_df, n_salts=2, finalize=finalize)
    assert _as_map(out) == {k: v + "!" for k, v in EXPECT.items()}


def test_hot_key_skew(spark):
    # one key with 10k events, many singleton keys — salted path must agree
    hot = [(i, "hot", _ts("2024-01-01") + dt.timedelta(seconds=i % 977), f"p{i}") for i in range(10_000)]
    cold = [(100_000 + i, f"cold{i}", _ts("2024-01-01"), f"c{i}") for i in range(50)]
    df = spark.createDataFrame(hot + cold, ["seq", "url", "warc_ts", "payload"])
    fast = _as_map(lww_latest(df))
    salted = _as_map(lww_apply_in_pandas(df, n_salts=8))
    assert fast == salted
    # winner for hot: max (warc_ts, seq) → warc_ts=976s, max seq ≡ 976 mod 977
    assert fast["hot"] == salted["hot"]
