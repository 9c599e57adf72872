"""Streaming gap-based sessionization via ``applyInPandasWithState``.

The continuous form of :func:`operators.temporal.sessionize`: per-host
bursts of page-fetch activity segmented by a silence gap (crawl-side
the same shape answers politeness/burst questions; product-side it is
the classic user-session cut). State per key = the one OPEN session
(start, last, n); a session EMITS (append semantics) when

- a later event for the key arrives more than ``gap`` after it
  (closed by successor), or
- the event-time watermark passes ``session_end + gap`` (closed by
  timeout — Spark fires the group when watermark > timeout ts, and the
  early-emit branch below uses the same strict inequality).

Emission contract (what the DuckDB oracle mirrors, same discipline as
streaming/metrics.py's window rollup): over a quiesced input with final
watermark W = max(ts) − delay, the emitted set is exactly the batch
sessionization minus each key's trailing session unless
``session_end + gap < W``. Late data inside the watermark revises
nothing already emitted (only the open session can absorb rows);
older-than-watermark data is dropped by Spark upstream.

The per-group fold is fully vectorized (int64 µs diff → boundary flags
→ cumsum segments → one pandas groupby) — no per-row Python, matching
the repo's Arrow-batched kernel contract even inside the state
operator.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _emit(host: str, segs: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "host": [host] * len(segs),
            "session_start": [pd.Timestamp(s * 1000) for s, _, _ in segs],
            "session_end": [pd.Timestamp(l * 1000) for _, l, _ in segs],
            "n_events": [n for _, _, n in segs],
        }
    )


def make_session_update(gap_seconds: int):
    """Factory: the state-update fn with ``gap`` baked in (closures ship
    to executors; no global config channel in the state API)."""
    gap_us = int(gap_seconds) * 1_000_000

    def _update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(host, [(start_us, last_us, n)])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_us = (rows["warc_ts"].astype("int64") // 1000).to_numpy()
        order = ts_us.argsort(kind="stable")
        ts_us = ts_us[order]

        # vectorized segmentation: boundary where the gap is exceeded
        seg_id = pd.Series(ts_us).diff().gt(gap_us).cumsum()
        g = pd.Series(ts_us).groupby(seg_id).agg(["min", "max", "size"])
        segs = [(int(r["min"]), int(r["max"]), int(r["size"])) for _, r in g.iterrows()]

        # merge the stored open session with the first segment when the
        # gap between them doesn't close it
        if state.exists:
            start_us, last_us, n = state.get
            if segs and segs[0][0] - last_us <= gap_us:
                s0 = segs[0]
                segs[0] = (start_us, max(last_us, s0[1]), n + s0[2])
            else:
                segs.insert(0, (start_us, last_us, n))

        closed, open_ = segs[:-1], segs[-1]
        # all watermark math at ms precision — that is the store's own
        # resolution, so "closed by watermark" means ONE thing whether
        # the early branch or Spark's timeout closes it (both strict <)
        wm_ms = state.getCurrentWatermarkMs()
        close_at_ms = (open_[1] + gap_us) // 1000
        if close_at_ms < wm_ms:
            closed.append(open_)
            state.remove()
        else:
            state.update(open_)
            # never set a ts the store would reject (must exceed the
            # current watermark)
            state.setTimeoutTimestamp(max(close_at_ms, wm_ms + 1))
        if closed:
            yield _emit(host, closed)

    return _update


def streaming_sessions(
    stream: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Changelog stream → per-host closed-session feed (append mode)."""
    with_host = stream.withColumn(
        "host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    ).withWatermark("warc_ts", watermark)
    return with_host.groupBy("host").applyInPandasWithState(
        make_session_update(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_session_feed(
    spark,
    changelog_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap_seconds: int = 3600,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Tail changelog segments → session feed → parquet append sink."""
    from clinvar_ingest_spark.streaming.tail import CHANGELOG_SCHEMA

    stream = spark.readStream.schema(CHANGELOG_SCHEMA).parquet(changelog_dir)
    feed = streaming_sessions(stream, gap_seconds, watermark)
    writer = (
        feed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
