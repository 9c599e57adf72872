"""applyInPandasWithState LWW change feed: the last emission per url
across all micro-batches must equal the batch LWW state."""

import pandas as pd
import pytest

from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)
from clinvar_ingest_spark.streaming.stateful import run_lww_feed


@pytest.fixture()
def setup(tmp_path):
    pdf = generate_changelog(ChangelogSpec(n_events=1500, n_urls=250, seed=17))
    d = tmp_path / "segs"
    d.mkdir()
    per = 500
    for i in range(3):
        seg = pdf[(pdf["seq"] >= i * per) & (pdf["seq"] < (i + 1) * per)]
        write_changelog_parquet(seg, str(d / f"seg-{i:02d}.parquet"))
    return str(d), pdf


def test_lww_feed_matches_batch_state(spark, tmp_path, setup):
    segments, pdf = setup
    q = run_lww_feed(spark, segments, str(tmp_path / "ckpt"), query_name="t_feed")
    q.awaitTermination(300)
    if q.isActive:
        q.stop()

    feed = spark.sql("SELECT * FROM t_feed").toPandas()
    assert len(feed) > 0
    # last emission per url (highest seq wins across emissions)
    last = (
        feed.sort_values(["warc_ts", "seq"], kind="stable")
        .groupby("url", sort=False)
        .tail(1)
    )

    # batch oracle
    want = (
        pdf.sort_values(["warc_ts", "seq"], kind="stable")
        .groupby("url", sort=False)
        .tail(1)
    )
    want_live = want[want["op"] != "delete"]

    got_live = last[last["live"]]
    assert set(got_live["url"]) == set(want_live["url"])
    g = got_live.set_index("url")["seq"].sort_index()
    w = want_live.set_index("url")["seq"].astype("int64").sort_index()
    pd.testing.assert_series_equal(g, w, check_dtype=False)
