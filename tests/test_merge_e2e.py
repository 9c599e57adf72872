"""End-to-end MERGE replay vs an independent pandas oracle.

Oracle (FIXTURES.md §4): group changelog by url, keep max (warc_ts, seq),
drop keys whose winning op is delete, text = extractor(html) — the
reference's latest-record-per-key release state
(ArchiveBranches.scala:140-156) + diff-apply semantics (diff.py:117-182).
"""

import pandas as pd
import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.functions.extract import extract_text_series
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    changelog_arrow_schema,
)


def pandas_oracle(df: pd.DataFrame) -> pd.DataFrame:
    idx = (
        df.sort_values(["warc_ts", "seq"], kind="stable")
        .groupby("url", sort=False)
        .tail(1)
    )
    live = idx[idx["op"] != "delete"].copy()
    live["text"] = extract_text_series(live["html"])
    return (
        live[["url", "warc_ts", "html", "text", "lang"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def changelog_pdf():
    return generate_changelog(
        ChangelogSpec(n_events=3000, n_urls=400, n_hosts=10, seed=7)
    )


@pytest.fixture()
def changelog_df(spark, changelog_pdf, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa

    p = str(tmp_path / "changelog.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            changelog_pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    return spark.read.parquet(p)


def _result_pdf(engine: CdcEngine) -> pd.DataFrame:
    out = engine.pages().toPandas()
    out["html"] = out["html"].map(lambda b: bytes(b) if b is not None else None)
    return out.sort_values("url").reset_index(drop=True)


def test_replay_matches_oracle(spark, changelog_df, changelog_pdf, tmp_table_root):
    engine = CdcEngine(spark, tmp_table_root, n_buckets=8)
    stats = engine.replay(changelog_df, batch_size=1000)
    assert len(stats) == 3

    got = _result_pdf(engine)
    want = pandas_oracle(changelog_pdf)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_single_batch_equals_many_batches(
    spark, changelog_df, changelog_pdf, tmp_path
):
    e1 = CdcEngine(spark, str(tmp_path / "t1"), n_buckets=8)
    e1.replay(changelog_df, batch_size=100_000)  # one batch
    e2 = CdcEngine(spark, str(tmp_path / "t2"), n_buckets=8)
    e2.replay(changelog_df, batch_size=500)  # many batches
    assert e1.state_hash() == e2.state_hash()


def test_lineage_records(spark, changelog_df, tmp_table_root):
    engine = CdcEngine(spark, tmp_table_root, n_buckets=8)
    engine.replay(changelog_df, batch_size=1000)
    recs = engine.ledger.all_records()
    assert len(recs) == 3
    for r in recs:
        assert r["n_events"] > 0
        assert r["events_per_sec"] > 0
        assert r["snapshot_id"] in engine.table.history()
        assert r["watermark"] is not None
    assert engine.ledger.last_applied_seq() >= 2999


def test_diff_between_snapshots(spark, changelog_df, changelog_pdf, tmp_table_root):
    engine = CdcEngine(spark, tmp_table_root, n_buckets=8)
    engine.replay(changelog_df, batch_size=1500)
    hist = engine.table.history()
    assert len(hist) == 3  # genesis + 2
    d = engine.diff_snapshots(hist[1], hist[2]).toPandas()

    # oracle: state after first batch vs final state
    first = pandas_oracle(changelog_pdf[changelog_pdf["seq"] < 1500])
    final = pandas_oracle(changelog_pdf)
    fk, nk = set(first["url"]), set(final["url"])
    assert set(d[d["_change"] == "created"]["url"]) == nk - fk
    assert set(d[d["_change"] == "deleted"]["url"]) == fk - nk
    both = fk & nk
    f_idx = first.set_index("url")
    n_idx = final.set_index("url")
    changed = {
        u
        for u in both
        if not f_idx.loc[u][["warc_ts", "text", "lang"]].equals(
            n_idx.loc[u][["warc_ts", "text", "lang"]]
        )
        or f_idx.loc[u]["html"] != n_idx.loc[u]["html"]
    }
    assert set(d[d["_change"] == "updated"]["url"]) == changed


def test_export_diff_ndjson(spark, changelog_df, tmp_table_root, tmp_path):
    engine = CdcEngine(spark, tmp_table_root, n_buckets=8)
    engine.replay(changelog_df, batch_size=1500)
    hist = engine.table.history()
    out = str(tmp_path / "diffout")
    msg = engine.export_diff_ndjson(hist[1], hist[2], out)
    assert set(msg["counts"]) == {"created", "updated", "deleted"}
    assert sum(msg["counts"].values()) > 0
    assert msg["files"]
