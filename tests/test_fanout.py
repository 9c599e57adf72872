"""Single-pass multi-entity fan-out (SURVEY.md §2.8) vs pandas oracle."""

import re

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clinvar_ingest_spark.operators.fanout import fanout, write_fanout
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)

_RE_HREF = re.compile(r'(?i)href\s*=\s*["\']([^"\'>\s]+)["\']')


@pytest.fixture(scope="module")
def changelog_pdf():
    return generate_changelog(ChangelogSpec(n_events=800, n_urls=150, seed=3))


@pytest.fixture()
def changelog_df(spark, changelog_pdf, tmp_path):
    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            changelog_pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    return spark.read.parquet(p)


def test_fanout_entities_match_oracle(spark, changelog_df, changelog_pdf):
    frames = fanout(changelog_df)
    live = changelog_pdf[changelog_pdf["html"].notna()]
    try:
        assert frames["page"].count() == len(live)
        assert frames["host"].count() == len(live)

        want_links = sum(
            len(_RE_HREF.findall(b.decode("utf-8"))) for b in live["html"]
        )
        assert frames["link"].count() == want_links

        hosts = {r["k"] for r in frames["host"].select("k").distinct().collect()}
        want_hosts = set(
            live["url"].str.extract(r"^[a-z]+://([^/]+)", expand=False)
        )
        assert hosts == want_hosts
    finally:
        frames["_tagged"].unpersist()


def test_write_fanout_tables(spark, changelog_df, tmp_path):
    counts = write_fanout(changelog_df, str(tmp_path / "out"))
    assert set(counts) == {"page", "host", "link"}
    pages = spark.read.parquet(str(tmp_path / "out" / "page"))
    assert pages.count() == counts["page"]
    assert {f.name for f in pages.schema.fields} == {"url", "warc_ts", "k", "v", "n"}
