"""Single-pass multi-entity fan-out (SURVEY.md §2.8) vs pandas oracle."""

import re

import pandas as pd
import pyarrow as pa
from pyspark.sql import functions as F
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
    from clinvar_ingest_spark.operators.fanout import ENTITY_TYPES

    counts = write_fanout(changelog_df, str(tmp_path / "out"))
    assert set(counts) == set(ENTITY_TYPES)
    pages = spark.read.parquet(str(tmp_path / "out" / "page"))
    assert pages.count() == counts["page"]
    assert {f.name for f in pages.schema.fields} == {
        "url", "warc_ts", "seq", "k", "v", "n",
    }
    # the generated html template carries title/h1/anchors/scripts but no <img>
    assert counts["title"] == counts["page"] == counts["script"] == counts["meta_lang"]
    assert counts["heading"] > 0 and counts["anchor"] >= counts["link"] > 0
    assert counts["image"] == 0
    # 15-stream parity additions: 1 <style>, 1 comment, 1 <div>, 1 ?query
    # per page; 2 <p> blocks and 2 absolute hrefs per page
    assert (
        counts["style"] == counts["comment"] == counts["division"]
        == counts["query_param"] == counts["page"]
    )
    assert counts["paragraph"] == counts["external_link"] == counts["link"]


def test_fanout_dedup_streams(spark, changelog_df, changelog_pdf):
    """Reference parity (ArchiveBranchesSpec.scala:50-228): dedup'd
    streams keep entities from each key's LATEST non-deleted event only."""
    frames = fanout(changelog_df, dedup=True)
    try:
        winners = (
            changelog_pdf.sort_values(["warc_ts", "seq"])
            .groupby("url")
            .tail(1)
        )
        winners = winners[winners["op"] != "delete"]
        assert frames["page"].count() == len(winners)
        # one row per live url; the row's warc_ts is the winner's
        got = {r["url"]: r["warc_ts"] for r in frames["page"].collect()}
        want = dict(zip(winners["url"], winners["warc_ts"]))
        assert got == want
    finally:
        frames["_tagged"].unpersist()


def test_fanout_archive_per_stream_mix(spark, changelog_df, changelog_pdf):
    """Reference parity (ArchiveBranches.scala:115-137 +
    ArchiveBranchesSpec.scala): 15 streams from one parse with the
    reference's exact treatment mix — 4 dedupByDate streams keep the
    latest row per entity id, host aggregates latest-scalars + the
    sorted url-set union (aggregateSubmitters shape), and the other 10
    pass through one row per emission of EVERY non-delete event."""
    from clinvar_ingest_spark.operators.fanout import (
        ENTITY_TYPES,
        fanout_archive,
    )

    frames = fanout_archive(changelog_df)
    live = changelog_pdf[changelog_pdf["op"] != "delete"]
    live = live[live["html"].notna()]
    try:
        assert set(frames) == set(ENTITY_TYPES) | {"_tagged"}
        assert len(ENTITY_TYPES) == 15  # reference table-count parity

        # passthrough: one row per match of every live event
        assert frames["heading"].count() == len(live)  # 1 <h1> per page
        want_links = sum(
            len(_RE_HREF.findall(b.decode("utf-8"))) for b in live["html"]
        )
        assert frames["anchor"].count() == want_links
        assert frames["paragraph"].count() == 2 * len(live)

        # dedupByDate keyed by the entity's own id: link = one row per
        # distinct href, carrying the href's LATEST (warc_ts, seq)
        exploded = []
        for _, r in live.iterrows():
            for href in _RE_HREF.findall(r["html"].decode("utf-8")):
                exploded.append((href, r["warc_ts"], r["seq"]))
        want = {}
        for href, ts, seq in exploded:
            if href not in want or (ts, seq) > want[href]:
                want[href] = (ts, seq)
        got = {
            r["k"]: (r["warc_ts"], r["seq"]) for r in frames["link"].collect()
        }
        assert got == want

        # page dedup keyed by url: latest non-delete event per url
        winners = (
            live.sort_values(["warc_ts", "seq"]).groupby("url").tail(1)
        )
        got_pages = {
            r["url"]: (r["warc_ts"], r["k"]) for r in frames["page"].collect()
        }
        want_pages = dict(
            zip(winners["url"], zip(winners["warc_ts"], winners["lang"]))
        )
        assert got_pages == want_pages

        # host aggregation: latest scalars + sorted set-union of urls
        hosts = live.assign(
            host=live["url"].str.extract(r"^[a-z]+://([^/]+)", expand=False)
        )
        row = frames["host"].orderBy("k").first()
        grp = hosts[hosts["host"] == row["k"]]
        latest = grp.sort_values(["warc_ts", "seq"]).iloc[-1]
        assert row["url"] == latest["url"]
        assert row["warc_ts"] == latest["warc_ts"]
        assert row["v"] == ",".join(sorted(set(grp["url"])))
        assert row["n"] == len(grp)
    finally:
        frames["_tagged"].unpersist()


def test_dedup_by_date_null_ts_deterministic(spark):
    """Reference branch parity (ArchiveBranches.scala:146-152: a group
    with NO dated element still keeps exactly one): NULL warc_ts sorts
    lowest, and an all-NULL group resolves deterministically by seq."""
    import datetime

    from clinvar_ingest_spark.operators.fanout import dedup_by_date

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        # id "a": dated beats undated regardless of seq
        ("u1", None, 9, "a", None, 1),
        ("u2", ts, 1, "a", None, 1),
        # id "b": all undated → highest seq wins (deterministic pick)
        ("u3", None, 3, "b", None, 1),
        ("u4", None, 7, "b", None, 1),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, k string, v string, n long"
    )
    got = {r["k"]: (r["url"], r["warc_ts"], r["seq"]) for r in dedup_by_date(df, "k").collect()}
    assert got == {"a": ("u2", ts, 1), "b": ("u4", None, 7)}


def test_fanout_treatment_plan_shapes(spark, changelog_df):
    """Scale contract: host aggregation AND dedupByDate are each ONE
    Exchange with a partial (map-side) aggregate before it — the
    shuffle carries one candidate row per (partition, id), never one
    per event."""
    from clinvar_ingest_spark.operators.fanout import (
        aggregate_hosts,
        dedup_by_date,
        parse_entities,
    )

    tagged = parse_entities(changelog_df.filter("op <> 'delete'"))
    host_plan = (
        aggregate_hosts(tagged.filter("entity_type = 'host'").drop("entity_type"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert host_plan.count("Exchange") == 1
    assert "partial_max_by" in host_plan and "partial_collect_set" in host_plan
    assert host_plan.index("partial_max_by") > host_plan.index("Exchange")
    # (executedPlan prints top-down: partial agg appears BELOW/after
    # the Exchange line in the string, i.e. runs before the shuffle)

    link_plan = (
        dedup_by_date(tagged.filter("entity_type = 'link'").drop("entity_type"), "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert link_plan.count("Exchange") == 1
    assert "partial_max_by" in link_plan  # lww_latest delegation


def test_write_fanout_lakelet_versioned_tables(spark, changelog_df, tmp_path):
    """Reference sink-model parity: every entity lands in its own
    VERSIONED snapshot table; a second batch commits a new version and
    the first stays time-travelable; re-running a batch is a no-op
    (idempotent by deterministic snapshot id)."""
    from clinvar_ingest_spark.lakelet.table import LakeletTable
    from clinvar_ingest_spark.operators.fanout import write_fanout_lakelet

    root = str(tmp_path / "entities")
    first = changelog_df.filter("seq < 400")
    s1 = write_fanout_lakelet(first, root, batch_id="b1", entity_types=("page", "link"))
    s2 = write_fanout_lakelet(
        changelog_df, root, batch_id="b2", entity_types=("page", "link")
    )
    t = LakeletTable.load(root + "/page")
    assert t.history()[-2:] == [s1["page"], s2["page"]]
    n_old = t.read(spark, snapshot_id=s1["page"]).count()
    n_new = t.read(spark).count()
    assert 0 < n_old <= n_new  # time travel to the first version
    # idempotent re-commit of the same batch: same snapshot, no growth
    s2b = write_fanout_lakelet(
        changelog_df, root, batch_id="b2", entity_types=("page", "link")
    )
    assert s2b["page"] == s2["page"]
    assert len(t.history()) == len(LakeletTable.load(root + "/page").history())
    # key = url ␟ k composite
    row = t.read(spark).first()
    assert row["ek"].startswith(row["url"])


def test_resolve_link_targets_cross_entity_fixup(spark, changelog_df):
    """Reference parity (VCV.scala:167-174): links resolve against the
    sibling page stream; self-links (href = url + query suffix)
    normalize to internal, the index.example.org links stay external."""
    from clinvar_ingest_spark.operators.fanout import fanout, resolve_link_targets

    frames = fanout(changelog_df, dedup=True)
    try:
        resolved = resolve_link_targets(frames["_tagged"])
        by_kind = {
            r["target_kind"]: r["cnt"]
            for r in resolved.groupBy("target_kind").agg(F.count("*").alias("cnt")).collect()
        }
        n_pages = frames["page"].count()
        # every page links to itself (?ref=self) → internal after
        # normalization; and to the external index
        assert by_kind["internal"] == n_pages
        assert by_kind["external"] == n_pages
        # internal targets carry the page id (md5 of the target url)
        row = resolved.filter("target_kind = 'internal'").first()
        import hashlib

        assert row["target_page_id"] == hashlib.md5(
            row["_norm_href"].encode()
        ).hexdigest()
    finally:
        frames["_tagged"].unpersist()
