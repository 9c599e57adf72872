"""Incremental view maintenance: the maintained view must equal a full
recompute at every snapshot, under inserts/updates/deletes, group
disappearance, lagged refreshes, idempotency, and crash self-heal."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.operators.ivm import (
    AggViewSpec,
    MaterializedAggView,
    aggregate_full,
    apply_delta,
    view_delta,
)
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)

SPEC = AggViewSpec(
    group_cols=["lang"],
    measures=[("n_pages", "count"), ("sum_seq", "sum", "_seq")],
)


@pytest.fixture(scope="module")
def changelog(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivm") / "cl.parquet")
    write_changelog_parquet(
        generate_changelog(ChangelogSpec(n_events=2500, n_urls=300, seed=11)), p
    )
    return spark.read.parquet(p)


def _recompute(eng, spec=SPEC):
    live = ~F.coalesce(F.col("_deleted"), F.lit(False))
    return aggregate_full(eng.read().filter(live), spec)


def _as_dict(df):
    return {
        tuple(r[c] for c in SPEC.group_cols): tuple(r[n] for n in SPEC.names)
        for r in df.collect()
    }


def test_view_tracks_every_snapshot(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    view = MaterializedAggView(eng, SPEC, str(tmp_path / "view"))
    for stats in eng.replay(changelog, batch_size=500):
        sid = view.refresh()
        assert sid == eng.table.current_snapshot_id()
        assert _as_dict(view.read()) == _as_dict(_recompute(eng))


def test_refresh_is_idempotent(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(changelog, batch_size=1000)
    view = MaterializedAggView(eng, SPEC, str(tmp_path / "view"))
    s1 = view.refresh()
    before = _as_dict(view.read())
    s2 = view.refresh()  # no table movement -> no-op
    assert s1 == s2 and _as_dict(view.read()) == before


def test_lagged_refresh_single_hop(spark, changelog, tmp_path):
    """A view that missed N commits refreshes in ONE delta hop."""
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    batches = [b for b in range(0, 2500, 500)]
    it = iter(eng.replay(changelog.filter("seq < 500"), batch_size=500))
    list(it)
    view = MaterializedAggView(eng, SPEC, str(tmp_path / "view"))
    view.refresh()
    # table advances 4 more commits without the view
    eng.replay(changelog.filter("seq >= 500"), batch_size=500)
    assert len(eng.table.history()) >= 5
    view.refresh()
    assert _as_dict(view.read()) == _as_dict(_recompute(eng))
    assert batches  # silence lint


def test_group_disappears_when_count_zero(spark, tmp_path):
    """Deleting every page of a lang must remove its row from the view."""
    import pandas as pd

    pdf = generate_changelog(ChangelogSpec(n_events=300, n_urls=40, seed=3))
    p = str(tmp_path / "cl.parquet")
    write_changelog_parquet(pdf, p)
    cl = spark.read.parquet(p)
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=4)
    eng.replay(cl, batch_size=300)
    view = MaterializedAggView(eng, SPEC, str(tmp_path / "view"))
    view.refresh()
    langs = {r["lang"] for r in view.read().collect()}
    victim = sorted(langs)[0]
    urls = [
        r["url"]
        for r in eng.pages().filter(F.col("lang") == victim).select("url").collect()
    ]
    assert urls
    dels = pd.DataFrame(
        {
            "seq": [1000 + i for i in range(len(urls))],
            "op": ["delete"] * len(urls),
            "url": urls,
            "warc_ts": [pd.Timestamp("2030-01-01")] * len(urls),
            "html": [None] * len(urls),
            "lang": [victim] * len(urls),
            "schema_ver": [0] * len(urls),
            "extra": [None] * len(urls),
        }
    )
    p2 = str(tmp_path / "cl2.parquet")
    write_changelog_parquet(dels, p2)
    eng.replay(spark.read.parquet(p2), batch_size=1000)
    view.refresh()
    assert victim not in {r["lang"] for r in view.read().collect()}
    assert _as_dict(view.read()) == _as_dict(_recompute(eng))


def test_delta_reads_only_changed_buckets(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    hist_stats = eng.replay(changelog, batch_size=1250)
    assert len(hist_stats) == 2
    h = eng.table.history()
    changed = eng.changed_buckets(h[-2], h[-1])
    assert changed is not None and len(changed) <= 8
    d = view_delta(eng, h[-2], h[-1], SPEC)
    # delta + view@old == recompute@new (exactness of the hop)
    live = ~F.coalesce(F.col("_deleted"), F.lit(False))
    v_old = aggregate_full(
        eng.table.read(spark, h[-2]).filter(live), SPEC
    )
    v_new = apply_delta(v_old, d, SPEC)
    want = aggregate_full(eng.table.read(spark, h[-1]).filter(live), SPEC)
    assert _as_dict(v_new) == _as_dict(want)


def test_crash_between_artifact_and_pointer_self_heals(spark, changelog, tmp_path):
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(changelog.filter("seq < 1000"), batch_size=1000)
    view = MaterializedAggView(eng, SPEC, str(tmp_path / "view"))
    view.refresh()
    eng.replay(changelog.filter("seq >= 1000"), batch_size=1500)
    sid = eng.table.current_snapshot_id()
    # simulate: artifact for the new snapshot fully written, pointer NOT
    # flipped (crash window) — re-running refresh must converge
    delta = view_delta(eng, view.current_snapshot_id(), sid, SPEC)
    nxt = apply_delta(view.read(), delta, SPEC)
    nxt.write.mode("overwrite").parquet(view._artifact_path(sid))
    assert view.current_snapshot_id() != sid  # pointer still old
    view.refresh()
    assert view.current_snapshot_id() == sid
    assert _as_dict(view.read()) == _as_dict(_recompute(eng))
    ptr = json.load(open(os.path.join(str(tmp_path / "view"), "_current.json")))
    assert ptr["snapshot_id"] == sid


# ------------------------------------------------------------- global view

GLOBAL_SPEC = AggViewSpec(
    group_cols=[],
    measures=[("n_pages", "count"), ("sum_seq", "sum", "_seq")],
)


def test_global_view_tracks_every_snapshot(spark, changelog, tmp_path):
    """group_cols=[] — one row of corpus totals, maintained == recompute
    at every hop (covers deletes shrinking the totals)."""
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    view = MaterializedAggView(eng, GLOBAL_SPEC, str(tmp_path / "gview"))
    for _ in eng.replay(changelog, batch_size=500):
        view.refresh()
        got = view.read().collect()
        live = ~F.coalesce(F.col("_deleted"), F.lit(False))
        want = aggregate_full(eng.read().filter(live), GLOBAL_SPEC).collect()
        assert len(got) == len(want) == 1
        assert tuple(got[0]) == tuple(want[0])
        assert view.current_snapshot_id() == eng.table.current_snapshot_id()


def test_global_view_lagged_single_hop(spark, changelog, tmp_path):
    """A global view that lagged many commits refreshes in ONE delta hop
    to the exact recompute."""
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    view = MaterializedAggView(eng, GLOBAL_SPEC, str(tmp_path / "gview"))
    batches = list(eng.replay(changelog.filter("seq < 500"), batch_size=500))
    view.refresh()
    eng.replay(changelog.filter("seq >= 500"), batch_size=500)  # 4 commits lag
    view.refresh()
    live = ~F.coalesce(F.col("_deleted"), F.lit(False))
    want = aggregate_full(eng.read().filter(live), GLOBAL_SPEC).collect()
    assert tuple(view.read().collect()[0]) == tuple(want[0])
