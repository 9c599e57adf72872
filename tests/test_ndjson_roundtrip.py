"""NDJSON diff export round trip: a consumer holding the OLD snapshot
can replay the exported created/updated/deleted slices and reproduce
the NEW snapshot exactly (the reference's Kafka diff-consumer contract)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)
from clinvar_ingest_spark.sources.ndjson import (
    diff_slices_to_changelog,
    read_pages_ndjson,
)


@pytest.fixture()
def changelog_df(spark, tmp_path):
    pdf = generate_changelog(ChangelogSpec(n_events=1200, n_urls=200, seed=23))
    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=changelog_arrow_schema(), preserve_index=False), p
    )
    return spark.read.parquet(p)


def test_export_read_back(spark, tmp_path, changelog_df):
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    eng.replay(changelog_df, batch_size=600)
    hist = eng.table.history()
    msg = eng.export_diff_ndjson(hist[1], hist[-1], str(tmp_path / "d"))

    created = read_pages_ndjson(spark, str(tmp_path / "d" / "change=created"))
    assert created.count() == msg["counts"]["created"]
    r = created.first()
    assert isinstance(r["html"], (bytes, bytearray))  # base64 round trip

    # the export root must be readable as ONE partitioned dataset: the
    # partition dir is `change=` (not `_change=`) because Hadoop's
    # hidden-path filter silently skips underscore-prefixed dirs
    whole = spark.read.json(str(tmp_path / "d"))
    assert whole.count() == sum(msg["counts"].values())
    assert "change" in whole.columns


def test_diff_consumer_reproduces_new_snapshot(spark, tmp_path, changelog_df):
    # producer: full history
    prod = CdcEngine(spark, str(tmp_path / "prod"), n_buckets=8)
    prod.replay(changelog_df, batch_size=600)
    old_snap, new_snap = prod.table.history()[1], prod.table.history()[-1]

    # consumer: holds only the OLD state (first batch)
    cons = CdcEngine(spark, str(tmp_path / "cons"), n_buckets=8)
    cons.replay(changelog_df.filter("seq < 600"), batch_size=600)
    assert cons.state_hash() == prod.state_hash(old_snap)

    # ship the diff as NDJSON; consumer replays it as a changelog
    prod.export_diff_ndjson(old_snap, new_snap, str(tmp_path / "wire"))
    wire = diff_slices_to_changelog(spark, str(tmp_path / "wire"), start_seq=10_000_000)
    cons.replay(wire.drop("text"), batch_size=10_000_000)

    assert cons.state_hash() == prod.state_hash(new_snap)


def test_patch_table_diff_export_interop(spark, tmp_path):
    """A PATCH-mode producer's diff export carries resolved FULL images,
    so a plain row-LWW consumer (no patch support at all) replays it and
    reproduces the producer's live state — cross-engine interop for the
    cell-LWW extension."""
    pdf = generate_changelog(
        ChangelogSpec(n_events=1200, n_urls=200, seed=31, p_patch=0.35)
    )
    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    cl = spark.read.parquet(p)

    prod = CdcEngine(spark, str(tmp_path / "prod"), n_buckets=8, patch_ops=True)
    prod.replay(cl, batch_size=600)
    old_snap, new_snap = prod.table.history()[1], prod.table.history()[-1]

    # plain consumer seeded from the OLD state via a full export
    # (created slice of genesis -> old diff covers every live row)
    genesis = prod.table.history()[0]
    prod.export_diff_ndjson(genesis, old_snap, str(tmp_path / "seed"))
    seed = diff_slices_to_changelog(
        spark, str(tmp_path / "seed"), start_seq=10_000_000
    )
    cons = CdcEngine(spark, str(tmp_path / "cons"), n_buckets=8)  # row-LWW
    cons.replay(seed.drop("text"), batch_size=10_000_000)
    assert cons.live().count() == prod.live(old_snap).count()

    # ship the patch-era diff; the consumer has no notion of patches
    prod.export_diff_ndjson(old_snap, new_snap, str(tmp_path / "wire"))
    wire = diff_slices_to_changelog(
        spark, str(tmp_path / "wire"), start_seq=20_000_000
    )
    cons.replay(wire.drop("text"), batch_size=10_000_000)

    # live states agree column-for-column (compare url/lang/props/html)
    want = {
        r["url"]: (r["lang"], r["props"], bytes(r["html"]) if r["html"] else None)
        for r in prod.live(new_snap).collect()
    }
    got = {
        r["url"]: (r["lang"], r["props"], bytes(r["html"]) if r["html"] else None)
        for r in cons.live().collect()
    }
    assert got == want


def test_date_absent_full_create_export(spark, tmp_path, changelog_df):
    """First-release (date-absent) branch: with no preceding snapshot,
    export_diff_ndjson(None, head, out) writes the WHOLE live state as
    change=created (reference date-absent.yaml:26-121, selected by
    export-diff.yaml:34-41), and a fresh consumer bootstraps from that
    one slice to the identical state."""
    prod = CdcEngine(spark, str(tmp_path / "prod"), n_buckets=8)
    prod.replay(changelog_df, batch_size=10_000_000)  # ONE snapshot
    head = prod.table.current_snapshot_id()

    msg = prod.export_diff_ndjson(None, head, str(tmp_path / "full"))
    assert msg["old_snapshot"] is None
    assert msg["counts"]["updated"] == 0 and msg["counts"]["deleted"] == 0
    assert msg["counts"]["created"] == prod.live().count()

    # a consumer holding NOTHING replays the created slice → same state
    wire = diff_slices_to_changelog(spark, str(tmp_path / "full"), start_seq=10_000_000)
    cons = CdcEngine(spark, str(tmp_path / "cons"), n_buckets=8)
    cons.replay(wire.drop("text"), batch_size=10_000_000)
    assert cons.state_hash() == prod.state_hash(head)


def test_export_diff_job_date_absent_branch(spark, tmp_path, changelog_df, monkeypatch, capsys):
    """jobs/export_diff.py --old previous on a table whose head has no
    preceding snapshot takes the full-CREATE branch (exit 0), not the
    old exit-2 error path."""
    import json as _json

    from jobs import export_diff as job

    prod = CdcEngine(spark, str(tmp_path / "prod"), n_buckets=8)
    prod.replay(changelog_df, batch_size=10_000_000)
    # the engine seeds a genesis snapshot; drive the branch where the
    # head IS the genesis-child and the genesis has been expired, and
    # the simpler explicit form --old none
    monkeypatch.setattr(
        "clinvar_ingest_spark.session.get_spark", lambda **kw: spark
    )
    rc = job.main([
        "--table", str(tmp_path / "prod"),
        "--old", "none",
        "--out", str(tmp_path / "out"),
    ])
    assert rc == 0
    msg = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert msg["counts"]["created"] == prod.live().count()
    assert msg["counts"]["deleted"] == 0 and msg["counts"]["updated"] == 0


def test_export_diff_job_expired_real_parent_errors(
    spark, tmp_path, changelog_df, monkeypatch, capsys
):
    """--old previous when the head's REAL parent was expired must stay
    a loud exit-2 error (silently exporting a full CREATE would make an
    incremental consumer re-insert its whole dataset) — while an
    expired GENESIS parent still takes the full-create branch (a diff
    against the empty genesis IS the full export)."""
    import json as _json

    from clinvar_ingest_spark.lakelet.maintenance import expire_snapshots
    from jobs import export_diff as job

    prod = CdcEngine(spark, str(tmp_path / "prod"), n_buckets=8)
    prod.replay(changelog_df, batch_size=400)  # two aligned batches
    assert len(prod.table.history()) >= 3  # genesis + 2 real snapshots
    expire_snapshots(prod.table, keep_last=1)  # drops the REAL parent

    monkeypatch.setattr(
        "clinvar_ingest_spark.session.get_spark", lambda **kw: spark
    )
    rc = job.main([
        "--table", str(tmp_path / "prod"),
        "--old", "previous",
        "--out", str(tmp_path / "out"),
    ])
    assert rc == 2
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert err["error"] == "preceding snapshot expired"
    assert err["parent_id"]

    # genesis-parent head (first real snapshot), genesis expired → the
    # date-absent full-create branch, not an error
    prod2 = CdcEngine(spark, str(tmp_path / "prod2"), n_buckets=8)
    prod2.replay(changelog_df, batch_size=10_000_000)
    expire_snapshots(prod2.table, keep_last=1)
    rc2 = job.main([
        "--table", str(tmp_path / "prod2"),
        "--old", "previous",
        "--out", str(tmp_path / "out2"),
    ])
    assert rc2 == 0
    msg = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert msg["counts"]["created"] == prod2.live().count()
    assert msg["counts"]["updated"] == 0 and msg["counts"]["deleted"] == 0
