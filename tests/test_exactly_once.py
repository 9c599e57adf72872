"""Exactly-once + replay convergence (north rule: replay from any
checkpoint reconverges to the identical table state; reference
short-circuits: ingest-xml-archive.yaml:97-110,
process-and-reingest-release.yaml:28-51)."""

import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)


@pytest.fixture(scope="module")
def changelog_df(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_changelog(
        ChangelogSpec(n_events=2000, n_urls=300, n_hosts=8, seed=11, duplicate_rate=0.05)
    )
    p = str(tmp_path_factory.mktemp("cl") / "changelog.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=changelog_arrow_schema(), preserve_index=False), p
    )
    return spark.read.parquet(p)


def test_double_apply_is_noop(spark, changelog_df, tmp_table_root):
    e = CdcEngine(spark, tmp_table_root, n_buckets=8)
    b = changelog_df.filter("seq < 1000")
    s1 = e.apply_batch(b, 0, 999)
    assert s1 is not None
    h1 = e.state_hash()
    hist1 = e.table.history()
    # second apply of the identical batch: skipped entirely
    s2 = e.apply_batch(b, 0, 999)
    assert s2 is None
    assert e.state_hash() == h1
    assert e.table.history() == hist1


def test_resume_from_checkpoint(spark, changelog_df, tmp_table_root):
    e = CdcEngine(spark, tmp_table_root, n_buckets=8)
    # apply only the first half, simulating a crash after batch 1
    e.replay(changelog_df.filter("seq < 1000"), batch_size=500)
    assert e.ledger.last_applied_seq() == 999
    # a fresh engine over the same root resumes and completes
    e2 = CdcEngine(spark, tmp_table_root, n_buckets=8)
    e2.replay(changelog_df, batch_size=500)
    # reference: full replay into a clean table
    e3 = CdcEngine(spark, str(tmp_table_root) + "_ref", n_buckets=8)
    e3.replay(changelog_df, batch_size=500)
    assert e2.state_hash() == e3.state_hash()


def test_replay_from_every_checkpoint_reconverges(spark, changelog_df, tmp_path):
    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.replay(changelog_df, batch_size=500)
    want = ref.state_hash()
    # kill after k batches, then replay the WHOLE changelog from seq 0:
    # committed prefix no-ops, remainder applies
    for k in (1, 2, 3):
        e = CdcEngine(spark, str(tmp_path / f"t{k}"), n_buckets=8)
        e.replay(changelog_df.filter(f"seq < {k * 500}"), batch_size=500)
        e.replay(changelog_df, batch_size=500)
        assert e.state_hash() == want, f"diverged replaying from checkpoint {k}"


def test_duplicate_events_in_stream_are_absorbed(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = ChangelogSpec(n_events=1000, n_urls=150, seed=3, duplicate_rate=0.0)
    clean = generate_changelog(spec)
    spec_dup = ChangelogSpec(n_events=1000, n_urls=150, seed=3, duplicate_rate=0.3)
    dup = generate_changelog(spec_dup)
    paths = []
    for name, pdf in (("clean", clean), ("dup", dup)):
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=changelog_arrow_schema(), preserve_index=False),
            p,
        )
        paths.append(p)
    e1 = CdcEngine(spark, str(tmp_path / "t_clean"), n_buckets=8)
    e1.replay(spark.read.parquet(paths[0]), batch_size=400)
    e2 = CdcEngine(spark, str(tmp_path / "t_dup"), n_buckets=8)
    e2.replay(spark.read.parquet(paths[1]), batch_size=400)
    assert e1.state_hash() == e2.state_hash()


def test_crash_between_manifest_and_ledger_self_heals(
    spark, changelog_df, tmp_table_root
):
    """Reference rationale: 'might have ingested a file and then failed
    to ingest the row' (ingest-xml-archive.yaml:206-294) — our analogue
    is a crash after the manifest commit but before the ledger append.
    Re-applying must detect the existing snapshot, skip the rewrite,
    repair the ledger, and leave the state untouched."""
    import os

    eng = CdcEngine(spark, tmp_table_root, n_buckets=8)
    eng.replay(changelog_df, batch_size=1000)
    h = eng.state_hash()
    snapshots = eng.table.history()

    # simulate the crash: drop the LAST batch's ledger record
    last = eng.ledger.all_records()[-1]
    os.remove(os.path.join(eng.table.ledger_dir, f"{last['batch_id']}.json"))

    eng2 = CdcEngine(spark, tmp_table_root, n_buckets=8)
    assert eng2.ledger.last_applied_seq() < last["last_seq"]
    stats = eng2.replay(changelog_df, batch_size=1000)
    # the damaged batch is recognized from the manifest chain: no
    # re-merge, no new snapshot, ledger repaired in place
    assert stats == []
    assert eng2.state_hash() == h
    assert eng2.table.history() == snapshots
    assert eng2.ledger.is_committed(last["batch_id"])  # ledger repaired


def test_redelivery_after_snapshot_expiry_is_noop(spark, changelog_df, tmp_table_root):
    """Exactly-once must survive maintenance: after expire_snapshots
    deletes an old batch's manifest, re-delivering that batch (replay
    from 0, stream re-tail with a fresh checkpoint) must still no-op —
    the ledger record alone proves the commit."""
    from clinvar_ingest_spark.lakelet.maintenance import expire_snapshots
    from clinvar_ingest_spark.streaming.ledger import batch_id_for

    e = CdcEngine(spark, tmp_table_root, n_buckets=8)
    e.replay(changelog_df, batch_size=500)  # 4 batches
    h = e.state_hash()
    full = e.state_hash(include_tombstones=True)
    first_rec = dict(e.ledger.get(batch_id_for(0, 499)))

    expire_snapshots(e.table, keep_last=2)
    assert not e.table.has_snapshot(first_rec["snapshot_id"])  # expired

    b = changelog_df.filter("seq < 500")
    assert e.apply_batch(b, 0, 499) is None  # no re-merge
    assert e.state_hash() == h
    assert e.state_hash(include_tombstones=True) == full
    # ledger record untouched (no overwrite with a new snapshot id)
    assert e.ledger.get(batch_id_for(0, 499)) == first_rec


def test_growing_log_replay_heals_partial_tail(spark, changelog_df, tmp_path):
    """A tail batch whose id range overruns the delivered stream commits
    with partial_to = the stream's max seq; a later replay over the
    grown log must apply EXACTLY the (partial_to, last_seq] remainder —
    without the heal, the committed id would skip-and-lose it."""
    from clinvar_ingest_spark.streaming.ledger import batch_id_for

    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.replay(changelog_df, batch_size=500)
    want = ref.state_hash()
    want_full = ref.state_hash(include_tombstones=True)

    e = CdcEngine(spark, str(tmp_path / "grow"), n_buckets=8)
    # deliver 750 of 2000 events: batch [500,999] is partial through 749
    e.replay(changelog_df.filter("seq < 750"), batch_size=500)
    rec = e.ledger.get(batch_id_for(500, 999))
    assert rec is not None and rec["partial_to"] == 749
    # the resume frontier reflects the TRUE complete prefix, not the
    # nominal batch range
    assert e.ledger.last_applied_seq() == 749

    # the log grows; same grid, full replay
    e.replay(changelog_df, batch_size=500)
    assert e.state_hash() == want
    assert e.state_hash(include_tombstones=True) == want_full
    # the healed record's frontier is cleared and the remainder has its
    # own committed id
    assert e.ledger.get(batch_id_for(500, 999))["partial_to"] is None
    assert e.ledger.is_committed(batch_id_for(750, 999))
    assert e.ledger.last_applied_seq() == 1999
    # lineage() exposes the frontier column
    assert "partial_to" in e.lineage().columns


def test_growing_log_multiple_growth_steps(spark, changelog_df, tmp_path):
    """Repeated unaligned growth: each replay heals only the uncommitted
    remainder; the final state matches a single clean replay, and every
    event is applied exactly once (no double-LWW, no loss)."""
    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.replay(changelog_df, batch_size=600)
    want = ref.state_hash(include_tombstones=True)

    e = CdcEngine(spark, str(tmp_path / "grow"), n_buckets=8)
    for cut in (250, 1100, 1450, None):
        df = changelog_df if cut is None else changelog_df.filter(f"seq < {cut}")
        e.replay(df, batch_size=600)
    assert e.state_hash(include_tombstones=True) == want
    # total events across lineage equals the changelog size exactly
    total = sum(r["n_events"] for r in e.ledger.all_records())
    assert total == changelog_df.count()


def test_partial_heal_crash_between_commit_and_frontier_update(
    spark, changelog_df, tmp_path
):
    """Crash window inside the heal: the remainder batch committed but
    the original record's frontier was not advanced. The re-heal must
    no-op the remainder (its id is committed) and then advance the
    frontier — never re-merge."""
    from clinvar_ingest_spark.streaming.ledger import batch_id_for

    e = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    e.replay(changelog_df.filter("seq < 750"), batch_size=500)
    # simulate the crash: apply the remainder exactly as the heal would,
    # but skip the ledger.update
    rem = changelog_df.filter("seq >= 750 AND seq <= 999")
    assert e.apply_batch(rem, 750, 999) is not None
    h = e.state_hash(include_tombstones=True)
    hist = e.table.history()
    assert e.ledger.get(batch_id_for(500, 999))["partial_to"] == 749  # stale

    # re-run the replay over the grown log: heal path no-ops the
    # remainder, repairs the frontier, applies only genuinely-new batches
    e.replay(changelog_df.filter("seq < 1000"), batch_size=500)
    assert e.ledger.get(batch_id_for(500, 999))["partial_to"] is None
    assert e.state_hash(include_tombstones=True) == h
    assert e.table.history() == hist  # remainder was NOT re-merged


def test_partial_heal_crash_then_log_grows_past_crashed_remainder(
    spark, changelog_df, tmp_path
):
    """Crash window inside the heal AND the log grows across it: the
    committed remainder covers LESS than the re-heal's delivered stream.
    The re-heal must adopt the committed remainder's OWN frontier and
    apply the still-missing tail — stamping the fresh hi over the grid
    record would mark seq ranges complete that nobody ever applied
    (silent event loss)."""
    from clinvar_ingest_spark.streaming.ledger import batch_id_for

    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.replay(changelog_df.filter("seq < 1000"), batch_size=500)
    want = ref.state_hash(include_tombstones=True)

    e = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    e.replay(changelog_df.filter("seq < 750"), batch_size=500)
    # heal at hi=849 commits remainder id (750,999) with partial_to=849,
    # then crashes BEFORE advancing the grid record's frontier
    rem = changelog_df.filter("seq >= 750 AND seq < 850")
    assert e.apply_batch(rem, 750, 999, partial_to=849) is not None
    assert e.ledger.get(batch_id_for(750, 999))["partial_to"] == 849
    assert e.ledger.get(batch_id_for(500, 999))["partial_to"] == 749  # stale

    # the log grows to 999 and the replay re-runs: the heal must walk
    # 749 → 849 (committed remainder's frontier) → apply (850,999)
    e.replay(changelog_df.filter("seq < 1000"), batch_size=500)
    assert e.ledger.get(batch_id_for(500, 999))["partial_to"] is None
    assert e.ledger.is_committed(batch_id_for(850, 999))
    assert e.ledger.last_applied_seq() == 999
    # events 850-999 actually landed: final state == clean full replay
    assert e.state_hash(include_tombstones=True) == want

    # idempotent: one more replay over the same log changes nothing
    hist = e.table.history()
    assert e.replay(changelog_df.filter("seq < 1000"), batch_size=500) == []
    assert e.table.history() == hist
    assert e.state_hash(include_tombstones=True) == want


def test_crash_before_ledger_append_with_grown_log(spark, changelog_df, tmp_path):
    """Crash in the OTHER window — after the manifest commit, before the
    ledger append — while the log grows across it. The repair must adopt
    the frontier the crashed commit stamped into the manifest summary
    (``apply_partial_to``), NOT this replay's delivered hi, and then
    heal the missing tail in the same replay pass. Old behavior stamped
    the new hi: events (crashed_hi, new_hi] were marked complete without
    ever being merged."""
    import os

    from clinvar_ingest_spark.streaming.ledger import batch_id_for

    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.replay(changelog_df.filter("seq < 1000"), batch_size=500)
    want = ref.state_hash(include_tombstones=True)

    e = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    e.replay(changelog_df.filter("seq < 500"), batch_size=500)
    # apply [500,999] partially (through 749), then crash before the
    # ledger append: manifest head holds the batch, record missing
    assert (
        e.apply_batch(
            changelog_df.filter("seq >= 500 AND seq < 750"), 500, 999,
            partial_to=749,
        )
        is not None
    )
    gid = batch_id_for(500, 999)
    os.remove(e.ledger._path(gid))
    assert e.table.manifest().batch_id == gid  # head = the crashed commit
    assert e.table.manifest().summary["apply_partial_to"] == 749

    # the log grew to 999; replay repairs the ledger AND heals the tail
    e.replay(changelog_df.filter("seq < 1000"), batch_size=500)
    rec = e.ledger.get(gid)
    assert rec is not None and rec["partial_to"] is None
    assert e.ledger.is_committed(batch_id_for(750, 999))
    assert e.ledger.last_applied_seq() == 999
    assert e.state_hash(include_tombstones=True) == want


def test_shrunk_redelivery_is_noop(spark, changelog_df, tmp_path):
    """Redelivering LESS than previously seen (replayer restarted from an
    older segment) must not regress the frontier or re-merge anything."""
    from clinvar_ingest_spark.streaming.ledger import batch_id_for

    e = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8)
    e.replay(changelog_df.filter("seq < 750"), batch_size=500)
    h = e.state_hash(include_tombstones=True)
    hist = e.table.history()
    assert e.replay(changelog_df.filter("seq < 600"), batch_size=500) == []
    assert e.state_hash(include_tombstones=True) == h
    assert e.table.history() == hist
    assert e.ledger.get(batch_id_for(500, 999))["partial_to"] == 749
    assert e.ledger.last_applied_seq() == 749


def test_growing_log_heal_composes_with_mor(spark, changelog_df, tmp_path):
    """The heal path goes through the shared apply_batch, so it must
    compose with merge-on-read deltas: a growing log replayed through a
    MOR engine (compacted at the end) converges to the clean
    single-replay COW state."""
    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=8)
    ref.replay(changelog_df, batch_size=400)
    want = ref.state_hash(include_tombstones=True)

    e = CdcEngine(spark, str(tmp_path / "grow"), n_buckets=8, write_mode="mor")
    for cut in (600, 1100, None):
        df = changelog_df if cut is None else changelog_df.filter(f"seq < {cut}")
        e.replay(df, batch_size=400)
    e.compact()
    assert e.state_hash(include_tombstones=True) == want


def test_growing_log_heal_composes_with_patch_ops(spark, tmp_path):
    """Heal under cell-level patch ops (COW — patch_ops rejects MOR by
    design): partial-image events split across a partial commit and its
    remainder heal must resolve to the same cells as one clean replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.sources.changelog import changelog_arrow_schema

    pdf = generate_changelog(
        ChangelogSpec(n_events=1500, n_urls=200, n_hosts=8, seed=23, p_patch=0.35)
    )
    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=changelog_arrow_schema(), preserve_index=False), p
    )
    cl = spark.read.parquet(p)

    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=8, patch_ops=True)
    ref.replay(cl, batch_size=400)
    want = ref.state_hash(include_tombstones=True)

    e = CdcEngine(spark, str(tmp_path / "grow"), n_buckets=8, patch_ops=True)
    for cut in (600, 1100, None):
        df = cl if cut is None else cl.filter(f"seq < {cut}")
        e.replay(df, batch_size=400)
    assert e.state_hash(include_tombstones=True) == want


def test_lineage_dataframe(spark, changelog_df, tmp_table_root):
    eng = CdcEngine(spark, tmp_table_root, n_buckets=8)
    eng.replay(changelog_df, batch_size=1000)
    ldf = eng.lineage()
    rows = {r["batch_id"]: r for r in ldf.collect()}
    assert len(rows) == 2
    r = next(iter(rows.values()))
    for field in ("snapshot_id", "first_seq", "last_seq", "n_events",
                  "n_inserts", "watermark", "events_per_sec", "partitions_json"):
        assert field in r.asDict()
    assert sum(x["n_events"] for x in rows.values()) == changelog_df.count()
