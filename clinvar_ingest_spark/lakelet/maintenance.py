"""Table maintenance: re-bucketing and snapshot expiry.

Iceberg-parity lifecycle ops the reference delegates to TDR/BigQuery
(staging-table TTL, docker/diff/diff.py:47-48; dataset lifetime mgmt,
diff.py:41-56):

- :func:`rebucket` — rewrite the table under a new bucket count. The
  COW design keeps exactly one file per bucket (each touched bucket is
  fully replaced per commit), so classic small-file compaction never
  applies; what *does* degrade over time is bucket SIZE as the keyspace
  grows — parallelism and rewrite amplification are both bounded by
  n_buckets, so a 10^10-row table periodically doubles it. Time travel
  across the boundary works because every manifest pins its own
  n_buckets (readers and pruners consult the snapshot's value, never a
  global).
- :func:`sort_rewrite` — physically re-order rows inside each bucket
  (lexicographic or Z-order) so parquet row-group/page stats become
  tight on the sort columns: the periodic clustering pass
  (Iceberg rewrite_data_files sort/zorder; BigQuery clustered tables,
  which the reference's schema/*.table.json rely on).
- :func:`expire_snapshots` — drop manifests beyond the retention cut,
  then delete data files referenced only by expired snapshots.
  Two-phase and crash-safe: manifests go first (atomic per-file), then
  unreferenced data — a crash in between leaves harmless orphans the
  next sweep removes.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from clinvar_ingest_spark.lakelet.manifest import (
    Manifest,
    read_json,
    snapshot_id_for,
)
from clinvar_ingest_spark.lakelet.table import (
    LakeletTable,
    bucket_expr,
)


def rebucket(
    spark: SparkSession,
    table: LakeletTable,
    new_n_buckets: int,
) -> str:
    """Rewrite the full table under ``new_n_buckets`` hash buckets as a
    logically-empty commit (state hash unchanged). Returns the new
    snapshot id; idempotent by deterministic id."""
    m = table.manifest()
    if new_n_buckets == m.n_buckets:
        return m.snapshot_id
    batch_id = f"rebucket:{m.n_buckets}->{new_n_buckets}:{m.snapshot_id}"
    sid = snapshot_id_for(m.snapshot_id, batch_id, m.schema_version)
    if table._is_committed(sid):
        return sid

    cols = [c.name for c in m.columns]
    df = table.read(spark).withColumn(
        "_bucket", bucket_expr(table.key_col, new_n_buckets)
    )
    # per-writer token, exactly like commit_rewrite: manifests are
    # create-if-absent, so a crash-retry (or concurrent rebucket) must
    # never overwrite a prior attempt's promoted files — a stale orphan
    # manifest must keep referencing its OWN complete file set
    import uuid as _uuid

    token = _uuid.uuid4().hex[:8]
    staging = os.path.join(table.root, f"_staging-{sid}-{token}")
    (
        df.select("_bucket", *cols)
        .repartition(new_n_buckets, "_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(staging)
    )

    # shared promotion protocol (tokened names, footer stats) — see
    # table.promote_staged_files; a second copy of this sequence is how
    # rebucket's crash-retry overwrite bug happened
    from clinvar_ingest_spark.lakelet.table import promote_staged_files

    new_entries = promote_staged_files(
        table.root, staging, sid, token, m.schema_version,
        spec_n=new_n_buckets,
        stat_cols=m.summary.get("stats_cols") or (),
    )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)

    summary = dict(m.summary)
    summary.pop("sort_order", None)  # bucket reshuffle loses clustering
    summary["total_rows"] = sum(f.rows for f in new_entries)
    nm = Manifest(
        snapshot_id=sid,
        parent_id=m.snapshot_id,
        batch_id=batch_id,
        schema_version=m.schema_version,
        n_buckets=new_n_buckets,
        schemas=m.schemas,
        files=new_entries,
        summary=summary,
    )
    table._commit_manifest(nm, m, cleanup_paths=[f.path for f in new_entries])
    return sid


def sort_rewrite(
    spark: SparkSession,
    table: LakeletTable,
    by: list[str],
    zorder: bool = False,
    bits: int = 16,
) -> str:
    """Rewrite every bucket with rows physically ordered by ``by`` —
    plain lexicographic sort, or a Morton/Z-order interleave key over
    the columns when ``zorder=True`` (multi-dimension clustering; see
    :mod:`clinvar_ingest_spark.functions.zorder`). A logically-empty
    commit: live state, schema, and bucket layout are unchanged; only
    the physical row order inside each bucket file changes, which
    tightens parquet row-group/page statistics on the sort columns so
    scans with range predicates skip most of each file, and typically
    shrinks the files (sorted columns RLE/dict-encode better).

    At 100 TB this is the periodic clustering pass every warehouse
    format schedules (Iceberg rewrite_data_files sort/zorder, BigQuery
    clustered tables — the reference's schema/*.table.json lean on the
    latter). The sort itself is per-bucket (``sortWithinPartitions``
    after the bucket shuffle) — no global sort, no driver involvement,
    cost is one shuffle + ordered write of the touched bytes.

    Deterministic snapshot id ⇒ idempotent; crash-retry safe like every
    commit (tokened staging + CAS head). Returns the new snapshot id.
    """
    m = table.manifest()
    spec = f"{'z' if zorder and len(by) > 1 else 'lex'}:{','.join(by)}" + (
        f":bits={bits}" if zorder and len(by) > 1 else ""
    )
    # the manifest summary carries the layout claim (Iceberg's "table
    # sort order"); data commits CLEAR it (commit_rewrite/rebucket), so
    # a matching claim means the current files are already in this
    # order and the rewrite is a no-op — this is what makes repeated
    # maintenance runs idempotent
    if m.summary.get("sort_order") == spec:
        return m.snapshot_id
    batch_id = f"sort_rewrite:{spec}:{m.snapshot_id}"
    sid = snapshot_id_for(m.snapshot_id, batch_id, m.schema_version)
    if table._is_committed_child(sid, m):
        return sid

    df = table.read(spark).withColumn(
        "_bucket", bucket_expr(table.key_col, m.n_buckets)
    )
    if zorder and len(by) > 1:
        from clinvar_ingest_spark.functions.zorder import zorder_key

        sort_cols = [zorder_key(df, by, bits=bits)]
    else:
        sort_cols = [F.col(c) for c in by]

    ordered = (
        df.repartition(m.n_buckets, "_bucket")
        .sortWithinPartitions(F.col("_bucket"), *sort_cols)
    )
    return table.commit_rewrite(
        spark,
        ordered,
        # closure maps legacy-spec file buckets to every current bucket
        # they span (identity pre-grow) — a sorted rewrite also migrates
        # any remaining legacy-spec files to the current spec
        touched_buckets=table.rewrite_closure(
            {f.bucket for f in m.files}
        ),
        batch_id=batch_id,
        summary={"sort_order": spec},
        pre_partitioned=True,
        expected_parent_id=m.snapshot_id,
    )


def rewrite_small_files(
    spark: SparkSession,
    table: LakeletTable,
    min_files: int = 2,
) -> str:
    """Bin-pack maintenance pass (Iceberg ``rewrite_data_files``
    bin-pack strategy): COW-rewrite every bucket fragmented into
    ``min_files`` or more base files — accumulated from
    ``max_records_per_file`` splits, multi-task writes, or repeated
    partial compactions — back to the table's current file-size policy
    (one file per bucket unless ``max_records_per_file`` splits it).

    A logically-empty commit: live state, schema, and bucket layout are
    unchanged (state-hash invariant); only file granularity changes.
    Buckets already at a single base file — and any bucket carrying MOR
    deltas (fold those with ``CdcEngine.compact`` first; folding is a
    semantic rewrite, bin-packing is layout-only) — are left alone.
    Legacy-spec files are migrated by the same closure rule as every
    rewrite. Idempotent by deterministic snapshot id; returns the new
    id (current id when nothing is fragmented).
    """
    from pyspark.sql import functions as F  # noqa: F401  (parity w/ peers)

    m = table.manifest()
    per_bucket: dict[int, int] = {}
    # delta coverage in CURRENT-spec space: a pre-grow delta at legacy
    # bucket b covers every current bucket ≡ b (mod spec_n); raw-id
    # matching would let this layout-only pass rewrite (= semantically
    # FOLD) delta stacks it documents itself as leaving alone
    delta_cover: set[int] = set()
    for f in m.files:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        if f.kind == "delta":
            s = f.spec_n or m.n_buckets
            if s == m.n_buckets:
                delta_cover.add(f.bucket)
            else:
                delta_cover.update(
                    b for b in range(m.n_buckets) if b % s == f.bucket
                )
    frag = [
        b
        for b, n in per_bucket.items()
        if n >= min_files and b not in delta_cover
        # the closure rule migrates legacy files whole: skip any bucket
        # whose rewrite would drag a delta-covered bucket along
        and not (set(table.rewrite_closure([b])) & delta_cover)
    ]
    if not frag:
        return m.snapshot_id
    touched = table.rewrite_closure(frag)
    batch_id = f"binpack:{min_files}:{m.snapshot_id}"
    sid = snapshot_id_for(m.snapshot_id, batch_id, m.schema_version)
    if table._is_committed_child(sid, m):
        return sid
    rows = table.read(spark, buckets=touched).withColumn(
        "_bucket", bucket_expr(table.key_col, m.n_buckets)
    )
    return table.commit_rewrite(
        spark, rows, touched, batch_id=batch_id,
        expected_parent_id=m.snapshot_id,
    )


def purge_tombstones(
    spark: SparkSession,
    table: LakeletTable,
    older_than: str,
) -> str:
    """Drop soft-delete tombstone rows whose ``warc_ts`` is older than
    ``older_than`` (ISO timestamp) — a logically-empty commit (the live
    state is unchanged; only the delete frontier is compacted).

    Safe once no event older than ``older_than`` can still arrive (the
    stream's lateness bound / the ledger watermark): a tombstone's only
    job is to out-LWW late re-deliveries of its key. COW rewrites only
    the buckets that actually hold old tombstones. Returns the new
    snapshot id (current id if nothing to purge). Idempotent by
    deterministic snapshot id.
    """
    from pyspark.sql import functions as F

    m = table.manifest()
    is_old_tomb = (
        F.coalesce(F.col("_deleted"), F.lit(False))
        # null-safe: a NULL-warc_ts tombstone has UNKNOWN age — it must
        # be conservatively kept. A bare `<` yields SQL NULL there, and
        # the kept-rows filter(~NULL) below would silently PURGE it,
        # letting a late redelivery of the deleted key resurrect
        & F.coalesce(
            F.col("warc_ts") < F.lit(older_than).cast("timestamp"),
            F.lit(False),
        )
    )
    # the detection scan prunes at the MANIFEST level: files whose
    # footer-stat warc_ts range starts after the cutoff can't hold an
    # old tombstone and are never handed to Spark
    touched = table.touched_buckets(
        table.read(spark, ts_not_after=older_than)
        .filter(is_old_tomb)
        .select(table.key_col)
    )
    if not touched:
        return m.snapshot_id
    # spec evolution: rewrite whole legacy files (identity pre-grow)
    touched = table.rewrite_closure(touched)
    batch_id = f"purge_tombstones:{older_than}:{m.snapshot_id}"
    kept = (
        table.read(spark, buckets=touched)
        .filter(~is_old_tomb)
        .withColumn("_bucket", bucket_expr(table.key_col, m.n_buckets))
    )
    return table.commit_rewrite(
        spark, kept, touched, batch_id=batch_id,
        expected_parent_id=m.snapshot_id,
    )


def expire_snapshots(
    table: LakeletTable,
    keep_last: int = 3,
    also_keep: set[str] | frozenset[str] = frozenset(),
    in_flight_grace_secs: float = 0.0,
    older_than_secs: float | None = None,
) -> dict:
    """Expire all but the last ``keep_last`` snapshots of the current
    chain, then garbage-collect data files no surviving manifest
    references. ``also_keep`` pins additional snapshot ids regardless
    of age — release manifests pass the ids they reference so a
    release-pinned cut can never be GC'd out from under an AS-OF
    reader (use :func:`clinvar_ingest_spark.lakelet.release
    .expire_releases` for the release-aware sweep).

    ``older_than_secs``: Iceberg's retention-by-age form — only
    snapshots whose ``committed_at`` is older than now − this many
    seconds are expirable (on top of keep_last/pins; a snapshot
    without a stamp — genesis — is conservatively KEPT). Both
    retention rules must agree before anything expires.

    ``in_flight_grace_secs``: with OPTIMISTIC multi-writer commits a
    concurrent writer may have written its manifest (or promoted data
    files) but not yet won its head CAS — such artifacts are off the
    committed chain and would look expirable. Anything younger than
    the grace window is left alone (manifest AND data file mtimes), so
    set it above your longest commit duration when expiry can run
    concurrently with writers; 0 (default) preserves exact single-
    writer semantics. Unattended entry points (jobs/maintain.py,
    jobs/fanout_release.py) default it to 600 s.
    Returns {'expired': [...], 'deleted_files': n}."""
    import time as _time

    if table.branch is not None:
        # retention (chain[-keep_last:]) and the head-pointer GC below
        # are MAIN-chain-scoped; run from a branch view, 'the chain'
        # would be the branch's, every post-fork main snapshot would be
        # unpinned, and phase 2 would delete main's data files — GC of
        # the wrong chain. Branch heads are pinned automatically when
        # expiry runs on the main table; drop_branch() unpins.
        raise ValueError(
            f"expire_snapshots must run on the MAIN table, not branch "
            f"{table.branch!r} (use LakeletTable.load(root))"
        )

    now = _time.time()

    def _in_grace(path: str) -> bool:
        if in_flight_grace_secs <= 0:
            return False
        try:
            return now - os.path.getmtime(path) < in_flight_grace_secs
        except FileNotFoundError:
            return False

    chain = table.history()  # oldest readable .. current
    keep = set(chain[-keep_last:]) if keep_last > 0 else {chain[-1]}
    keep |= set(also_keep)
    # pin every branch head and tag target: a branch stays readable and
    # committable (its head manifest is the parent of its next commit)
    # and a tagged snapshot stays readable, no matter how far the main
    # chain advances. Dropping the branch / deleting the tag unpins.
    from clinvar_ingest_spark.lakelet.manifest import latest_pointer

    for b in table.branches():
        h = latest_pointer(os.path.join(table._branches_dir(), b))
        if h is not None:
            keep.add(h[1]["snapshot_id"])
    keep |= set(table.tags().values())

    expired = []
    for p in glob.glob(os.path.join(table.manifest_dir, "*.json")):
        name = os.path.basename(p)
        # skip _current/_expired markers and the head-chain CAS pointers
        if name.startswith("_") or name.startswith("head-"):
            continue
        sid = name[:-5]
        if sid in keep or _in_grace(p):
            continue
        if older_than_secs is not None:
            at = read_json(p).get("summary", {}).get("committed_at")
            # conservative retention: an unstamped manifest (genesis,
            # pre-stamp era) is KEPT — age-based GC must never guess old
            if at is None or now - at < older_than_secs:
                continue
        expired.append(sid)

    # phase 0: record the expired ids (audit trail; lets operators
    # distinguish "snapshot expired" from "snapshot never existed")
    if expired:
        from clinvar_ingest_spark.lakelet.manifest import atomic_write_json

        tomb_path = os.path.join(table.manifest_dir, "_expired.json")
        prior: list[str] = []
        if os.path.exists(tomb_path):
            prior = read_json(tomb_path).get("expired", [])
        atomic_write_json(tomb_path, {"expired": sorted(set(prior) | set(expired))})

    # phase 1: remove expired manifests (each removal atomic), plus the
    # head-chain pointers that reference them (NEVER the latest head —
    # it anchors current_snapshot_id). Expired-head GC keeps the
    # manifest-dir listing bounded over the table's lifetime.
    # every unlink tolerates already-gone files: a CAS-losing writer's
    # conflict cleanup may delete the same orphans concurrently
    import contextlib

    expired_set = set(expired)
    for sid in expired:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(os.path.join(table.manifest_dir, f"{sid}.json"))
    latest = table._latest_head()
    for p in glob.glob(os.path.join(table.manifest_dir, "head-*.json")):
        try:
            ptr = read_json(p)
        except Exception:
            continue
        if (
            ptr.get("snapshot_id") in expired_set
            and latest is not None
            and ptr.get("commit_seq") != latest[0]
        ):
            with contextlib.suppress(FileNotFoundError):
                os.unlink(p)

    # phase 2: delete data files referenced by NO surviving manifest.
    # Surviving segmented manifests also pin their file-list SEGMENTS
    # (content-addressed, shared across snapshots — a segment is live
    # while any surviving manifest refs it).
    live_files: set[str] = set()
    live_segs: set[str] = set()
    for p in glob.glob(os.path.join(table.manifest_dir, "*.json")):
        name = os.path.basename(p)
        if name.startswith("_") or name.startswith("head-"):
            continue
        man = Manifest.from_json(read_json(p), seg_dir=table._seg_dir())
        if man.segments is not None:
            live_segs.update(s.ref for s in man.segments)
        live_files.update(f.path for f in man.files)

    deleted = 0
    for p in glob.glob(os.path.join(table.data_dir, "*.parquet")):
        rel = os.path.relpath(p, table.root)
        # grace also protects freshly-promoted files whose writer
        # hasn't written its manifest yet (mid-commit)
        if rel not in live_files and not _in_grace(p):
            try:
                os.unlink(p)
                deleted += 1
            except FileNotFoundError:
                pass  # a conflict-cleanup deleted it first

    # phase 3: sweep orphan file-list segments — exclusive segments of
    # expired snapshots and CAS-losing writers' rewrites (conflict
    # cleanup deliberately leaves segments alone: content-addressing
    # means a loser's segment can be byte-identical to a live one, so
    # only this global refcount-by-sweep may delete them). Grace
    # protects segments written by an in-flight commit whose manifest
    # isn't on disk yet.
    deleted_segs = 0
    for p in glob.glob(os.path.join(table._seg_dir(), "seg-*.json")):
        ref = os.path.basename(p)[4:-5]
        if ref not in live_segs and not _in_grace(p):
            try:
                os.unlink(p)
                deleted_segs += 1
            except FileNotFoundError:
                pass

    return {
        "expired": sorted(expired),
        "deleted_files": deleted,
        "deleted_segments": deleted_segs,
    }


# ------------------------------------------------------------------ clone


def clone_table(
    src,
    dest_root: str,
    snapshot_id: str | None = None,
    deep: bool = False,
):
    """Metadata-only table clone — Delta ``SHALLOW CLONE`` / Iceberg
    snapshot-table analogue. Creates a NEW table root whose genesis
    manifest references the source snapshot's data files in place
    (absolute paths; reads resolve them because ``os.path.join(root,
    abs)`` is ``abs``). O(metadata) regardless of table size: cloning
    a 100 TB table writes one manifest.

    Divergence is copy-on-write: the first commit on the clone rewrites
    only its touched buckets into the clone's own ``data/`` (relative
    paths), and every deletion path in this format constructs
    candidates from the table's OWN root (GC globs its own data_dir;
    conflict cleanup unlinks writer-staged relative paths), so a clone
    can never delete source-owned bytes.

    Caveat (same as Delta shallow clones): ``expire_snapshots`` on the
    SOURCE may delete files a shallow clone still references — shallow
    clones are for short-lived experiments/branch-offs; pass
    ``deep=True`` (copies the files) for an owning clone, or pin the
    source snapshot with ``create_tag``.

    The clone starts a fresh head chain (commit_seq 0), drops
    source-lineage summary keys (watermarks naming source snapshot ids),
    and keeps schema history / stats declarations / sort-order claims —
    time travel on the clone begins at the clone point, mirroring
    Iceberg's snapshot-table semantics.
    """
    import dataclasses
    import shutil

    from clinvar_ingest_spark.lakelet.table import LakeletTable

    src_sid = (
        src.resolve_ref(snapshot_id) if snapshot_id else src.current_snapshot_id()
    )
    m = src.manifest(src_sid)
    dest = LakeletTable(dest_root)
    if os.path.exists(dest._current_path()):
        raise FileExistsError(f"lakelet table already exists at {dest_root}")
    os.makedirs(dest.manifest_dir, exist_ok=True)
    os.makedirs(dest.data_dir, exist_ok=True)

    new_files = []
    for i, f in enumerate(m.files):
        src_path = os.path.abspath(os.path.join(src.root, f.path))
        if deep:
            # a shallow-clone source stores absolute f.path — joining
            # it onto dest.root would resolve back to the SOURCE file
            # (copyfile(src, src) → SameFileError, and the deep clone
            # would not own its bytes). Rewrite absolute entries to a
            # dest-relative data/ path before copying.
            rel = (
                os.path.join("data", f"clone-{i:06d}-{os.path.basename(f.path)}")
                if os.path.isabs(f.path)
                else f.path
            )
            dst_path = os.path.join(dest.root, rel)
            os.makedirs(os.path.dirname(dst_path), exist_ok=True)
            shutil.copyfile(src_path, dst_path)
            new_files.append(dataclasses.replace(f, path=rel))
        else:
            new_files.append(dataclasses.replace(f, path=src_path))

    batch_id = f"clone-{src_sid}"
    sid = snapshot_id_for(None, batch_id, m.schema_version)
    # lineage-bound summary keys point at SOURCE snapshot ids — they
    # must not survive into a table whose history starts here
    drop_keys = {"commit_seq", "committed_at"}
    summary = {
        k: v
        for k, v in m.summary.items()
        if k not in drop_keys and not k.startswith("indexed_")
    }
    summary["commit_seq"] = 0
    summary["cloned_from"] = os.path.abspath(src.root)
    summary["source_snapshot"] = src_sid
    summary["clone_mode"] = "deep" if deep else "shallow"
    nm = Manifest(
        snapshot_id=sid,
        parent_id=None,
        batch_id=batch_id,
        schema_version=m.schema_version,
        n_buckets=m.n_buckets,
        schemas=m.schemas,
        files=new_files,  # inline (v1) manifest; segments on next commit
        summary=summary,
    )
    dest._write_manifest(nm)
    try:
        dest._link_head(0, sid)
    except FileExistsError:
        pass  # concurrent clone to the same root: identical genesis
    dest._set_current(sid)
    return dest


@dataclass
class MaintenancePolicy:
    """Thresholds for :func:`auto_maintain` — the unattended
    "auto-optimize" loop every managed lakehouse runs (Delta's
    auto-compaction, Iceberg's maintenance actions, as one policy
    object). ``None`` disables an action."""

    #: fold MOR delta stacks when this many buckets carry deltas
    compact_delta_buckets: int | None = 1
    #: bin-pack buckets fragmented into >= this many base files
    binpack_min_files: int | None = 4
    #: keep at most this many snapshots (age guard via expire_grace)
    expire_keep_last: int | None = 8
    #: only expire snapshots older than this many seconds
    expire_older_than_secs: float | None = 3600.0
    #: concurrent-writer grace window passed to expire_snapshots
    in_flight_grace_secs: float = 600.0
    #: purge tombstones whose LWW position is older than this ISO ts
    #: (None = never — set it to your stream's lateness bound)
    purge_tombstones_before: str | None = None


def auto_maintain(
    spark: SparkSession,
    table: LakeletTable,
    policy: MaintenancePolicy | None = None,
    engine=None,
) -> dict:
    """One policy-driven maintenance pass; returns what ran.

    Order matters and is fixed: (1) fold deltas (semantic rewrite —
    must precede layout work, bin-pack skips delta-covered buckets),
    (2) purge aged tombstones, (3) bin-pack fragmented buckets,
    (4) expire old snapshots + GC. Every action is the existing
    idempotent primitive, so the whole pass is crash-safe and
    re-runnable; live state is unchanged by construction (the
    state-hash invariant each primitive already tests). Actions whose
    threshold is not met are skipped — an empty dict means the table
    needed nothing.

    ``engine``: pass the owning :class:`CdcEngine` to use its
    conflict-retrying ``compact()``; otherwise delta folding is
    skipped (the fold needs the engine's merge kernels).

    At 10^10 rows the decision inputs are manifest METADATA only
    (file counts per bucket, delta flags, snapshot stamps) — deciding
    costs no data I/O; only the chosen actions touch data, each
    pruned to its own buckets.
    """
    pol = policy or MaintenancePolicy()
    did: dict = {}
    m = table.manifest()

    if (
        pol.compact_delta_buckets is not None
        and engine is not None
        and len(table.delta_buckets()) >= pol.compact_delta_buckets
    ):
        sid = engine.compact()
        if sid:
            did["compact"] = sid

    if pol.purge_tombstones_before is not None:
        before = table.current_snapshot_id()
        sid = purge_tombstones(spark, table, pol.purge_tombstones_before)
        if sid != before:
            did["purge_tombstones"] = sid

    if pol.binpack_min_files is not None:
        before = table.current_snapshot_id()
        sid = rewrite_small_files(spark, table, pol.binpack_min_files)
        if sid != before:
            did["binpack"] = sid

    if pol.expire_keep_last is not None:
        res = expire_snapshots(
            table,
            keep_last=pol.expire_keep_last,
            older_than_secs=pol.expire_older_than_secs,
            in_flight_grace_secs=pol.in_flight_grace_secs,
        )
        if res.get("expired"):
            did["expire"] = {
                "expired": len(res["expired"]),
                "deleted_files": res.get("deleted_files", 0),
            }

    return did
