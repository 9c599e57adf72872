"""LakeletTable — copy-on-write snapshot table over Parquet + manifests.

Layout under ``root/``::

    data/b{bucket:05d}-{snapshot_id}-{n}.parquet   immutable data files
    manifests/{snapshot_id}.json                   immutable snapshots
    manifests/_current.json                        atomic pointer
    ledger/{batch_id}.json                         offsets/lineage ledger

Copy-on-write at **bucket granularity**: a MERGE rewrites only the data
files of buckets containing touched keys and carries every other file
entry forward unchanged — the reference's soft-delete+append row upsert
(reference: orchestration/templates/process-and-reingest-release.yaml:226-280)
re-expressed as file-level COW, which is what survives 100 TB (rewriting
1/4096th of the table per batch instead of row-level mutation RPCs).

Reads are manifest-planned: the caller gets exactly the files for the
requested snapshot (time travel) and optionally only the requested
buckets (partition pruning for MERGE's "read only touched buckets").
Bucket = ``pmod(xxhash64(url), n_buckets)`` computed *in Spark*, so the
same expression serves writing, pruning, and join co-location.

Schema evolution (SURVEY.md M5): add / rename / widen are metadata-only
commits. Files remember the schema_version they were written under;
reads build a per-version name-mapping (col_id based) + widen casts and
``unionByName`` the groups. Old snapshots stay readable forever —
the reference achieves drift-insulation by spilling unknowns into a
``content`` JSON column (reference: README.md:24-28); we keep that idea
as an optional ``props`` column *and* add real evolution.
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinvar_ingest_spark.lakelet.manifest import (
    ColumnSpec,
    FileEntry,
    Manifest,
    atomic_write_json,
    read_json,
    snapshot_id_for,
)

#: Default schema of the `pages` table (BASELINE.json input_hint) plus
#: lineage columns: `_seq` (LWW tie-break, FIXTURES.md §2) and `_deleted`
#: (soft-delete tombstone) — both kept in-table so late events can be
#: LWW-compared against the current state *including deletions*. Without
#: tombstones, a late event delivered after a cross-batch delete would
#: resurrect the key (the delete's newer (warc_ts, seq) would be gone);
#: with them, the final live state is exactly the global LWW winner per
#: url excluding delete-winners — the reference's soft-delete row model
#: (reference: process-and-reingest-release.yaml:226-252) kept queryable.
PAGES_COLUMNS = [
    ColumnSpec(1, "url", "string"),
    ColumnSpec(2, "warc_ts", "timestamp"),
    ColumnSpec(3, "html", "binary"),
    ColumnSpec(4, "text", "string"),
    ColumnSpec(5, "lang", "string"),
    ColumnSpec(6, "_seq", "long"),
    ColumnSpec(7, "_deleted", "boolean"),
    #: canonical-JSON residue of unmodeled changelog fields (the
    #: reference's `content` spill column, README.md:24-28 /
    #: Content.scala:16-22) — schema drift upstream lands here instead
    #: of being silently dropped
    ColumnSpec(8, "props", "string"),
]

_SPARK_TYPES = {
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "boolean": T.BooleanType(),
}

# legal widenings (Iceberg-compatible): int→long, float→double
_WIDEN_OK = {("int", "long"), ("float", "double"), ("int", "double")}


class CommitConflictError(RuntimeError):
    """Another writer committed first (optimistic concurrency). The
    caller must re-read the table state, re-plan its merge against the
    new current snapshot, and retry — the engine's ``apply_batch`` does
    exactly that."""


def spark_schema(columns: Sequence[ColumnSpec]) -> T.StructType:
    return T.StructType([T.StructField(c.name, _SPARK_TYPES[c.type], True) for c in columns])


def bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


class LakeletTable:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "manifests")
        self.data_dir = os.path.join(root, "data")
        self.ledger_dir = os.path.join(root, "ledger")

    # ------------------------------------------------------------------ setup

    @classmethod
    def create(
        cls,
        root: str,
        columns: Sequence[ColumnSpec] | None = None,
        n_buckets: int = 16,
        key_col: str = "url",
    ) -> "LakeletTable":
        t = cls(root)
        if os.path.exists(t._current_path()):
            return t  # idempotent create
        columns = list(columns or PAGES_COLUMNS)
        sid = snapshot_id_for(None, "genesis", 1)
        m = Manifest(
            snapshot_id=sid,
            parent_id=None,
            batch_id="genesis",
            schema_version=1,
            n_buckets=n_buckets,
            schemas={1: columns},
            files=[],
            summary={"total_rows": 0, "key_col": key_col},
        )
        t._write_manifest(m)
        t._set_current(sid)
        return t

    @classmethod
    def load(cls, root: str) -> "LakeletTable":
        t = cls(root)
        if not os.path.exists(t._current_path()):
            raise FileNotFoundError(f"no lakelet table at {root}")
        return t

    # -------------------------------------------------------------- manifests

    def _current_path(self) -> str:
        return os.path.join(self.manifest_dir, "_current.json")

    def _manifest_path(self, sid: str) -> str:
        return os.path.join(self.manifest_dir, f"{sid}.json")

    def _write_manifest(self, m: Manifest) -> None:
        atomic_write_json(self._manifest_path(m.snapshot_id), m.to_json())

    def _set_current(self, sid: str) -> None:
        atomic_write_json(self._current_path(), {"snapshot_id": sid})

    def current_snapshot_id(self) -> str:
        return read_json(self._current_path())["snapshot_id"]

    def manifest(self, snapshot_id: str | None = None) -> Manifest:
        sid = snapshot_id or self.current_snapshot_id()
        return Manifest.from_json(read_json(self._manifest_path(sid)))

    def has_snapshot(self, snapshot_id: str) -> bool:
        return os.path.exists(self._manifest_path(snapshot_id))

    def history(self) -> list[str]:
        """Snapshot ids from the oldest readable ancestor to current.
        After ``expire_snapshots`` the chain starts at the oldest
        surviving manifest (expired parents are unreachable)."""
        chain = []
        sid = self.current_snapshot_id()
        while sid is not None and self.has_snapshot(sid):
            chain.append(sid)
            sid = self.manifest(sid).parent_id
        return list(reversed(chain))

    @property
    def key_col(self) -> str:
        return self.manifest().summary.get("key_col", "url")

    # ------------------------------------------------------------------ reads

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        buckets: Sequence[int] | None = None,
        ts_not_before: str | None = None,
        ts_not_after: str | None = None,
    ) -> DataFrame:
        """DataFrame of a snapshot (current by default), optionally pruned
        to a bucket subset and/or a ``warc_ts`` window (manifest-level
        file skipping via per-file footer stats — files that cannot
        contain rows in the window are never handed to Spark; the
        window prune is ADVISORY: rows outside the window may still
        appear, so callers keep their row filter). Handles
        multi-schema-version file groups via col_id name-mapping +
        widen casts; result always presents the snapshot's *current*
        schema.
        """
        m = self.manifest(snapshot_id)
        target_cols = m.columns
        target_schema = spark_schema(target_cols)
        bset = set(int(b) for b in buckets) if buckets is not None else None
        files = select_files(m.files, bset, ts_not_before, ts_not_after)
        if not files:
            return spark.createDataFrame([], schema=target_schema)

        by_ver: dict[int, list[FileEntry]] = {}
        for f in files:
            by_ver.setdefault(f.schema_version, []).append(f)

        parts = []
        for ver, group in sorted(by_ver.items()):
            paths = [os.path.join(self.root, f.path) for f in group]
            src_cols = {c.col_id: c for c in m.schemas[ver]}
            df = spark.read.parquet(*paths)
            sel = []
            for tc in target_cols:
                sc = src_cols.get(tc.col_id)
                if sc is None:  # column added after these files were written
                    sel.append(F.lit(None).cast(_SPARK_TYPES[tc.type]).alias(tc.name))
                elif sc.name != tc.name or sc.type != tc.type:
                    sel.append(F.col(sc.name).cast(_SPARK_TYPES[tc.type]).alias(tc.name))
                else:
                    sel.append(F.col(tc.name))
            parts.append(df.select(*sel))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def touched_buckets(self, batch_keys: DataFrame, key_col: str | None = None) -> list[int]:
        """Distinct buckets of a batch's keys (small: ≤ n_buckets ints)."""
        m = self.manifest()
        kc = key_col or self.key_col
        rows = (
            batch_keys.select(bucket_expr(kc, m.n_buckets).alias("b"))
            .distinct()
            .collect()
        )
        return sorted(r["b"] for r in rows)

    # ----------------------------------------------------------------- commit

    def next_snapshot_id(self, batch_id: str, schema_version: int | None = None) -> str:
        m = self.manifest()
        return snapshot_id_for(
            m.snapshot_id, batch_id, schema_version or m.schema_version
        )

    def commit_rewrite(
        self,
        spark: SparkSession,
        new_bucket_data: DataFrame,
        touched_buckets: Sequence[int],
        batch_id: str,
        summary: dict | None = None,
        stats_out: dict | None = None,
        pre_partitioned: bool = False,
    ) -> str:
        """Copy-on-write commit: replace the files of ``touched_buckets``
        with ``new_bucket_data`` (must contain a ``_bucket`` column and
        exactly the current schema's columns), carry all other files
        forward, write + point a new manifest.

        Idempotent: if the deterministic snapshot already exists, the
        pointer is (re)set and nothing is rewritten — the reference's
        "already ingested" short-circuit (ingest-xml-archive.yaml:97-110).
        """
        m = self.manifest()
        sid = snapshot_id_for(m.snapshot_id, batch_id, m.schema_version)
        if self.has_snapshot(sid):
            self._set_current(sid)
            if stats_out is not None:
                stats_out["skipped"] = True
            return sid

        import time as _time

        t0 = _time.time()
        cols = [c.name for c in m.columns]
        staging = os.path.join(self.root, f"_staging-{sid}")
        # writers of live rows may omit the tombstone lineage column
        if "_deleted" in cols and "_deleted" not in new_bucket_data.columns:
            new_bucket_data = new_bucket_data.withColumn("_deleted", F.lit(False))
        to_write = new_bucket_data.select("_bucket", *cols)
        if not pre_partitioned:
            # co-locate each bucket into one task so partitionBy emits
            # one file per bucket; cogrouped callers are already
            # bucket-grouped and skip this shuffle entirely
            to_write = to_write.repartition(max(len(touched_buckets), 1), "_bucket")
        (
            to_write.write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(staging)
        )

        t_write_done = _time.time()
        os.makedirs(self.data_dir, exist_ok=True)
        promotions: list[tuple[str, str, int]] = []  # (src, rel, bucket)
        for bdir in sorted(glob.glob(os.path.join(staging, "_bucket=*"))):
            b = int(os.path.basename(bdir).split("=")[1])
            parts = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
            for i, p in enumerate(parts):
                promotions.append((p, f"data/b{b:05d}-{sid}-{i}.parquet", b))

        def promote(job: tuple[str, str, int]) -> FileEntry:
            src, rel, b = job
            dst = os.path.join(self.root, rel)
            os.replace(src, dst)
            rows, ts_min, ts_max = _parquet_stats(dst)
            return FileEntry(
                path=rel, bucket=b, rows=rows,
                schema_version=m.schema_version,
                ts_min=ts_min, ts_max=ts_max,
            )

        from concurrent.futures import ThreadPoolExecutor

        if len(promotions) > 8:
            with ThreadPoolExecutor(max_workers=8) as ex:
                new_entries = list(ex.map(promote, promotions))
        else:
            new_entries = [promote(j) for j in promotions]
        _rmtree(staging)

        if stats_out is not None:
            stats_out["skipped"] = False
            per_bucket: dict[int, int] = {}
            for fe in new_entries:
                per_bucket[fe.bucket] = per_bucket.get(fe.bucket, 0) + fe.rows
            stats_out["bucket_rows"] = per_bucket
            # phase decomposition for the scaling evidence: the Spark
            # write (parallel) vs the driver-side promote+manifest
            # (the plan's only serial section)
            stats_out["write_secs"] = round(t_write_done - t0, 4)
            stats_out["commit_secs"] = round(_time.time() - t_write_done, 4)

        touched = set(int(b) for b in touched_buckets)
        kept = [f for f in m.files if f.bucket not in touched]
        files = kept + new_entries
        new_summary = dict(m.summary)
        new_summary.update(summary or {})
        new_summary["total_rows"] = sum(f.rows for f in files)
        nm = Manifest(
            snapshot_id=sid,
            parent_id=m.snapshot_id,
            batch_id=batch_id,
            schema_version=m.schema_version,
            n_buckets=m.n_buckets,
            schemas=m.schemas,
            files=files,
            summary=new_summary,
        )
        self._write_manifest(nm)
        self._set_current(sid)
        return sid

    # ------------------------------------------------------- schema evolution

    def _evolve(self, batch_id: str, mutate) -> str:
        """Metadata-only commit with a bumped schema_version (no rewrite)."""
        m = self.manifest()
        new_ver = m.schema_version + 1
        new_cols = mutate([ColumnSpec(c.col_id, c.name, c.type) for c in m.columns])
        sid = snapshot_id_for(m.snapshot_id, batch_id, new_ver)
        if self.has_snapshot(sid):
            self._set_current(sid)
            return sid
        schemas = dict(m.schemas)
        schemas[new_ver] = new_cols
        nm = Manifest(
            snapshot_id=sid,
            parent_id=m.snapshot_id,
            batch_id=batch_id,
            schema_version=new_ver,
            n_buckets=m.n_buckets,
            schemas=schemas,
            files=m.files,  # untouched: old files readable via name-mapping
            summary=m.summary,
        )
        self._write_manifest(nm)
        self._set_current(sid)
        return sid

    def add_column(self, name: str, type_: str, batch_id: str | None = None) -> str:
        def mutate(cols):
            if any(c.name == name for c in cols):
                raise ValueError(f"column {name} exists")
            next_id = max(c.col_id for c in cols) + 1
            cols.append(ColumnSpec(next_id, name, type_))
            return cols

        return self._evolve(batch_id or f"add:{name}", mutate)

    def rename_column(self, old: str, new: str, batch_id: str | None = None) -> str:
        def mutate(cols):
            for c in cols:
                if c.name == old:
                    c.name = new
                    return cols
            raise ValueError(f"no column {old}")

        return self._evolve(batch_id or f"rename:{old}:{new}", mutate)

    def widen_column(self, name: str, new_type: str, batch_id: str | None = None) -> str:
        def mutate(cols):
            for c in cols:
                if c.name == name:
                    if (c.type, new_type) not in _WIDEN_OK:
                        raise ValueError(f"illegal widen {c.type}→{new_type}")
                    c.type = new_type
                    return cols
            raise ValueError(f"no column {name}")

        return self._evolve(batch_id or f"widen:{name}:{new_type}", mutate)


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _parquet_stats(path: str, ts_col: str = "warc_ts"):
    """(rows, ts_min_iso, ts_max_iso) from the parquet footer — no data
    read. Conservative: any missing stats / null values ⇒ (None, None),
    so the file is never pruned."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    try:
        ci = md.schema.to_arrow_schema().get_field_index(ts_col)
    except Exception:
        ci = -1
    if ci < 0:
        return md.num_rows, None, None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max or (st.null_count or 0) > 0:
            return md.num_rows, None, None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return md.num_rows, None, None
    return md.num_rows, lo.isoformat(), hi.isoformat()


def select_files(
    files,
    buckets=None,
    ts_not_before: str | None = None,
    ts_not_after: str | None = None,
):
    """Manifest-level file pruning: bucket subset + warc_ts window
    overlap via per-file footer stats (files without stats always kept).
    The read-side analogue of Iceberg's file-stats skipping — pruning
    happens BEFORE Spark plans the scan."""
    # normalize 'YYYY-MM-DD hh:mm:ss' → ISO 'T' so string compare is valid
    ts_not_before = ts_not_before.replace(" ", "T") if ts_not_before else None
    ts_not_after = ts_not_after.replace(" ", "T") if ts_not_after else None
    out = []
    for f in files:
        if buckets is not None and f.bucket not in buckets:
            continue
        if ts_not_before and f.ts_max is not None and f.ts_max < ts_not_before:
            continue
        if ts_not_after and f.ts_min is not None and f.ts_min > ts_not_after:
            continue
        out.append(f)
    return out


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
