"""Snapshot manifests: the metadata layer of a lakelet table.

Reference analogues: the TDR dataset's snapshot cut by ``release_date``
(reference: orchestration/scripts/request-release-date-snapshot.py:127-154;
schema/src/main/jade-assets/clinvar_release.asset.json) and the
date-partitioned physical layout every table declares (reference:
schema/src/main/jade-tables/gene.table.json:33-36). Here a snapshot is a
JSON manifest pinning {schema version, file list with per-file stats,
parent pointer, batch id}; the *current* table state is a one-line
pointer file swapped by atomic rename.

Exactly-once (SURVEY.md §7 hard part (a)): ``snapshot_id`` is a
deterministic hash of (parent_id, batch_id, schema_version) — the same
batch applied twice computes the same id, detects the existing manifest,
and becomes a no-op, mirroring the reference's COUNT(1) short-circuits
(reference: orchestration/templates/ingest-xml-archive.yaml:97-110,
process-and-reingest-release.yaml:37-51).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from dataclasses import dataclass, field, asdict


@dataclass
class ColumnSpec:
    """One column: stable ``col_id`` survives renames (hard part (c)).

    ``type`` is either a scalar (string|binary|timestamp|int|long|float|
    double|date|boolean), an ``array<scalar>``, or the complex kinds
    ``struct`` / ``array<struct>`` whose element shape lives in
    ``fields`` — each nested field is itself a ColumnSpec with a
    table-unique col_id, so nested renames/widens are metadata-only
    commits exactly like top-level ones (the reference's tables are
    full of these: repeated string columns in variation.table.json and
    ``xrefs: ARRAY<STRUCT>`` per jade-structs/xref.struct.json:1-29).
    """

    col_id: int
    name: str
    type: str
    fields: list["ColumnSpec"] | None = None

    def clone(self) -> "ColumnSpec":
        return ColumnSpec(
            self.col_id,
            self.name,
            self.type,
            [f.clone() for f in self.fields] if self.fields is not None else None,
        )

    def to_json(self) -> dict:
        d = asdict(self)
        if d.get("fields") is None:
            d.pop("fields", None)
        return d

    @staticmethod
    def from_json(d: dict) -> "ColumnSpec":
        return ColumnSpec(
            col_id=d["col_id"],
            name=d["name"],
            type=d["type"],
            fields=[ColumnSpec.from_json(f) for f in d["fields"]]
            if d.get("fields")
            else None,
        )


@dataclass
class FileEntry:
    path: str  # relative to table root
    bucket: int
    rows: int
    schema_version: int  # schema the file was written under (name-mapping key)
    min_key: str | None = None
    max_key: str | None = None
    #: warc_ts column range (ISO) from the parquet footer — manifest-level
    #: data skipping for time-bounded reads (Iceberg file-stats parity).
    #: None (e.g. any nulls / stats missing) = never pruned.
    ts_min: str | None = None
    ts_max: str | None = None
    #: "base" (COW-resolved bucket state: ≤1 row per key) or "delta"
    #: (merge-on-read commit: LWW-versioned upsert/tombstone rows layered
    #: on top of the base — readers resolve, compaction folds). The
    #: Iceberg v2 MOR analogue re-expressed for the LWW row model: one
    #: delta ROW carries the full new row version (or tombstone), so no
    #: separate position/equality-delete files are needed.
    kind: str = "base"
    #: base64 bloom filter over the file's key column (delta files only —
    #: see lakelet/bloom.py): point lookups skip delta files whose bloom
    #: excludes the key. None = never skipped.
    key_bloom: str | None = None

    def to_json(self) -> dict:
        d = asdict(self)
        if d.get("key_bloom") is None:
            d.pop("key_bloom", None)  # keep base-file entries compact
        return d

    @staticmethod
    def from_json(d: dict) -> "FileEntry":
        return FileEntry(**d)


@dataclass
class Manifest:
    snapshot_id: str
    parent_id: str | None
    batch_id: str | None
    schema_version: int
    n_buckets: int
    # all schema versions ever committed, so any historical file is readable
    schemas: dict[int, list[ColumnSpec]] = field(default_factory=dict)
    files: list[FileEntry] = field(default_factory=list)
    summary: dict = field(default_factory=dict)

    @property
    def columns(self) -> list[ColumnSpec]:
        return self.schemas[self.schema_version]

    def to_json(self) -> dict:
        return {
            "format_version": 1,
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "batch_id": self.batch_id,
            "schema_version": self.schema_version,
            "n_buckets": self.n_buckets,
            "schemas": {
                str(v): [c.to_json() for c in cols] for v, cols in self.schemas.items()
            },
            "files": [f.to_json() for f in self.files],
            "summary": self.summary,
        }

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        return Manifest(
            snapshot_id=d["snapshot_id"],
            parent_id=d["parent_id"],
            batch_id=d["batch_id"],
            schema_version=d["schema_version"],
            n_buckets=d["n_buckets"],
            schemas={
                int(v): [ColumnSpec.from_json(c) for c in cols]
                for v, cols in d["schemas"].items()
            },
            files=[FileEntry.from_json(f) for f in d["files"]],
            summary=d.get("summary", {}),
        )


def snapshot_id_for(parent_id: str | None, batch_id: str, schema_version: int) -> str:
    """Deterministic snapshot id — the exactly-once key."""
    payload = f"{parent_id or 'root'}|{batch_id}|{schema_version}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:20]


def link_pointer(directory: str, name: str, payload: dict) -> None:
    """Atomically create an immutable pointer file via os.link — the
    filesystem CAS both the table head chain and the release head
    chain commit through. Raises FileExistsError if another writer
    already took the slot (the loser's signal to re-plan)."""
    import tempfile

    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.link(tmp, os.path.join(directory, name))
    finally:
        os.unlink(tmp)


def latest_pointer(directory: str, prefix: str = "head-") -> tuple[int, dict] | None:
    """(seq, payload) of the highest ``{prefix}{seq:012d}.json`` pointer
    in ``directory``, or None when the chain doesn't exist yet."""
    try:
        names = os.listdir(directory)
    except FileNotFoundError:
        return None
    best = None
    plen = len(prefix)
    for n in names:
        if n.startswith(prefix) and n.endswith(".json"):
            try:
                seq = int(n[plen:-5])
            except ValueError:
                continue
            if best is None or seq > best:
                best = seq
    if best is None:
        return None
    return best, read_json(os.path.join(directory, f"{prefix}{best:012d}.json"))


def atomic_write_json(path: str, obj: dict) -> None:
    """Write-then-rename: readers never observe a torn manifest."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
