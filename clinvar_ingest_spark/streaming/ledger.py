"""Offsets / lineage ledger — the engine's exactly-once memory.

Reference analogues: ``processing_history`` (pipeline_version + run date
per release, reference: README.md:30-41,
schema/src/main/jade-tables/processing_history.table.json) and the
COUNT(1) idempotency gates
(orchestration/scripts/count-processing-history-rows.sh:113-127,
check-if-processed-today.sh:99-113). A batch is committed iff its ledger
record exists; records are single JSON files written atomically, so the
check is a metadata lookup, not a table scan.

Also holds per-batch **lineage** records — the engine's replacement for
the reference's Kafka notify message {release_date, bucket, files[]}
(orchestration/scripts/notify-clingen-kafka.py:17-48): per micro-batch
{batch_id, snapshot_id, per-partition event counts, watermark,
events_per_sec}.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import asdict, dataclass, field

from clinvar_ingest_spark.lakelet.manifest import atomic_write_json, read_json

ENGINE_VERSION = "0.1.0"


def batch_id_for(first_seq: int, last_seq: int) -> str:
    """Deterministic batch id from the offset range (FIXTURES.md §3)."""
    return f"{first_seq:012d}-{last_seq:012d}"


@dataclass
class LineageRecord:
    batch_id: str
    snapshot_id: str
    first_seq: int
    last_seq: int
    n_events: int
    n_inserts: int
    n_updates: int
    n_deletes: int
    touched_buckets: int
    watermark: str | None  # max applied warc_ts (ISO)
    wall_secs: float
    events_per_sec: float
    #: write mode of the apply: "cow" (exact insert/update split) or
    #: "mor" (delta append — upserts counted under n_upserts, split 0)
    mode: str = "cow"
    n_upserts: int = 0
    #: events dead-lettered by validation rules BEFORE the merge (0
    #: when validation is off); they are excluded from n_events
    n_quarantined: int = 0
    engine_version: str = ENGINE_VERSION
    applied_at: float = field(default_factory=time.time)  # excluded from determinism
    partitions: list[dict] = field(default_factory=list)  # per-bucket lineage
    #: max seq the stream was known complete through when this range
    #: committed. None = the full [first_seq, last_seq] range applied.
    #: A tail batch whose range overruns the delivered stream commits
    #: with partial_to = the stream's max seq; when later deliveries
    #: extend past it, replay() applies just the (partial_to, last_seq]
    #: remainder instead of skipping the whole committed id — without
    #: this, a growing log permanently loses the remainder events.
    partial_to: int | None = None


class Ledger:
    def __init__(self, ledger_dir: str):
        self.dir = ledger_dir
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, batch_id: str) -> str:
        return os.path.join(self.dir, f"{batch_id}.json")

    def is_committed(self, batch_id: str) -> bool:
        return os.path.exists(self._path(batch_id))

    def record(self, rec: LineageRecord) -> None:
        atomic_write_json(self._path(rec.batch_id), asdict(rec))

    def get(self, batch_id: str) -> dict | None:
        p = self._path(batch_id)
        return read_json(p) if os.path.exists(p) else None

    def update(self, batch_id: str, **fields) -> None:
        """Atomically rewrite named fields of a committed record (used
        to advance/clear ``partial_to`` after a remainder heal).

        Concurrency contract: the write itself is atomic (tmp+rename)
        but the read-modify-write is NOT locked across writers. That is
        safe for the one field replay() updates — ``partial_to`` —
        because every value written is derived from COMMITTED remainder
        records (the heal walks the chain in replay(), never stamps its
        own delivered hi over a skip), so a lost race can only leave the
        frontier CONSERVATIVELY stale: the next replay re-walks the
        committed chain and converges, and apply_batch's per-id ledger
        short-circuit keeps re-walks exactly-once. Callers adding new
        update() uses must preserve this derive-from-committed-state
        property or add locking."""
        rec = self.get(batch_id)
        if rec is None:
            raise KeyError(f"no ledger record for batch {batch_id}")
        rec.update(fields)
        atomic_write_json(self._path(batch_id), rec)

    def all_records(self) -> list[dict]:
        return sorted(
            (read_json(p) for p in glob.glob(os.path.join(self.dir, "*.json"))),
            key=lambda r: r["batch_id"],
        )

    def last_applied_seq(self) -> int:
        """Resume point: max seq the stream is known COMPLETE through.
        A record with ``partial_to`` set contributes that frontier, not
        its nominal last_seq — resuming a consumer at
        ``last_applied_seq() + 1`` must never skip the unhealed
        remainder of a partially-committed tail batch."""
        recs = self.all_records()
        return max(
            (
                r["partial_to"] if r.get("partial_to") is not None else r["last_seq"]
                for r in recs
            ),
            default=-1,
        )
