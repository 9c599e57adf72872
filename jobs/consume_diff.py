"""spark-submit entry point: consume an exported NDJSON diff into a
consumer table — the reference's Kafka diff-consumer role
(orchestration/scripts/notify-clingen-kafka.py consumers), closed loop:
a consumer holding the producer's OLD snapshot replays the exported
created/updated/deleted slices and lands on the producer's NEW state
exactly (state-hash-verifiable).

Usage:

    spark-submit --py-files dist/clinvar_ingest_spark.zip \
        jobs/consume_diff.py --table /consumer/pages --export /wire/diff42

Sequence numbers for the synthetic replay events start above the
consumer's own ledger high-water mark (the diff_slices_to_changelog
precondition), so timestamp-tied updates can never be dropped as late.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--table", required=True, help="consumer lakelet table root")
    p.add_argument("--export", required=True,
                   help="export_diff_ndjson output directory")
    p.add_argument("--master", default="submit")
    args = p.parse_args(argv)

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.ndjson import diff_slices_to_changelog
    from clinvar_ingest_spark.session import get_spark

    spark = get_spark(app_name="consume_diff", master=args.master)
    eng = CdcEngine(spark, args.table)
    start_seq = max(eng.ledger.last_applied_seq() + 1, 1)
    wire = diff_slices_to_changelog(spark, args.export, start_seq=start_seq)
    n = wire.count()
    if n == 0:
        print(json.dumps({"table": args.table, "applied": 0}))
        return 0
    stats = eng.replay(wire.drop("text"), batch_size=max(n, 1))
    print(json.dumps({
        "table": args.table,
        "applied": sum(s.n_events for s in stats),
        "snapshot": eng.table.current_snapshot_id(),
        "state_hash": eng.state_hash(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
