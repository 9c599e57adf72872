"""spark-submit entry point: export created/updated/deleted NDJSON diff
slices between two snapshots (the reference's export-diff workflow,
orchestration/templates/export-diff.yaml:17-151, as one submittable job).

Usage:

    spark-submit --py-files dist/clinvar_ingest_spark.zip \
        jobs/export_diff.py --table /lake/pages \
        --old <snapshot_id> --new <snapshot_id> --out /out/diff

`--old previous` resolves to the current snapshot's parent; `--new
current` (default) to the table head — the reference's
get-preceding-release-date behavior
(orchestration/scripts/get-preceding-release-date.sh:1-15).

Prints the notify message (files + per-kind counts) as one JSON line —
the Kafka-notify payload analogue (notify-clingen-kafka.py:17-48).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--table", required=True, help="lakelet table root")
    p.add_argument("--old", default="previous",
                   help="old snapshot id, or 'previous' (current's parent)")
    p.add_argument("--new", default="current",
                   help="new snapshot id, or 'current' (table head)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--master", default="submit",
                   help="'submit' under spark-submit; e.g. local[8] for smoke runs")
    args = p.parse_args(argv)

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.session import get_spark

    spark = get_spark(app_name="export_diff", master=args.master)
    eng = CdcEngine(spark, args.table)

    new = eng.table.current_snapshot_id() if args.new == "current" else args.new
    if args.old == "previous":
        # date-absent branch (reference export-diff.yaml:34-41 →
        # date-absent.yaml:26-121): a true first release exports the
        # whole snapshot as change=created. That is the case when the
        # head has no parent at all OR its parent is the table's empty
        # GENESIS snapshot (deterministic id — checkable even after
        # expire_snapshots removed the genesis manifest; a diff against
        # the empty genesis IS the full-create). A REAL parent whose
        # manifest was expired is NOT that case: exporting a full
        # CREATE there would make an incremental consumer re-insert
        # its entire dataset, so it stays a loud error.
        from clinvar_ingest_spark.lakelet.manifest import snapshot_id_for

        genesis = snapshot_id_for(None, "genesis", 1)
        parent = eng.table.manifest(new).parent_id
        if parent is None or parent == genesis:
            old = None
        elif not eng.table.has_snapshot(parent):
            print(
                json.dumps(
                    {
                        "error": "preceding snapshot expired",
                        "parent_id": parent,
                        "hint": "re-run with --old <snapshot> or "
                        "--old none for an explicit full export",
                    }
                )
            )
            return 2
        else:
            old = parent
    elif args.old in ("none", "absent"):
        old = None
    else:
        old = args.old

    msg = eng.export_diff_ndjson(old, new, args.out)
    print(json.dumps(msg))
    return 0


if __name__ == "__main__":
    sys.exit(main())
