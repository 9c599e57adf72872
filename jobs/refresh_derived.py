"""spark-submit entry point: refresh derived tables from the change feed.

Brings CDC-derived artifacts current with the pages table in one hop
each — the operational face of `operators/ivm.py` (aggregate views) and
`operators/index.py` (inverted index). The reference re-runs its whole
transformation per release (ClinVarPipelineBuilder.scala:15-115); this
job absorbs only the change set (changed-bucket deltas) and is safe to
run from cron, concurrently with writers (OCC on the index table,
atomic pointer flip on views), and repeatedly (idempotent: already-
current artifacts no-op).

Usage:

    spark-submit --py-files dist/clinvar_ingest_spark.zip \
        jobs/refresh_derived.py --table /lake/pages \
        --view /lake/views/lang_rollup --view-group lang \
        --view-measures 'n_pages:count,sum_seq:sum:_seq' \
        --index /lake/index --index-max-posting 100000

Exit code 0 on success; the JSON line on stdout reports what moved.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_measures(spec: str):
    out = []
    for part in spec.split(","):
        bits = part.split(":")
        if len(bits) == 2 and bits[1] == "count":
            out.append((bits[0], "count"))
        elif len(bits) == 3 and bits[1] == "sum":
            out.append((bits[0], "sum", bits[2]))
        else:
            raise ValueError(f"bad measure {part!r} (name:count or name:sum:expr)")
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--table", required=True, help="pages lakelet table root")
    p.add_argument("--view", help="MaterializedAggView root to refresh")
    p.add_argument("--view-group", default="lang",
                   help="comma-separated group-by columns for --view")
    p.add_argument("--view-measures", default="n_rows:count",
                   help="measures: 'name:count,name:sum:<col or expr>'")
    p.add_argument("--index", help="InvertedIndex root to refresh")
    p.add_argument("--index-max-posting", type=int, default=None,
                   help="hot-token cap (sticky; see operators/index.py)")
    p.add_argument("--master", default="submit")
    args = p.parse_args(argv)
    if not (args.view or args.index):
        p.error("pick at least one derived artifact (--view / --index)")

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.session import get_spark

    spark = get_spark(app_name="refresh_derived", master=args.master)
    eng = CdcEngine(spark, args.table)
    head = eng.table.current_snapshot_id()
    out: dict = {"table": args.table, "pages_snapshot": head}

    if args.view:
        from clinvar_ingest_spark.operators.ivm import (
            AggViewSpec,
            MaterializedAggView,
        )

        spec = AggViewSpec(
            group_cols=args.view_group.split(","),
            measures=_parse_measures(args.view_measures),
        )
        view = MaterializedAggView(eng, spec, args.view)
        was = view.current_snapshot_id()
        now = view.refresh()
        out["view"] = {
            "root": args.view,
            "from": was,
            "to": now,
            "moved": was != now,
            "rows": view.read().count(),
        }

    if args.index:
        from clinvar_ingest_spark.operators.index import InvertedIndex

        idx = InvertedIndex(
            eng, args.index, max_posting=args.index_max_posting
        )
        was = idx.indexed_snapshot_id()
        idx.refresh()
        now = idx.indexed_snapshot_id()
        out["index"] = {
            "root": args.index,
            "from": was,
            "to": now,
            "moved": was != now,
            "tokens": idx.read().count(),
        }

    ok = (not args.view or out["view"]["to"] == head) and (
        not args.index or out["index"]["to"] == head
    )
    out["current_with_table"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
