"""spark-submit entry point: multi-entity fan-out under one release cut.

The reference's per-release pipeline tail (15 entity tables + one
snapshot naming them all, request-release-date-snapshot.py:127-154) as
one job: parse the changelog once, commit every entity table, pin the
cut under a deterministic release id, optionally sweep retention.

Usage:

    spark-submit --py-files dist/clinvar_ingest_spark.zip \
        jobs/fanout_release.py --root /lake/entities \
        --changelog '/wal/batch-*.parquet' --batch-id release-2026-08-17
    ... --root /lake/entities --expire-keep 4          # retention only
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--root", required=True, help="release-set root directory")
    p.add_argument("--changelog", help="changelog parquet path/glob")
    p.add_argument("--batch-id", help="release batch id (idempotency key)")
    p.add_argument("--entities", default=None,
                   help="comma list of entity types (default: all)")
    p.add_argument("--n-buckets", type=int, default=16)
    p.add_argument("--no-dedup", action="store_true",
                   help="fan out ALL events, not just LWW winners")
    p.add_argument("--expire-keep", type=int,
                   help="after (or without) the fan-out, keep only the "
                        "last N releases and GC unpinned member snapshots")
    p.add_argument("--expire-grace", type=float, default=600.0,
                   help="seconds: leave commit artifacts younger than "
                        "this alone (in-flight multi-writer protection)")
    p.add_argument("--master", default="submit")
    args = p.parse_args(argv)
    if not args.changelog and args.expire_keep is None:
        p.error("need --changelog (+ --batch-id) and/or --expire-keep")
    if args.changelog and not args.batch_id:
        p.error("--changelog requires --batch-id")

    from clinvar_ingest_spark.lakelet.release import (
        ReleaseSet,
        expire_releases,
        write_fanout_release,
    )
    from clinvar_ingest_spark.session import get_spark

    spark = get_spark(app_name="fanout_release", master=args.master)
    out: dict = {"root": args.root}
    if args.changelog:
        ents = tuple(args.entities.split(",")) if args.entities else None
        rid = write_fanout_release(
            spark.read.parquet(args.changelog),
            args.root,
            args.batch_id,
            entity_types=ents,
            n_buckets=args.n_buckets,
            dedup=not args.no_dedup,
        )
        rs = ReleaseSet(args.root)
        out["release_id"] = rid
        out["tables"] = rs.release(rid)["tables"]
    if args.expire_keep is not None:
        out["expire"] = expire_releases(
            ReleaseSet(args.root),
            keep_last=args.expire_keep,
            in_flight_grace_secs=args.expire_grace,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
