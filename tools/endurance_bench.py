"""Sustained-throughput endurance evidence for the north rule.

The rule's headline is *sustained* MERGE-apply events/sec "on 10^10 CDC
events" — not a 2-batch sprint. What kills sustained throughput on a
long-lived CDC table is never the steady-state merge itself; it is the
slow accumulators:

  * per-batch wall creeping up as the table grows (COW rewrite cost is
    proportional to live rows in touched buckets, not to batch size);
  * metadata blowup — manifest bytes / live file count growing with
    every commit until planning dominates (the classic Iceberg
    many-snapshots pathology that manifest *segments* exist to stop);
  * ledger / lineage lookups degrading from O(1) to O(#batches).

This tool replays one seeded changelog through MANY micro-batches
(default 24 — 12x the headline bench) on a fresh table, in both write
modes, and reports the per-batch series plus drift summaries, so
"sustained" is a measured curve instead of an adjective:

  * per-batch wall_secs / events_per_sec (from the engine's own
    lineage ledger — the numbers a production operator would watch);
  * sustain_ratio = mean(ev/s over last 3 batches) / mean(first 3);
  * wall_slope_secs_per_batch = least-squares slope of wall vs index;
  * per-commit manifest bytes + live/delta file counts (metadata
    growth curve across all snapshots, incl. compactions);
  * a steady-state decomposition: batches that touch a full-size
    table (the tail) vs the growing prefix.

Modes measured:
  cow        — every batch rewrites touched buckets (amplification
               grows with table size; per-batch wall shows it);
  mor        — delta appends + compact_every=K folding (the 100 TB
               deployment cadence; per-batch wall should stay flat,
               with the rewrite cost concentrated in K-periodic
               compaction commits).

Usage:
  python tools/endurance_bench.py [--events 1200000] [--batches 24]
      [--buckets 64] [--compact-every 8] [--modes cow,mor]
      [--out BENCH_ENDURANCE.json]

Honest-measurement notes (same substrate caveats as BASELINE.md): this
microVM's memory fabric drifts multi-x between runs minutes apart, so
cross-mode wall comparisons within ONE process/session are the only
meaningful ones; the series SHAPE (flat vs growing) is robust to a
constant substrate factor either way.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _series_summary(walls: list[float], evps: list[float]) -> dict:
    """Drift stats over FULL batches only — the caller strips runt tail
    batches (a 3-event remainder's ev/s is meaningless and would poison
    a mean)."""
    n = len(walls)
    k = min(3, n)
    first = sum(evps[:k]) / k
    last = sum(evps[-k:]) / k
    # least-squares slope of wall vs batch index
    xs = list(range(n))
    xbar = sum(xs) / n
    ybar = sum(walls) / n
    den = sum((x - xbar) ** 2 for x in xs) or 1.0
    slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, walls)) / den
    return {
        "n_batches": n,
        "events_per_sec_first3": round(first, 1),
        "events_per_sec_last3": round(last, 1),
        "sustain_ratio": round(last / first, 3) if first else None,
        "wall_slope_secs_per_batch": round(slope, 4),
        "wall_first3_mean": round(sum(walls[:k]) / k, 3),
        "wall_last3_mean": round(sum(walls[-k:]) / k, 3),
    }


def _metadata_curve(table) -> list[dict]:
    """Manifest bytes + file counts for every snapshot, in commit order.

    Planning cost at batch B is a function of THIS curve, not of B: if
    manifest bytes / live files are flat in the tail, planning stays
    O(current files) forever (segments absorb the per-commit delta)."""
    out = []
    for sid in table.history():
        m = table.manifest(sid)
        n_files, n_delta = m.file_counts()
        try:
            mbytes = os.path.getsize(table._manifest_path(sid))
        except OSError:
            mbytes = None
        out.append(
            {
                "snapshot_id": sid,
                "manifest_bytes": mbytes,
                "n_files": n_files,
                "n_delta_files": n_delta,
            }
        )
    return out


def run_mode(
    spark, changelog, workdir: str, mode: str, batches: int,
    buckets: int, compact_every: int | None,
) -> dict:
    from clinvar_ingest_spark.engine import CdcEngine

    bounds = changelog.selectExpr("min(seq) lo", "max(seq) hi").collect()[0]
    n = int(bounds["hi"]) - int(bounds["lo"]) + 1
    root = os.path.join(workdir, f"pages_{mode}")
    eng = CdcEngine(spark, root, n_buckets=buckets, write_mode=mode)
    t0 = time.time()
    eng.replay(
        changelog,
        batch_size=max(n // batches, 1),
        compact_every=compact_every if mode == "mor" else None,
    )
    wall = time.time() - t0
    lin = eng.lineage().orderBy("first_seq").collect()
    walls_all = [float(r["wall_secs"]) for r in lin]
    evps_all = [float(r["events_per_sec"]) for r in lin]
    nev = [int(r["n_events"]) for r in lin]
    # drift summary over full-size batches only: a runt tail (the
    # changelog length is rarely a multiple of batch_size) has a
    # meaningless ev/s and would poison first3/last3 means
    full = max(nev) if nev else 0
    keep = [i for i, e in enumerate(nev) if e >= full // 2]
    walls = [walls_all[i] for i in keep]
    evps = [evps_all[i] for i in keep]
    meta = _metadata_curve(eng.table)
    state = eng.state_hash() if hasattr(eng, "state_hash") else None
    res = {
        "mode": mode,
        "events": n,
        "batches_applied": len(lin),
        "total_wall_secs": round(wall, 2),
        "overall_events_per_sec": round(n / wall, 1),
        "per_batch_wall_secs": [round(w, 3) for w in walls_all],
        "per_batch_events_per_sec": [round(e, 1) for e in evps_all],
        "per_batch_events": nev,
        "summary": _series_summary(walls, evps),
        "metadata_curve": meta,
        "metadata_summary": {
            "commits": len(meta),
            "manifest_bytes_first": meta[0]["manifest_bytes"] if meta else None,
            "manifest_bytes_last": meta[-1]["manifest_bytes"] if meta else None,
            "n_files_last": meta[-1]["n_files"] if meta else None,
            "n_delta_files_last": meta[-1]["n_delta_files"] if meta else None,
        },
        "state_hash": state,
    }
    shutil.rmtree(root, ignore_errors=True)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_200_000)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--modes", default="cow,mor")
    ap.add_argument("--words", type=int, default=80)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_ENDURANCE.json")
    )
    args = ap.parse_args()

    from clinvar_ingest_spark.session import get_spark
    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog_to_parquet,
    )

    spark = get_spark(app_name="endurance_bench")
    workdir = tempfile.mkdtemp(prefix="endurance_")
    try:
        clp = os.path.join(workdir, "changelog.parquet")
        generate_changelog_to_parquet(
            ChangelogSpec(
                n_events=args.events,
                n_urls=max(args.events // 6, 1000),
                n_hosts=100,
                seed=42,
                words_per_page=args.words,
            ),
            clp,
        )
        cl = spark.read.parquet(clp)
        # warm the JVM/codegen/python-worker path outside every timed
        # region, through the same code path (throwaway table)
        warm = CdcEngine(
            spark, os.path.join(workdir, "warm"), n_buckets=args.buckets
        )
        warm.replay(cl.limit(2000), batch_size=2000)
        shutil.rmtree(os.path.join(workdir, "warm"), ignore_errors=True)

        result = {
            "metric": "sustained_merge_apply",
            "events": args.events,
            "batches": args.batches,
            "buckets": args.buckets,
            "compact_every": args.compact_every,
            "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
            "modes": {},
        }
        for mode in args.modes.split(","):
            mode = mode.strip()
            result["modes"][mode] = run_mode(
                spark, cl, workdir, mode, args.batches, args.buckets,
                args.compact_every,
            )
        hashes = {
            m: r.get("state_hash")
            for m, r in result["modes"].items()
            if r.get("state_hash") is not None
        }
        if len(hashes) > 1:
            vals = set(hashes.values())
            result["state_hash_equal_across_modes"] = len(vals) == 1
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result["modes"], default=str)[:2000])
        print(f"\nwrote {args.out}")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
