"""Maintained near-dup index bench (round 5): probe cost vs corpus size,
against the per-batch corpus re-scan alternative.

The claim under test: with the MinHash-LSH band buckets maintained as a
derived lakelet table (operators/dedupe_index.MinhashIndex), answering
"does this CDC batch near-duplicate anything already in the corpus?"
costs ∝ |batch| × bucket occupancy — while the non-maintained pipeline
pays a full corpus re-MinHash + band join EVERY batch, ∝ |corpus|.

Method: same seeded generator as the engine fixtures
(sources/changelog.py, words_per_page=64 → block-built bodies, realistic
low random similarity), one corpus at N events and one at N×scale, the
SAME fixed-size delta batch applied to both. At each corpus size:

  build_sec          initial index build (∝ corpus — one-time, context)
  delta_apply_sec    engine replay of the delta batch
  delta_refresh_sec  index maintenance hop after the delta
  probe_sec          MinhashIndex.probe(delta docs) — THE metric
  scan_probe_sec     the alternative: re-MinHash the FULL live corpus,
                     band-join against the delta's band tokens

Cross-check: the two paths must return the IDENTICAL candidate-pair set
(the bench asserts it) — the index buys the plan shape, not a recall
trade. Report per-phase alpha = log(t_big/t_small)/log(scale): expected
~1 for scan_probe (linear in corpus), ≪1 for probe.

Usage:
    SPARK_GRAFT_CPUS=8 python tools/neardup_index_bench.py \
        [--base-events 25000] [--scale 8] [--delta 2000]
Writes BENCH_NEARDUP_INDEX.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PARAMS = dict(n=3, num_hashes=32, bands=16, seed=42)


def run_corpus(spark, n_corpus: int, n_delta: int, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.operators.dedupe_index import (
        MinhashIndex,
        minhash_band_tokens,
    )
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog_to_parquet,
    )

    d = os.path.join(workdir, f"n{n_corpus}")
    os.makedirs(d, exist_ok=True)
    clp = os.path.join(d, "changelog.parquet")
    n_total = n_corpus + n_delta
    generate_changelog_to_parquet(
        ChangelogSpec(
            n_events=n_total,
            n_urls=max(n_total // 4, 1000),
            n_hosts=100,
            seed=42,
            words_per_page=64,
        ),
        clp,
    )
    cl = spark.read.parquet(clp)
    eng = CdcEngine(spark, os.path.join(d, "pages"), n_buckets=64)
    idx = MinhashIndex(eng, os.path.join(d, "index"), n_buckets=64, **PARAMS)

    cutoff = n_corpus
    eng.replay(cl.filter(F.col("seq") < cutoff), batch_size=max(n_corpus // 2, 1))
    t0 = time.time()
    idx.refresh()
    build_sec = time.time() - t0
    corpus_live = eng.count_live()

    t0 = time.time()
    eng.replay(cl.filter(F.col("seq") >= cutoff), batch_size=n_delta)
    delta_apply_sec = time.time() - t0
    t0 = time.time()
    idx.refresh()
    delta_refresh_sec = time.time() - t0

    delta_urls = cl.filter(F.col("seq") >= cutoff).select("url").distinct()
    probe_docs = eng.live().join(delta_urls, "url", "left_semi").persist()
    n_probe = probe_docs.count()  # materialize outside the timed window

    t0 = time.time()
    probe_pairs = idx.probe(probe_docs).count()
    probe_sec = time.time() - t0

    # the alternative a non-maintained pipeline runs per batch: re-derive
    # band tokens over the WHOLE live corpus, join the delta's tokens
    tok_kw = dict(text_col="text", id_col="url", **PARAMS)
    t0 = time.time()
    corpus_tok = minhash_band_tokens(eng.live(), **tok_kw)
    delta_tok = minhash_band_tokens(probe_docs, **tok_kw).select(
        "token", F.col("url").alias("probe_id")
    )
    scan_pairs = (
        delta_tok.join(corpus_tok, "token")
        .select("probe_id", F.col("url").alias("match_url"))
        .filter(F.col("match_url") != F.col("probe_id"))
        .distinct()
        .count()
    )
    scan_probe_sec = time.time() - t0
    probe_docs.unpersist()

    if probe_pairs != scan_pairs:
        raise AssertionError(
            f"maintained-index probe and corpus re-scan disagree: "
            f"{probe_pairs} vs {scan_pairs} pairs at corpus={n_corpus}"
        )
    return {
        "corpus_events": n_corpus,
        "corpus_live_pages": corpus_live,
        "delta_events": n_delta,
        "probe_docs": n_probe,
        "pairs": probe_pairs,
        "build_sec": round(build_sec, 3),
        "delta_apply_sec": round(delta_apply_sec, 3),
        "delta_refresh_sec": round(delta_refresh_sec, 3),
        "probe_sec": round(probe_sec, 3),
        "scan_probe_sec": round(scan_probe_sec, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-events", type=int, default=25_000)
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--delta", type=int, default=2_000)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from clinvar_ingest_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    spark = get_spark(app_name="neardup_index", master=f"local[{cpus}]")
    spark.range(1000).selectExpr("sum(id)").collect()

    workdir = args.workdir or tempfile.mkdtemp(prefix="ndidx_")
    try:
        small = run_corpus(spark, args.base_events, args.delta, workdir)
        big = run_corpus(spark, args.base_events * args.scale, args.delta, workdir)
    finally:
        if args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)

    dec = math.log10(args.scale)

    def alpha(key: str):
        ts, tb = small[key], big[key]
        return round(math.log10(tb / ts) / dec, 3) if ts > 0 and tb > 0 else None

    out = {
        "metric": "maintained near-dup index probe vs corpus re-scan",
        "cores": cpus,
        "delta_events": args.delta,
        "small": small,
        "big": big,
        "alpha": {k: alpha(k) for k in ("probe_sec", "scan_probe_sec",
                                        "delta_refresh_sec", "build_sec")},
        "scan_over_probe_at_big": round(big["scan_probe_sec"] / big["probe_sec"], 2)
        if big["probe_sec"] > 0
        else None,
        "pairs_identical": True,
    }
    with open(os.path.join(REPO, "BENCH_NEARDUP_INDEX.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
