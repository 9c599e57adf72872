"""Scale-proof bench (round-3 directive): run the headline operator
suite at TWO data scales a decade apart (sf0.1-equivalent and
sf1-equivalent row counts) on the SAME pinned parallelism (local[8]),
and report the per-query scaling exponent

    alpha = log10(t_big / t_small)       (1.0 = linear for a 10x decade)

"plans you'd want at 100x" argued from explain() shape is necessary
but not sufficient — one measured decade confirms no superlinear
surprises (especially candidate-pair volume in the jaccard/cluster
family). Inputs are synthesized deterministically (seeded) with a
scale-INVARIANT duplicate structure: ~2% exact dups + ~2% near dups,
so pair volume grows linearly with the corpus and a measured alpha
meaningfully tests the plan, not the data shape.

Usage:
    SPARK_GRAFT_CPUS=8 python tools/sfscale_bench.py [--small 1] [--big 10]
Writes BENCH_SFSCALE.json and prints one JSON line.
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

# sf0.1-equivalent base sizes (mirrors /root/testdata/sf0.1)
BASE_DOCS = 5_000
BASE_VECS = 2_000
BASE_EVENTS = 150_000

QUERIES = [
    "dedup_exact",
    "text_quality",
    "lang_id",
    "token_stats",
    "fingerprint_docs",
    "rolling_fingerprints",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "dedup_clusters",
    "ann_topk",
    "ann_lsh_topk",
    "embedding_dup_pairs",
    "multimodal_meta",
    # late-round-3 corpus operators
    "segment_dedup",
    "vocab_topk",
    # round 4
    "exact_substring_dedup",
    # round 5: same content-keyed result off a materialized fingerprint
    # table — the 100 TB path (source scanned once)
    "exact_substring_persisted",
]

STOPWORD_POOL = (
    "the and of to a in is it that for der die das und ist nicht el la los "
    "y es un le les et est pour il gli e che non para en que dans une"
).split()


def gen_documents(out_dir: str, n_docs: int, seed: int = 42) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array(
        STOPWORD_POOL
        + ["w%04x" % i for i in range(4000)],
        dtype=object,
    )
    lens = rng.integers(40, 240, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.02:  # exact dup of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        words = list(vocab[rng.integers(0, len(vocab), size=lens[i])])
        if i > 10 and r < 0.04:  # near dup: copy + perturb 2 words
            base = texts[rng.integers(0, i)].split()
            for _ in range(2):
                base[rng.integers(0, len(base))] = str(
                    vocab[rng.integers(0, len(vocab))]
                )
            words = base
        texts.append(" ".join(words))
    langs = rng.choice(["en", "de", "es", "fr", "it"], size=n_docs)
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(list(langs), type=pa.string()),
            "source": pa.array(
                [f"syn{i % 7}" for i in range(n_docs)], type=pa.string()
            ),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(out_dir: str, n_vecs: int, dim: int = 64, seed: int = 42) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    # planted near-dup fraction (2%), mirroring the corpus structure
    n_dup = n_vecs // 50
    idx = rng.integers(0, n_vecs, size=n_dup)
    m[-n_dup:] = m[idx] + 0.01 * rng.standard_normal((n_dup, dim)).astype(
        np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in m], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                list(map(int, rng.integers(0, 10, size=n_vecs))),
                type=pa.int32(),
            ),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "embeddings.parquet"))


def gen_changelog(out_dir: str, n_events: int, seed: int = 42) -> str:
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog_to_parquet,
    )

    p = os.path.join(out_dir, "changelog.parquet")
    generate_changelog_to_parquet(
        ChangelogSpec(
            n_events=n_events,
            n_urls=max(n_events // 6, 1000),
            n_hosts=100,
            seed=seed,
            words_per_page=80,
        ),
        p,
    )
    return p


def run_scale(spark, scale: int, workdir: str, entrymod) -> dict:
    d = os.path.join(workdir, f"x{scale}")
    os.makedirs(d, exist_ok=True)
    gen_documents(d, BASE_DOCS * scale)
    gen_embeddings(d, BASE_VECS * scale)
    clp = gen_changelog(d, BASE_EVENTS * scale)

    qmap = entrymod.queries()
    times: dict[str, float] = {}
    for name in QUERIES:
        t0 = time.time()
        qmap[name](spark, d).write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - t0, 3)

    # embedding near-dup at DEFAULT settings (bits=None → auto_srp_bits
    # from the corpus count): the round-3 weak spot was fixed-bits
    # superlinearity (alpha 1.43); the default must measure ~linear.
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.operators.similarity import cosine_dup_pairs

    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    t0 = time.time()
    cosine_dup_pairs(emb, dim=64, threshold=0.3).write.mode(
        "overwrite"
    ).format("noop").save()
    times["embedding_dup_auto"] = round(time.time() - t0, 3)

    # CDC replay (the headline metric) at this scale
    from clinvar_ingest_spark.engine import CdcEngine

    cl = spark.read.parquet(clp)
    eng = CdcEngine(spark, os.path.join(d, "pages"), n_buckets=64)
    t0 = time.time()
    stats = eng.replay(cl, batch_size=max(BASE_EVENTS * scale // 4, 1))
    wall = time.time() - t0
    times["cdc_replay"] = round(wall, 3)
    ev = sum(s.n_events for s in stats)
    return {
        "times": times,
        "cdc_events": ev,
        "cdc_events_per_sec": round(ev / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--big", type=int, default=10)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from clinvar_ingest_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    spark = get_spark(app_name="sfscale", master=f"local[{cpus}]")
    spark.range(1000).selectExpr("sum(id)").collect()

    workdir = args.workdir or tempfile.mkdtemp(prefix="sfscale_")
    try:
        small = run_scale(spark, args.small, workdir, entrymod)
        big = run_scale(spark, args.big, workdir, entrymod)
    finally:
        if args.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)

    decade = math.log10(args.big / args.small)
    out = {
        "metric": "per-query scaling exponent over one data decade",
        "cores": cpus,
        "scales": {"small": args.small, "big": args.big},
        "queries": {},
        "cdc": {
            "small_events_per_sec": small["cdc_events_per_sec"],
            "big_events_per_sec": big["cdc_events_per_sec"],
        },
    }
    for name in list(small["times"]):
        ts, tb = small["times"][name], big["times"][name]
        alpha = (
            round(math.log10(tb / ts) / decade, 3) if ts > 0 and tb > 0 else None
        )
        out["queries"][name] = {
            "t_small_s": ts,
            "t_big_s": tb,
            "alpha": alpha,
        }
    with open(os.path.join(REPO, "BENCH_SFSCALE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
