"""Supporting evidence for BASELINE.md: raw process-level scaling of the
dominant 100 TB compute kernel (Arrow-vectorized HTML→text extraction),
isolated from Spark scheduling — N vs 4N worker processes over identical
work, like Spark's python workers but with zero JVM in the loop.

Usage: python tools/kernel_scaling.py [--docs 64] [--words 2000] [--n 8 --xn 32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_HTML: list[bytes] = []


def _init(html: list[bytes]) -> None:
    global _HTML
    _HTML = html


def _work(n_rounds: int) -> int:
    import pandas as pd

    from clinvar_ingest_spark.functions.extract import extract_text_series

    s = pd.Series(_HTML)
    total = 0
    for _ in range(n_rounds):
        total += int(extract_text_series(s).str.len().sum())
    return total


def run_level(workers: int, html: list[bytes], tasks: int, rounds: int) -> dict:
    with mp.Pool(workers, initializer=_init, initargs=(html,)) as pool:
        t0 = time.time()
        res = pool.map(_work, [rounds] * tasks)
        wall = time.time() - t0
    docs = len(html) * rounds * tasks
    return {
        "workers": workers,
        "docs": docs,
        "sec": round(wall, 2),
        "docs_per_sec": round(docs / wall, 1),
        "checksum": sum(res) % (2**31),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=256, help="docs per task batch")
    ap.add_argument("--words", type=int, default=2000)
    ap.add_argument("--tasks", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--xn", type=int, default=32)
    args = ap.parse_args()

    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )

    pdf = generate_changelog(
        ChangelogSpec(
            n_events=args.docs, n_urls=args.docs, seed=1, words_per_page=args.words,
            p_update=0.0, p_delete=0.0, duplicate_rate=0.0,
        )
    )
    html = [b for b in pdf["html"] if b is not None]

    r_n = run_level(args.n, html, args.tasks, args.rounds)
    r_xn = run_level(args.xn, html, args.tasks, args.rounds)
    assert r_n["checksum"] == r_xn["checksum"]
    eff = (r_xn["docs_per_sec"] / r_n["docs_per_sec"]) / (args.xn / args.n)
    print(json.dumps({
        "metric": "extraction_kernel_scaling",
        "levels": {f"{args.n}proc": r_n, f"{args.xn}proc": r_xn},
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
