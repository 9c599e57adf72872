"""Substrate probe: aggregate memcpy bandwidth vs concurrent streams.

The scaling evidence (tools/scaling_bench.py) compares the identical
MERGE job at N vs 4N cores. On this sandbox's microVM the memory fabric
itself stops scaling with stream count, which caps any byte-movement-
heavy job independent of plan shape. This probe measures that ceiling
directly so BASELINE.md can compare job-scaling efficiency against the
substrate's own memcpy-scaling efficiency at the same stream counts.

Each worker process memcpys a 256 MB numpy buffer repeatedly for a
fixed wall window; aggregate GB/s = sum of per-worker bytes / window.

Usage: python tools/memcpy_probe.py [--streams 1 2 4 8 16 32]
Writes BENCH_MEMCPY.json next to the repo root.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUF_MB = 256
WINDOW_S = 6.0


def _worker(out_q: mp.Queue, start_evt, window: float) -> None:
    src = np.random.randint(0, 255, BUF_MB * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    start_evt.wait()
    t0 = time.time()
    n = 0
    while time.time() - t0 < window:
        np.copyto(dst, src)
        n += 1
    out_q.put(n * src.nbytes)


def measure(streams: int, window: float = WINDOW_S) -> float:
    q: mp.Queue = mp.Queue()
    start = mp.Event()
    procs = [
        mp.Process(target=_worker, args=(q, start, window)) for _ in range(streams)
    ]
    for p in procs:
        p.start()
    time.sleep(1.0)  # let buffers allocate
    start.set()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / window / 1e9  # GB/s aggregate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 2, 4, 8, 16, 32])
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_MEMCPY.json"))
    args = ap.parse_args()

    results: dict[str, float] = {}
    for s in args.streams:
        best = max(measure(s) for _ in range(args.repeats))
        results[str(s)] = round(best, 3)
        print(f"{s:3d} streams: {best:.2f} GB/s aggregate", flush=True)

    pairs = {}
    for n in args.streams:
        xn = n * 4
        if str(xn) in results:
            pairs[f"{n}->{xn}"] = round(results[str(xn)] / results[str(n)] / 4, 3)
    out = {
        "metric": "aggregate_memcpy_gbps_by_streams",
        "buf_mb": BUF_MB,
        "gbps": results,
        "scaling_efficiency_Nto4N": pairs,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
