"""Iterative graph ranking — exact fixed-point PageRank.

Why in this engine: web-corpus curation ranks hosts/domains by link
centrality to pick crawl frontiers and quality tiers (Common Crawl
publishes exactly this as its host-level ranking). The reference's
cross-entity linking (VCV.scala:167-174; our
`operators/fanout.resolve_link_targets`) produces the edge list; this
operator turns it into a ranking. It also demonstrates the second
iterative-dataflow pattern in the repo (besides connected components,
operators/dedupe.py): a fixed-iteration loop of join + aggregate, fully
JVM-side.

Determinism contract: ranks live in 64-bit FIXED POINT (``scale`` =
1e6 ≈ 6 decimal digits). Every step is integer arithmetic —
``contrib = rank div out_degree`` then
``rank' = base + (d_num · Σcontrib) div d_den`` — so the result is
independent of partitioning, shuffle order, and engine: integer sums
commute exactly where floating-point sums don't, which is what makes a
full rows+schema+hash oracle possible on an iterative algorithm.
Semantics notes (both mirrored by any oracle): dangling mass is
dropped, not redistributed (the classic simplification; at web scale
the dangling correction is one extra scalar agg per iteration), and
iteration count is FIXED — no convergence test, so no data-dependent
control flow to diverge between engines.

Plan shape per iteration: edges ⋈ ranks on src (ranks is |nodes| rows —
broadcast when it fits, sort-merge co-partitioned with the cached edge
list otherwise) → groupBy(dst) partial-sum → one Exchange. The edge
list is the big side and is touched read-only every iteration — persist
it partitioned by src once; only the (small) rank vector moves between
iterations. Lineage depth grows linearly with the fixed iteration
count; for large T callers should pass ``checkpoint_dir`` (reliable
parquet spill per round, the same hardening connected_components got in
round 3) — NOT localCheckpoint, which loses blocks with a dead executor.
"""

from __future__ import annotations

import os
import uuid
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """PageRank over a simple directed graph, exact in fixed point.

    ``edges`` should be deduplicated; self-loops are dropped here (a
    host linking to itself is noise for centrality). Returns
    ``(node, rank_fp)`` where ``rank_fp`` ≈ rank × scale, for every
    node appearing as a source or target. Initial rank = 1.0 (scale).
    """
    import shutil
    import tempfile

    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .distinct()
    )
    e = e.repartition("_src").persist()
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .persist()
    )
    base = scale * (damping_den - damping_num) // damping_den

    spark = edges.sparkSession
    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="pagerank_ckpt_")
    run = uuid.uuid4().hex[:8]
    ranks = nodes.withColumn("rank_fp", F.lit(int(scale)).cast("long"))
    try:
        for i in range(iterations):
            contrib = (
                e.join(ranks, e["_src"] == ranks["node"])
                .join(deg, on="_src")
                .select(
                    F.col("_dst").alias("node"),
                    F.expr("rank_fp div _deg").alias("_c"),
                )
            )
            inc = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
            ranks = nodes.join(inc, on="node", how="left").select(
                "node",
                (
                    F.lit(int(base))
                    + F.expr(
                        f"({damping_num} * coalesce(_s, 0L)) div {damping_den}"
                    )
                )
                .cast("long")
                .alias("rank_fp"),
            )
            # reliable per-round spill (same hardening as
            # connected_components): truncates lineage AND survives
            # executor loss — contrast localCheckpoint, see module doc.
            # The rank vector is |nodes| rows, tiny next to the edges.
            p = os.path.join(ckpt, f"pr-{run}-{i}")
            ranks.write.mode("overwrite").parquet(p)
            ranks = spark.read.parquet(p)
        # final ranks are a pure parquet read — safe to drop the caches
        e.unpersist()
        nodes.unpersist()
        # keep only the last round's spill alive for the returned DF
        for i in range(iterations - 1):
            shutil.rmtree(os.path.join(ckpt, f"pr-{run}-{i}"), ignore_errors=True)
        return ranks
    except Exception:
        e.unpersist()
        nodes.unpersist()
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
        raise


def host_edges_from_links(
    resolved_links: DataFrame,
    src_url: str = "url",
    href: str = "_norm_href",
) -> DataFrame:
    """(src_host, dst_host) edge list from resolved link entities
    (`operators/fanout.resolve_link_targets` output): absolute-https
    hrefs only, host extracted from both sides."""
    host = lambda c: F.regexp_extract(F.col(c), r"https://([^/]+)", 1)  # noqa: E731
    return (
        resolved_links.select(
            host(src_url).alias("src"), host(href).alias("dst")
        )
        .filter((F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )
