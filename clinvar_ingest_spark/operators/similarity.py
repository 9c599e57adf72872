"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_bruteforce` — exact top-k neighbors for a (small,
  broadcast) query set against the full corpus: JVM-side dot products
  via ``zip_with``/``aggregate`` (whole-stage codegen, no Python), then
  a per-query top-k window. The baseline every ANN variant is measured
  against.
- :func:`lsh_bucket_topk` — random-hyperplane (SRP) LSH: sign-bit
  sketches partition the corpus into buckets; queries probe only their
  own bucket (+ optional multi-probe by flipping bits), turning the
  scan from O(N) per query into O(N / 2^bits) expected. The scale path
  for 100 TB embedding stores; recall measured against brute force in
  tests.

- :func:`ivf_topk` — inverted-file (IVF) ANN: a deterministic coarse
  quantizer (:func:`ivf_centroids`, optionally Lloyd-refined via
  :func:`ivf_refine`) partitions the corpus into cells; queries probe
  only the ``nprobe`` nearest cells. The second scale path, preferable
  to SRP when the corpus is clustered (cells adapt to the data; SRP
  planes don't).

Embedding-cosine near-dup dedup = :func:`cosine_dup_pairs` — all pairs
above a cosine threshold among LSH bucket collisions (never pairwise
across the whole corpus).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize: cosine becomes a plain dot product downstream."""
    n = _norm(F.col(vec_col))
    return df.withColumn(
        "_unit", F.transform(F.col(vec_col), lambda x: x / n)
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact top-k.

    ``queries`` must be small (it is broadcast); the corpus is scanned
    once per partition with codegen'd array arithmetic.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    j = c.crossJoin(F.broadcast(q))
    if exclude_self:
        j = j.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = (_dot(F.col("_cv"), F.col("_qv")) / (_norm(F.col("_cv")) * _norm(F.col("_qv")))).alias(
        "cosine"
    )
    scored = j.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _plan_row_estimate(df: DataFrame) -> int | None:
    """Catalyst's row-count estimate for ``df``, or None.

    Present when the source carries statistics (CBO-analyzed tables, or
    a bare file scan whose row count Catalyst can derive); absent for
    most derived plans. Used to size SRP bits WITHOUT running an eager
    ``count()`` action — ``auto_srp_bits`` only consumes log₂(n), so an
    estimate is as good as an exact count."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        return None
    return None


def _sizing_rows(df: DataFrame, n_rows: int | None) -> int:
    """n for auto bit sizing: caller-supplied > plan estimate > count().

    The count() fallback is an eager action over the upstream plan —
    documented in both callers; pass ``n_rows`` (exact or estimated) or
    cache ``df`` first when the derivation is expensive."""
    if n_rows is not None:
        return n_rows
    est = _plan_row_estimate(df)
    if est is not None:
        return est
    return df.count()


def auto_srp_bits(
    n_rows: int, target_bucket_rows: int = 128, lo: int = 4, hi: int = 24
) -> int:
    """Corpus-size-aware SRP width: enough hyperplanes that the expected
    bucket holds ~``target_bucket_rows`` vectors.

    The bucket self-join in :func:`cosine_dup_pairs` compares
    O(n²/2^bits) pairs — at FIXED bits that is superlinear in n (the one
    measured α=1.43 plan in BENCH_SFSCALE round 3). Holding the expected
    bucket size B constant (bits = log2(n/B)) makes total comparisons
    ≈ n·B — linear in n, the 100 TB contract. Clamped to [lo, hi]:
    below 2^lo buckets LSH stops paying for itself; above ``hi`` bits
    recall collapses for any realistic dim without multi-probe.
    """
    import math

    if n_rows <= target_bucket_rows:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_rows / target_bucket_rows))))


def srp_planes(dim: int, bits: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic SRP hyperplanes as plain Python floats — the single
    source both the Spark plan (literal arrays) and any SQL oracle
    (literal lists) embed, so bucket assignments agree bit-for-bit."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((bits, dim))]


def srp_sketch(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "_bucket",
) -> DataFrame:
    """Sign-random-projection bucket id (int) per row, fully JVM-side:
    bucket bit b = sign(dot(v, hyperplane_b)), hyperplanes from
    :func:`srp_planes` baked into the plan as literals.
    """
    planes = srp_planes(dim, bits, seed)
    expr = F.lit(0).cast("long")
    v = F.col(vec_col)
    for b in range(bits):
        lit_plane = F.array(*[F.lit(x) for x in planes[b]])
        d = _dot(v, lit_plane)
        expr = expr + F.when(d > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return df.withColumn(out_col, expr)


def _probe_masks(bits: int, probe_hamming: int) -> list[int]:
    """XOR masks for multi-probe: all bucket perturbations within
    ``probe_hamming`` bit flips (0 → just the own bucket)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, probe_hamming + 1):
        for combo in combinations(range(bits), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: score corpus rows in the query's SRP bucket.

    ``bits=None`` (default) sizes the sketch from the corpus count via
    :func:`auto_srp_bits`, keeping per-query candidate-scan cost
    (n/2^bits) roughly constant as the corpus grows. The sizing count
    is a full action over ``corpus`` — when the corpus is an expensive
    uncached derivation, pass ``n_rows`` (exact or estimated, e.g. from
    table metadata) to skip it, or cache the corpus first.

    ``probe_hamming`` > 0 enables **multi-probe**: each query also
    scans every bucket within that Hamming distance of its own sketch
    (r=1 → bits+1 buckets). A vector near a hyperplane lands on either
    side of that bit — probing the 1-flip neighbors recovers exactly
    those near-boundary misses, trading a bounded ×(1 + C(bits,1) +
    … + C(bits,r)) candidate growth for recall. Implemented as an
    explode over XOR masks + the same equi-join (never a Hamming theta
    join — the shuffle key stays a plain bucket id at any corpus
    size); the exact-cosine gate is unchanged.
    """
    if bits is None:
        bits = auto_srp_bits(_sizing_rows(corpus, n_rows))
    c = srp_sketch(corpus, dim, bits, seed, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_bucket"
    )
    q = srp_sketch(queries, dim, bits, seed, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "_bucket"
    )
    if probe_hamming > 0:
        masks = _probe_masks(bits, probe_hamming)
        q = q.withColumn(
            "_bucket",
            F.explode(
                F.array(
                    *[F.col("_bucket").bitwiseXOR(F.lit(m)) for m in masks]
                )
            ),
        )
    j = c.join(F.broadcast(q), "_bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = (
        _dot(F.col("_cv"), F.col("_qv")) / (_norm(F.col("_cv")) * _norm(F.col("_qv")))
    ).alias("cosine")
    scored = j.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: SRP-bucket self-join + exact cosine gate.

    ``bits=None`` (default) sizes the sketch from the corpus via
    :func:`auto_srp_bits` so the bucket self-join stays linear in n at
    any corpus size instead of the fixed-bits O(n²/2^bits). The sizing
    count runs the upstream plan once — for an expensive uncached
    ``df``, pass ``n_rows`` (exact or estimated) or cache first. Pass
    explicit ``bits`` only with a justified bits-vs-n argument (e.g.
    oracle parity at a pinned SF).
    """
    if bits is None:
        bits = auto_srp_bits(_sizing_rows(df, n_rows))
    s = srp_sketch(df, dim, bits, seed, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "_bucket"
    )
    a = s.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "_bucket")
    b = s.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "_bucket")
    pairs = a.join(b, "_bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# --------------------------------------------------------------------------


def _lit_vec(vals: list[float]):
    return F.array(*[F.lit(float(v)) for v in vals])


def _py_norm(vals: list[float]) -> float:
    import math

    return math.sqrt(sum(x * x for x in vals)) or 1.0


def ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int, list[float]]]:
    """Deterministic coarse quantizer: the ``nlist`` corpus vectors with
    the smallest cross-engine ``md5_long48(id)`` — a seeded uniform
    sample both Spark and any SQL oracle reproduce bit-identically
    (k-means++-style init without engine-dependent iteration order;
    :func:`ivf_refine` adds Lloyd steps when exact SQL mirroring is not
    required).

    Returns ``[(centroid_idx, source_id, vector), ...]`` ordered by
    (hash, id). The collect is bounded metadata (``nlist`` rows, the
    documented driver-side exception) and the selection itself is a
    distributed TakeOrdered — no full sort materializes at any corpus
    size.
    """
    from clinvar_ingest_spark.functions.xhash import md5_long48

    rows = (
        corpus.select(
            F.col(id_col).alias("_cid"),
            md5_long48(F.col(id_col).cast("string")).alias("_h"),
            F.col(vec_col).alias("_cv"),
        )
        .orderBy("_h", "_cid")
        .limit(nlist)
        .collect()
    )
    return [(i, r["_cid"], [float(x) for x in r["_cv"]]) for i, r in enumerate(rows)]


def _centroid_cosines(vec_col_expr, centroids):
    """One (cosine, idx) struct per centroid, computed map-side from
    literal centroid arrays — pure projection, zero shuffle."""
    vnorm = _norm(vec_col_expr)
    out = []
    for idx, _src, cvec in centroids:
        cos = _dot(vec_col_expr, _lit_vec(cvec)) / (vnorm * F.lit(_py_norm(cvec)))
        out.append((idx, cos))
    return out


def ivf_assign(
    corpus: DataFrame,
    centroids: list[tuple[int, int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Nearest-centroid (max-cosine) cell id per row. The centroid table
    rides into the plan as literals (nlist × dim doubles), so assignment
    is embarrassingly parallel — the inverted lists exist only as a
    partitioning key, never as a driver-side structure. Ties break to
    the smallest centroid idx (matches ``ORDER BY cos DESC, idx ASC``
    in a SQL mirror)."""
    cands = [
        F.struct(cos.alias("c"), F.lit(-idx).alias("ni"))
        for idx, cos in _centroid_cosines(F.col(vec_col), centroids)
    ]
    best = F.greatest(*cands) if len(cands) > 1 else cands[0]
    return corpus.withColumn(out_col, (best["ni"] * -1).cast("int"))


def ivf_refine(
    corpus: DataFrame,
    centroids: list[tuple[int, int, list[float]]],
    iters: int = 2,
    vec_col: str = "embedding",
) -> list[tuple[int, int, list[float]]]:
    """Lloyd refinement: ``iters`` rounds of assign → per-cell mean.
    Distributed as posexplode → groupBy(cell, pos) avg → repack (the
    classic two-shuffle k-means step; per-cell per-dim partial averages
    combine map-side). Cells that lose all members keep their previous
    centroid. Spark-only (no SQL mirror) — use the 0-iter
    :func:`ivf_centroids` when an exact cross-engine oracle is needed."""
    cur = centroids
    for _ in range(iters):
        assigned = ivf_assign(corpus, cur, vec_col=vec_col)
        rows = (
            assigned.select("ivf_cell", F.posexplode(F.col(vec_col)))
            .groupBy("ivf_cell", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("ivf_cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("mv")
            )
            .collect()
        )
        means = {r["ivf_cell"]: [float(x) for x in r["mv"]] for r in rows}
        cur = [
            (idx, src, means.get(idx, cvec))
            for idx, src, cvec in cur
        ]
    return cur


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, int, list[float]]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF search: each query scans only the ``nprobe`` cells whose
    centroids are most cosine-similar to it — expected candidate volume
    N * nprobe / nlist instead of N per query.

    Plan shape at scale: corpus-side assignment is map-side (literal
    centroids); the candidate restriction is a broadcast equi-join on
    the cell id (queries × nprobe rows broadcast, corpus never
    shuffled); only the per-query top-k window shuffles, and it sees
    the post-pruning candidate set. Recall is measured against
    :func:`cosine_topk_bruteforce` in tests."""
    assigned = ivf_assign(corpus, centroids, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "ivf_cell"
    )
    probes = [
        F.struct((cos * -1).alias("nc"), F.lit(idx).alias("i"))
        for idx, cos in _centroid_cosines(F.col(vec_col), centroids)
    ]
    probe_cells = F.slice(F.sort_array(F.array(*probes)), 1, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(F.transform(probe_cells, lambda s: s["i"])).alias("ivf_cell"),
    )
    j = assigned.join(F.broadcast(q), "ivf_cell")
    if exclude_self:
        j = j.filter(F.col("neighbor_id") != F.col("query_id"))
    cos = (
        _dot(F.col("_cv"), F.col("_qv")) / (_norm(F.col("_cv")) * _norm(F.col("_qv")))
    ).alias("cosine")
    scored = j.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
