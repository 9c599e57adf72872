"""Deduplication suite for large-scale training-data pipelines.

Generalizes the reference's key-based dedup (``dedupByDate``,
ArchiveBranches.scala:140-156) to *content*-based dedup over a corpus:

- :func:`dedup_exact` — exact duplicate groups by full-text hash.
- :func:`ngram_shingles` / :func:`jaccard_candidate_pairs` — n-gram
  Jaccard near-dup via an inverted shingle index (self-join on shingle,
  count co-occurrences) — never a cross join; candidate generation is
  |pairs sharing ≥1 shingle|, and the Jaccard test is exact integer
  arithmetic (``(t+1)*inter >= t*(|A|+|B|)`` avoids float thresholds).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` —
  MinHash + banded LSH: one md5-derived base hash per shingle, k affine
  permutations, per-position ``min`` aggregates (map-side combine — the
  shuffle carries one row per doc per map partition), bands self-joined
  so the shuffle carries (band_key) buckets, not O(n²) pairs. The hash
  family is DuckDB-expressible, so the output is exactly oracle-checked.
- :func:`simhash48` — 48-bit SimHash fingerprints, fully JVM-side
  (explode → hash → 48 conditional-sum bit votes with map-side
  combine); near-dups = fingerprints within a Hamming radius, found by
  4-block exact-match blocking. Also oracle-checked.

Scale notes: every candidate generator here is bounded by collision
group sizes, not corpus size²; hot shingles (stopword-only grams) are
dropped via a document-frequency cap, the classic skew guard for
inverted-index self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# --------------------------------------------------------------------- exact


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct text: keeper id (min), duplicate count.

    Hash-groupBy with map-side partial agg; at 100 TB group on
    ``sha2(text)`` instead of raw text to shrink shuffle keys — we group
    on the hash and keep one exemplar text hash per group.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
        .select("keep_id", "n_dups", "text_hash")
    )


# ------------------------------------------------------------ n-gram jaccard


def tokenize(col):
    """Whitespace tokenization (deterministic; both engines agree)."""
    return F.split(F.trim(col), r"\s+")


def ngram_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs of word n-grams, de-duplicated per doc."""
    toks = tokenize(F.col(text_col))
    # sequence(a, b) with a > b counts DOWN in Spark — guard short docs
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def jaccard_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs with n-gram Jaccard ≥ threshold.

    Plan: shingle → 64-bit hash (the inverted-index key: an 8-byte
    shuffle key instead of a ~30-byte 3-gram string; intersection
    counts are identical up to xxhash64 collisions, ~1e-9 per corpus)
    → **materialize the index ONCE** (it feeds the hot-shingle count,
    the per-doc sizes, and both sides of the self-join — without the
    materialization the tokenize→explode pipeline runs 4×) →
    (optional) drop shingles with document frequency >
    ``max_shingle_df`` (hot-key guard: a stopword-gram shared by 10^6
    docs would otherwise emit 10^12 candidate pairs) → self-join on
    the hash with id_a < id_b → count co-occurrences = |A∩B| → exact
    integer Jaccard test against per-doc shingle counts.
    """
    sh = (
        ngram_shingles(df, text_col, id_col, n)
        .select("id", F.xxhash64("shingle").alias("sh"))
        .localCheckpoint(eager=True)
    )
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").count().filter(F.col("count") > max_shingle_df)
        sh = sh.join(hot.select("sh"), "sh", "left_anti").localCheckpoint(
            eager=True
        )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    j = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
    )
    # jaccard = i / (na + nb - i) >= t  ⇔  i * (1+t) >= t * (na+nb)  [exact
    # in integers when t = p/q]: use i*q >= p*(na+nb-i)
    p, q = _ratio(threshold)
    keep = j.filter(
        F.col("n_inter") * q >= p * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    )
    return keep.select("id_a", "id_b", "n_inter", "n_a", "n_b")


def _ratio(threshold: float) -> tuple[int, int]:
    from fractions import Fraction

    fr = Fraction(threshold).limit_denominator(10_000)
    return fr.numerator, fr.denominator


# ---------------------------------------------------------------- minhash/LSH


def _minhash_cols(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    num_hashes: int,
    seed: int = 42,
) -> DataFrame:
    """(id, h0..h{k-1}) per-position MinHash values.

    Plan: shingle → ONE md5-derived 48-bit base hash → k affine
    transforms mod 2^31-1 → ``groupBy(id).agg(min(h_i)…)``. The k
    per-position ``min`` aggregates keep **map-side partial
    aggregation** (the shuffle carries one row per (doc, map
    partition), never the raw shingle stream) — unlike a
    collect_list+fold formulation, which disables partial agg and
    materializes |shingles|·k longs per reduce group.

    Hash family from functions/xhash.py: bit-identically computable in
    DuckDB, so LSH output is exactly oracle-checkable.
    """
    from clinvar_ingest_spark.functions.xhash import (
        MERSENNE31,
        affine_params,
        md5_long48,
    )

    sh = ngram_shingles(df, text_col, id_col, n)
    x = md5_long48(F.col("shingle")) % MERSENNE31
    params = affine_params(num_hashes, seed)
    per = sh.select(
        "id",
        *[
            ((F.lit(a) * x + F.lit(b)) % MERSENNE31).alias(f"h{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    return per.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures, fully JVM-side with
    map-side combine (see :func:`_minhash_cols` for the plan notes)."""
    agg = _minhash_cols(df, text_col, id_col, n, num_hashes, seed)
    return agg.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, band, bk) LSH band rows — one row per (doc, band), where
    ``bk`` is the band's signature-slice key. Shared kernel of
    :func:`minhash_lsh_pairs` (corpus self-join) and the maintained
    :class:`~clinvar_ingest_spark.operators.dedupe_index.MinhashIndex`
    (band rows as index tokens). ≤ ``bands`` rows per doc, so any
    shuffle keyed on the output is corpus-size-linear."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    agg = _minhash_cols(df, text_col, id_col, n, num_hashes, seed)
    return agg.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",", *[F.col(f"h{bi * r + j}").cast("string") for j in range(r)]
                        ).alias("bk"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bk")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    rows_per_band = num_hashes/bands; two docs collide if any band of
    their signatures matches exactly. Shuffle key = (band, band_key):
    corpus-size-linear, never pairwise. The band key is the literal
    value concat — at production scale wrap it in xxhash64 to shrink
    the shuffle payload (changes no collisions beyond hash collisions).
    """
    band_rows = minhash_band_rows(df, text_col, id_col, n, num_hashes, bands, seed)
    a = band_rows.select(F.col("id").alias("id_a"), "band", "bk")
    b = band_rows.select(F.col("id").alias("id_b"), "band", "bk")
    return (
        a.join(b, ["band", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# --------------------------------------------------- cluster / keeper decision


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): for each node a, connect every strictly
    LARGER neighbor b to m = min(Γ(a) ∪ {a}). Input/output edges are
    canonical (u > v); both the min and the emit are map-side-combining
    groupBy/join shapes."""
    adj = e.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    mins = (
        adj.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select("a", F.least("mb", "a").alias("m"))
    )
    # no distinct here: duplicate edges are harmless to small-star's
    # min aggregate and its trailing distinct canonicalizes the round —
    # one fewer Exchange per round
    return (
        adj.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: for each node u, connect u and every smaller
    neighbor to m = min of u's smaller neighbors."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    j = e.join(mins, "u")
    out = j.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("cu"), F.col("m").alias("cv")
    ).union(mins.select(F.col("u").alias("cu"), F.col("m").alias("cv")))
    return out.select(F.col("cu").alias("u"), F.col("cv").alias("v")).distinct()


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iters: int = 25,
    checkpoint: str = "parquet",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, cluster_id) — connected components over near-dup pairs via
    alternating **large-star / small-star** rounds (Kiveris et al.);
    cluster_id = min doc id in the component. This is the step that
    turns pairwise candidates into an actionable KEEP/DROP decision.

    Scale/robustness design (round-3 hardening):

    - **O(log n) rounds** instead of diameter-bounded label
      propagation: each round is two groupBy+join passes over the edge
      list, provably converging to per-component stars.
    - **Reliable checkpointing**: each round's edge set is spilled to
      parquet (``checkpoint="parquet"``, default) so lineage is
      truncated *durably* — on a real cluster, losing an executor
      mid-iteration replays from the spill instead of failing the job
      (a bare ``localCheckpoint`` pins blocks to executors and dies
      with them; it remains available as ``checkpoint="local"`` for
      single-node speed). ``checkpoint_dir`` must be cluster-visible
      storage in distributed deployments; defaults to a driver temp
      dir (correct for local mode).
    - **One job per round**: the fixpoint signature (edge count + two
      order-insensitive hash sums) rides the spill write as
      ``observe()`` metrics — no separate count/diff jobs.
    - **Convergence is verified, never assumed**: if the edge set has
      not stabilized after ``max_iters`` rounds the function RAISES —
      silently-truncated labels would yield wrong cluster_ids and
      wrong is_keeper decisions downstream.
    """
    import os
    import shutil
    import tempfile

    from pyspark.sql import Observation

    if checkpoint not in ("parquet", "local"):
        raise ValueError(f"unknown checkpoint mode {checkpoint!r}")
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.greatest("id_a", "id_b").alias("u"),
                     F.least("id_a", "id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    own_dir = checkpoint == "parquet" and checkpoint_dir is None
    ckpt_root = (
        tempfile.mkdtemp(prefix="cc_ckpt_") if own_dir else checkpoint_dir
    )

    def materialize(df: DataFrame, rnd: int) -> tuple[DataFrame, tuple]:
        """Spill + return (re-read frame, fixpoint signature) in ONE job."""
        obs = Observation()
        observed = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            # decimal sums: long-sum of 64-bit hashes would overflow
            # (an error under ANSI mode, a silent wrap otherwise)
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h1"),
            F.sum(F.xxhash64("v", "u").cast("decimal(38,0)")).alias("h2"),
        )
        if checkpoint == "parquet":
            path = os.path.join(ckpt_root, f"round-{rnd}")
            observed.write.mode("overwrite").parquet(path)
            out = spark.read.parquet(path)
        else:
            out = observed.localCheckpoint(eager=True)
        g = obs.get
        return out, (int(g["n"] or 0), g["h1"], g["h2"])

    try:
        edges, sig = materialize(edges, 0)
        converged = sig[0] == 0  # no edges at all ⇒ every id is its own cluster
        for rnd in range(1, max_iters + 1):
            if converged:
                break
            edges, new_sig = materialize(_small_star(_large_star(edges)), rnd)
            if new_sig == sig:
                converged = True
                break
            sig = new_sig
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} "
                "large-star/small-star rounds — labels would be truncated "
                "(wrong cluster_ids); raise max_iters"
            )
        # at convergence the edge set is a union of stars (child → root,
        # root = component min); the groupBy-min is a safety net only
        parents = edges.groupBy("u").agg(F.min("v").alias("cluster_id"))
        labels = (
            ids.select(F.col(id_col).alias("id"))
            .join(parents.withColumnRenamed("u", "id"), "id", "left")
            .select(
                "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
            )
        )
        # detach the result from the spill files before cleanup
        if checkpoint == "parquet":
            labels = labels.localCheckpoint(eager=True)
        return labels
    finally:
        if checkpoint == "parquet":
            if own_dir:
                shutil.rmtree(ckpt_root, ignore_errors=True)
            else:
                for rnd in range(max_iters + 1):
                    shutil.rmtree(
                        os.path.join(ckpt_root, f"round-{rnd}"),
                        ignore_errors=True,
                    )


def dedup_cluster_assignment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """End-to-end corpus dedup decision: n-gram-Jaccard near-dup pairs →
    connected components → one keeper per cluster (the min id).
    Returns (doc_id, cluster_id, is_keeper)."""
    # materialize the candidate pairs ONCE: connected_components spills
    # its round-0 edge set, and without this the whole inverted-index
    # join would re-execute inside that spill job
    pairs = jaccard_candidate_pairs(
        df, text_col, id_col, n, threshold, max_shingle_df
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    ids = df.select(F.col(id_col))
    comp = connected_components(ids, pairs, id_col)
    return comp.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("is_keeper"),
    )


# -------------------------------------------------------------------- simhash

SIMHASH_BITS = 48  # md5-derived 48-bit base hash (functions/xhash.py)


def simhash48(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash: long) 48-bit SimHash fingerprints, fully JVM-side.

    Plan: explode tokens → ONE md5-derived 48-bit hash per token (JVM,
    codegen'd — no Python anywhere) → 48 conditional-sum bit votes via
    ``groupBy(id).agg(sum(±1)…)`` (map-side partial aggregation) →
    reassemble the fingerprint. Replaces the earlier pandas-UDF
    formulation whose per-token Python FNV loop was row-at-a-time work
    in vectorized clothing.

    Docs with no tokens (NULL/whitespace text) fingerprint to 0.
    """
    from clinvar_ingest_spark.functions.xhash import md5_long48

    ids = df.select(F.col(id_col).alias("id")).distinct()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    )
    h = md5_long48(F.col("tok"))
    votes = toks.select(
        "id",
        *[
            F.when(F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ],
    )
    agg = votes.groupBy("id").agg(
        *[F.sum(f"v{j}").alias(f"v{j}") for j in range(SIMHASH_BITS)]
    )
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    agg = agg.select("id", fp.alias("simhash"))
    return ids.join(agg, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4-block
    blocking over the 48-bit fingerprint (pigeonhole: ≤3 differing bits
    → ≥1 of 4 12-bit blocks identical; beyond 3 the blocking is a
    recall<1 candidate generator, like every SimHash index), then exact
    popcount filter on candidates.
    """
    fp = simhash48(df, text_col, id_col)
    blocks = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("simhash", i * 12)
                        .bitwiseAND(F.lit(0xFFF))
                        .alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", "b.blk", "b.bv")
    a = blocks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "bv"
    )
    b = blocks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "bv"
    )
    cands = (
        a.join(b, ["blk", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ------------------------------------------------------- segment-level dedup


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 4,
) -> DataFrame:
    """Corpus-wide segment-level exact dedup with document reassembly —
    the RefinedWeb/CCNet "line dedup" recipe (keep one copy of every
    repeated paragraph ACROSS documents, not just whole-doc dups),
    adapted to boundary-free text: a "segment" is a non-overlapping
    ``seg_tokens``-token window. Generalizes the reference's row-level
    dedupByDate (ArchiveBranches.scala:140-156) to sub-document
    granularity.

    Keeper rule (deterministic, both engines): the globally FIRST
    occurrence of a segment wins — min over ``ord = id*10^6 + pos``
    (requires integer ids and < 10^6 segments/doc, asserted by the
    corpus contract n_chars ≤ ~10^6). Every other occurrence is dropped
    and each document is reassembled from its surviving segments in
    original order.

    Plan: ONE shuffle on the segment string (window min — no
    groupBy+join double-shuffle of the exploded corpus), then one
    shuffle on the doc id for reassembly. Shuffle volume ≈ corpus
    tokens; the hottest segment bounds the largest window partition
    (boilerplate segments — at web scale pre-cap them with a
    document-frequency guard like :func:`jaccard_candidate_pairs`).

    Returns (id, n_segs, n_kept, text_dedup) — n_kept = 0 and
    text_dedup = '' for a document made entirely of segments seen
    earlier (fully-boilerplate docs vanish, the RefinedWeb behavior).
    """
    from pyspark.sql.window import Window

    toks = tokenize(F.col(text_col))
    n_segs = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("bigint"), F.lit(1)
    )
    k = seg_tokens
    flat = df.select(
        F.col(id_col).alias("id"),
        n_segs.alias("n_segs"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (n_segs - 1).cast("int")),
                lambda j: F.array_join(F.slice(toks, j * k + 1, k), " "),
            )
        ).alias("pos", "seg"),
    ).withColumn("ord", F.col("id") * 1_000_000 + F.col("pos"))
    wmin = F.min("ord").over(Window.partitionBy("seg"))
    kept = flat.withColumn("_w", wmin).filter(F.col("ord") == F.col("_w"))
    agg = kept.groupBy("id", "n_segs").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    # docs whose every segment lost: reattach with n_kept=0 / empty text
    base = df.select(F.col(id_col).alias("id"), n_segs.alias("n_segs"))
    return (
        base.join(agg, ["id", "n_segs"], "left")
        .select(
            "id",
            "n_segs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


# ------------------------------------------------- exact-substring dedup


def substr_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Materializable window-fingerprint table for ExactSubstr dedup:
    one row per overlapping ``window``-token span, columns
    ``(id, start, h1, h2)``.

    **128-bit fingerprints.** ``h1``/``h2`` are two independent
    xxhash64 values over the span content (the second salted with a
    literal domain tag, so the pair is a 128-bit key). A single 64-bit
    hash is fine at test scale (~1e-10 collision odds) but NOT at the
    module's 100 TB design point: ≥2^40 windows put birthday collisions
    in expectation, and a collision here silently deletes unique text
    from every doc carrying the colliding span. At 128 bits the
    birthday bound at 2^44 windows is ~2^-41 — negligible. Join/groupBy
    keys stay narrow (16 B/row vs 8).

    **Persist this.** ``exact_substring_dedup`` recomputes windows 2×
    and tokens 1× per action (3 source traversals); at scale, write
    this table once (parquet, partitioned however the corpus is) and
    feed it to :func:`exact_substring_dedup_from_fingerprints`, which
    reads the SOURCE exactly once (asserted in
    tests/test_dedupe.py::test_from_fingerprints_single_source_scan).
    """
    from clinvar_ingest_spark.functions.text import tokens

    base = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    return _win_fingerprints(base, window)


def _win_fingerprints(base: DataFrame, window: int) -> DataFrame:
    """(id, t:array<string>) → (id, start, h1, h2) overlapping windows.

    Hashes are computed INSIDE a transform over the offset sequence so
    the per-row intermediate is array<struct<long,long>> — the token
    array is never duplicated per window and span strings never
    materialize as a column (same memory shape as the round-4 single-
    hash plan; the only delta is one extra xxhash64 per span)."""
    def _span(i):
        return F.concat_ws(" ", F.slice("t", i + 1, window))

    win_structs = F.when(
        F.size("t") < window,
        F.array().cast("array<struct<h1:bigint,h2:bigint>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("t") - window),
            lambda i: F.struct(
                F.xxhash64(_span(i)).alias("h1"),
                # literal domain tag ⇒ independent second 64-bit stream
                F.xxhash64(F.lit("substr_fp2"), _span(i)).alias("h2"),
            ),
        )
    )
    return base.select(
        "id", F.posexplode(win_structs).alias("start", "_hs")
    ).select("id", "start", F.col("_hs.h1").alias("h1"), F.col("_hs.h2").alias("h2"))


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document EXACT-SUBSTRING dedup (the ExactSubstr recipe of
    Lee et al. 2022, re-expressed as DataFrame ops): any ``window``-token
    span whose content occurs in ≥ ``min_docs`` distinct documents is a
    duplicated substring; every token covered by at least one duplicated
    span is cut from EVERY document carrying it, and each document is
    reassembled from its surviving tokens in original order. Complements
    :func:`segment_dedup` (non-overlapping segments, first-copy-wins):
    here windows OVERLAP, so arbitrary-alignment duplication is caught,
    and all copies are cut (the suffix-array semantics, minus the
    suffix array).

    Plan (all linear in corpus tokens, k = ``window`` a constant):
    posexplode rolling windows fingerprinted with a 128-bit key — two
    independent xxhash64 streams, see :func:`substr_fingerprints` for
    why 64 bits is NOT enough at the 100 TB design point (16-byte
    shuffle keys); TWO-level hash agg for the distinct-doc count per
    fingerprint; left-semi back onto occurrences; explode k offsets per
    duplicated occurrence → distinct (doc, pos) cover set; a marker
    LEFT JOIN onto the token table and ONE per-doc agg producing total,
    kept and reassembly together (every doc has ≥1 token row, so no
    extra source branch for totals). No all-pairs stage anywhere — the
    heaviest shuffle is ~tokens rows of (hash, doc); a boilerplate span
    seen in millions of docs costs its occurrence count, not its pair
    count. The source is traversed 3× per action (token explode +
    window pass for the dup agg + window pass for the semi-join) — at
    100 TB write :func:`substr_fingerprints` once and run
    :func:`exact_substring_dedup_from_fingerprints`, which reads the
    source exactly once.

    Returns (id, n_tokens, n_kept, kept_md5) — kept_md5 is the md5 of
    the space-joined surviving tokens ('' ⇒ md5 of the empty string),
    so a SQL oracle can compare exact content without shipping it.
    """
    from clinvar_ingest_spark.functions.text import tokens

    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )
    tok = base.select("id", F.posexplode("t").alias("pos", "tok"))
    wins = _win_fingerprints(base, window)
    return _cut_covered(tok, wins, window, min_docs, id_col)


def exact_substring_dedup_from_fingerprints(
    df: DataFrame,
    fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr dedup over a PERSISTED fingerprint table.

    ``fps`` is the output of :func:`substr_fingerprints` (same
    ``window``), typically written to parquet once per corpus release.
    Unlike :func:`exact_substring_dedup` — which re-derives windows
    from the text twice per action, i.e. 3 source traversals — this
    path reads the SOURCE exactly once (the token explode for
    reassembly); the duplicate-span agg and the cover semi-join both
    run off ``fps``. At 100 TB that turns ~300 TB of repeated HTML/text
    scan into one scan plus two passes over a 24-B/row fingerprint
    table. Output and semantics identical to
    :func:`exact_substring_dedup` (same 128-bit keys).
    """
    from clinvar_ingest_spark.functions.text import tokens

    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )
    tok = base.select("id", F.posexplode("t").alias("pos", "tok"))
    return _cut_covered(tok, fps, window, min_docs, id_col)


def _cut_covered(
    tok: DataFrame, wins: DataFrame, window: int, min_docs: int, id_col: str
) -> DataFrame:
    """Shared ExactSubstr tail: dup-span agg → cover set → cut+reassemble."""
    dup = (
        wins.groupBy("h1", "h2")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h1", "h2")
    )
    covered = (
        wins.join(dup, ["h1", "h2"], "left_semi")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + window - 1)
            ).alias("pos"),
        )
        .distinct()
        .withColumn("_cov", F.lit(True))
    )
    marked = tok.join(covered, ["id", "pos"], "left")
    keep = F.col("_cov").isNull()
    return marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    # collect_list drops the NULLs the when() leaves on
                    # covered tokens — only survivors are reassembled
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "tok")))
                    ),
                    lambda s: s["tok"],
                ),
            )
        ).alias("kept_md5"),
    ).select(
        F.col("id").alias(id_col), "n_tokens", "n_kept", "kept_md5"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): hash every k-token window, then keep the
    MINIMUM hash of each w-window of those hashes. Guarantee: any
    shared token run of length ≥ k + w - 1 leaves at least one shared
    fingerprint, with expected density 2/(w+1) — position-robust
    overlap detection at a fraction of the full rolling-hash volume
    (vs :func:`functions.text.rolling_fingerprints`, which keeps every
    window).

    Returns exploded ``(id_col, fp)`` rows, distinct per doc. All
    JVM higher-order functions over one scan — the window hashes are
    materialized once per row before the winnow pass (never recomputed
    per winnow position). Hashes are the 48-bit md5 family
    (functions/xhash.py) so a SQL oracle replays values exactly.
    Docs with fewer than k tokens yield no fingerprints; docs with
    1..w-1 windows yield their single minimum (the standard short-doc
    degenerate case).
    """
    from clinvar_ingest_spark.functions.text import tokens
    from clinvar_ingest_spark.functions.xhash import md5_long48

    toks = tokens(F.col(text_col))
    hashes = F.when(
        F.size(toks) < k, F.array().cast("array<long>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: md5_long48(
                F.concat_ws(" ", F.slice(toks, i + 1, k))
            ),
        )
    )
    staged = df.select(F.col(id_col), hashes.alias("_h"))
    nh = F.size(F.col("_h"))
    winnowed = (
        F.when(nh == 0, F.col("_h"))
        .when(nh < w, F.array(F.array_min(F.col("_h"))))
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), nh - w),
                lambda j: F.array_min(F.slice(F.col("_h"), j + 1, w)),
            )
        )
    )
    return staged.select(
        id_col, F.explode(F.array_distinct(winnowed)).alias("fp")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    max_df: int = 20,
    min_shared: int = 2,
) -> DataFrame:
    """Overlap-candidate pairs from shared winnowing fingerprints —
    the inverted-index plan every *_pairs operator here uses: explode
    fingerprints → document-frequency cap (``max_df``: a fingerprint
    present in more than this many docs is boilerplate and indexes
    nothing, the hot-shingle guard) → fp equi-join → per-pair shared
    count ≥ ``min_shared``. Shuffle keys are 8-byte hashes; cost is
    Σ df² over kept fingerprints, never corpus-pairwise.

    Complements MinHash (similarity over whole docs) and ExactSubstr
    (byte-identical spans): winnowing finds PARTIAL overlap — quoting,
    template reuse, chunk-level copying — with a length-≥ k+w-1
    guarantee instead of a probabilistic one.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    kept = fps.join(keep, "fp")
    a = kept.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = kept.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
