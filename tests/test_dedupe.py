"""Dedup suite: exact, n-gram Jaccard, MinHash-LSH recall, SimHash."""

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators import dedupe

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
    (3, "completely different text about spark engines"),
    (4, "a b"),  # shorter than shingle width
    (5, "completely different text about spark engines"),  # exact dup of 3
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_dedup_exact(docs):
    out = dedupe.dedup_exact(docs).collect()
    groups = {r["keep_id"]: r["n_dups"] for r in out}
    assert groups[0] == 2 and groups[3] == 2 and groups[2] == 1 and groups[4] == 1
    assert len(out) == 4


def test_ngram_shingles_short_doc_empty(docs):
    sh = dedupe.ngram_shingles(docs, n=3)
    assert sh.filter(F.col("id") == 4).count() == 0
    # doc 0: 9 tokens → 7 trigrams, 'the' repeats but grams distinct
    assert sh.filter(F.col("id") == 0).count() == 7


def test_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedupe.jaccard_candidate_pairs(
            docs, n=3, threshold=0.5, max_shingle_df=None
        ).collect()
    }
    # exact dups share all shingles; 0-2 share 6/8 = 0.75 ≥ 0.5
    assert (0, 1) in pairs and (3, 5) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert not any({a, b} & {3, 5} and {a, b} & {0, 1, 2} for a, b in pairs)


def test_jaccard_hot_shingle_cap(spark):
    # 20 docs sharing one hot shingle + unique remainder: cap kills the
    # hot gram so no candidate pairs survive
    rows = [(i, f"common shared gram unique{i} tail{i} end{i}") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with_cap = dedupe.jaccard_candidate_pairs(df, n=3, threshold=0.1, max_shingle_df=5)
    without = dedupe.jaccard_candidate_pairs(df, n=3, threshold=0.1, max_shingle_df=None)
    assert with_cap.count() == 0
    assert without.count() > 0


def test_connected_components_label_propagation(spark):
    ids = spark.createDataFrame([(i,) for i in range(7)], ["id"])
    # chain 0-1-2, pair 3-4, pair 5-6, bridge 2-5 => {0,1,2,5,6}, {3,4}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 6), (2, 5)], ["id_a", "id_b"]
    )
    comp = {
        r["id"]: r["cluster_id"]
        for r in dedupe.connected_components(ids, pairs).collect()
    }
    assert comp == {0: 0, 1: 0, 2: 0, 5: 0, 6: 0, 3: 3, 4: 3}


def test_connected_components_random_graph_vs_unionfind(spark):
    """Large-star/small-star result equals an independent union-find on
    a seeded random graph (200 nodes, 150 edges → many components of
    varying diameter), in both checkpoint modes."""
    import random

    rng = random.Random(42)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    # canonicalize to component-min labels
    comp_min: dict[int, int] = {}
    for i in range(n):
        r = want[i]
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[want[i]] for i in range(n)}

    ids = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    for mode in ("parquet", "local"):
        got = {
            r["id"]: r["cluster_id"]
            for r in dedupe.connected_components(
                ids, pairs, checkpoint=mode
            ).collect()
        }
        assert got == want, f"checkpoint={mode}"


def test_connected_components_nonconvergence_raises(spark):
    """max_iters too small for the graph ⇒ RuntimeError, never silent
    truncation (wrong cluster_ids downstream)."""
    # a path graph long enough that round 1 cannot finish it
    n = 64
    ids = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedupe.connected_components(ids, pairs, max_iters=1)
    # and with default iters the same graph resolves to one cluster
    out = dedupe.connected_components(ids, pairs)
    assert {r["cluster_id"] for r in out.collect()} == {0}


def test_dedup_cluster_assignment(docs):
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in dedupe.dedup_cluster_assignment(
            docs, threshold=0.5, max_shingle_df=None
        ).collect()
    }
    # 0,1 exact dups; 2 near-dup of 0 (j=0.75); 3,5 exact dups; 4 alone
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True) and out[5] == (3, False)
    assert out[4] == (4, True)


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedupe.minhash_lsh_pairs(docs, n=3, num_hashes=64, bands=32).collect()
    }
    # exact dups always collide in every band
    assert (0, 1) in pairs and (3, 5) in pairs
    # near dup should collide in at least one of 32 bands (j=0.75)
    assert (0, 2) in pairs or (1, 2) in pairs


def test_minhash_signature_properties(docs):
    sig = {r["id"]: r["sig"] for r in dedupe.minhash_signatures(docs, num_hashes=16).collect()}
    assert sig[0] == sig[1]  # identical docs → identical signatures
    assert sig[0] != sig[3]
    agree = sum(a == b for a, b in zip(sig[0], sig[2])) / 16
    assert agree >= 0.4  # E[agree] = jaccard ≈ 0.75


def test_simhash(docs):
    fp = {r["id"]: r["simhash"] for r in dedupe.simhash48(docs).collect()}
    assert fp[0] == fp[1]
    assert all(0 <= v < 2**48 for v in fp.values())
    ham02 = bin((fp[0] ^ fp[2]) & (2**64 - 1)).count("1")
    ham03 = bin((fp[0] ^ fp[3]) & (2**64 - 1)).count("1")
    assert ham02 < ham03  # near dup closer than unrelated


def test_simhash_python_reference(spark):
    """Golden check: the JVM bit-vote pipeline equals an independent
    Python implementation of 48-bit md5-prefix SimHash."""
    import hashlib

    rows = [(0, "alpha beta beta gamma"), (1, ""), (2, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r["simhash"] for r in dedupe.simhash48(df).collect()}

    def ref(text):
        toks = [t for t in __import__("re").split(r"\s+", text.strip())]
        votes = [0] * 48
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:12], 16)
            for j in range(48):
                votes[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(48) if votes[j] > 0)

    # NB: tokenize('') yields [''] — one empty token, same both sides
    assert got == {i: ref(t) for i, t in rows}


def test_simhash_near_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedupe.simhash_near_pairs(docs, max_hamming=10).collect()
    }
    assert (0, 1) in pairs and (3, 5) in pairs


# ------------------------------------------------------- segment-level dedup


def test_segment_dedup_keeper_and_reassembly(spark):
    # k=2 segments: doc 0 = ["a b","c d"], doc 1 = ["c d","e f"],
    # doc 2 = ["a b","c d"] (fully boilerplate), doc 3 unique.
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),
            (1, "c d e f"),
            (2, "a b c d"),
            (3, "x y z"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r
        for r in dedupe.segment_dedup(docs, seg_tokens=2).collect()
    }
    # doc 0 holds the first occurrence of both its segments
    assert (out[0]["n_segs"], out[0]["n_kept"]) == (2, 2)
    assert out[0]["text_dedup"] == "a b c d"
    # doc 1 loses "c d" (doc 0 pos 1 < doc 1 pos 0), keeps "e f"
    assert (out[1]["n_segs"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["text_dedup"] == "e f"
    # doc 2 is entirely segments seen earlier -> vanishes
    assert (out[2]["n_segs"], out[2]["n_kept"]) == (2, 0)
    assert out[2]["text_dedup"] == ""
    # doc 3: 3 tokens / k=2 -> 2 segments ("x y", "z"), both unique
    assert (out[3]["n_segs"], out[3]["n_kept"]) == (2, 2)
    assert out[3]["text_dedup"] == "x y z"


def test_segment_dedup_single_shuffle_plan(spark):
    """The winner selection is a window min over the segment key — the
    exploded corpus must cross exactly ONE Exchange before the doc-id
    reassembly (no groupBy+join double shuffle)."""
    docs = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
    plan = dedupe.segment_dedup(docs, seg_tokens=2)._jdf.queryExecution().toString()
    # one exchange on seg (window) + one on id (reassembly) + one on the
    # left-join reattach key at most; never an exchange-per-stage blowup
    assert plan.count("Exchange hashpartitioning") <= 3


def test_exact_substring_dedup_cuts_shared_spans(spark):
    """ExactSubstr semantics (Lee et al. 2022): an 8-token span shared
    by two docs is cut from BOTH (all-copies-cut, unlike segment
    dedup's first-copy-wins); unique text survives; untouched and
    fully-duplicated docs behave at the boundaries."""
    import hashlib

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five"),
            (2, f"six seven {shared} eight"),
            (3, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),  # no shared window
            (4, shared),  # entirely duplicated
            (5, shared),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedupe.exact_substring_dedup(docs, window=8).collect()
    }

    def m(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert (out[1]["n_tokens"], out[1]["n_kept"]) == (13, 5)
    assert out[1]["kept_md5"] == m("one two three four five")
    assert (out[2]["n_tokens"], out[2]["n_kept"]) == (11, 3)
    assert out[2]["kept_md5"] == m("six seven eight")
    # doc 3 untouched (its windows occur nowhere else)
    assert out[3]["n_kept"] == 9 and out[3]["kept_md5"] == m(
        "n1 n2 n3 n4 n5 n6 n7 n8 n9"
    )
    # docs 4/5: every token covered -> empty reassembly on BOTH
    for d in (4, 5):
        assert (out[d]["n_tokens"], out[d]["n_kept"]) == (8, 0)
        assert out[d]["kept_md5"] == m("")


def test_exact_substring_dedup_overlapping_alignment(spark):
    """Overlapping windows catch duplication at ANY alignment: a 10-token
    shared run yields 3 shared windows whose union covers all 10 tokens
    in both docs, including the misaligned copy."""
    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # 10 tokens
    docs = spark.createDataFrame(
        [(1, f"{run} tailA tailB"), (2, f"head {run}")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedupe.exact_substring_dedup(docs, window=8).collect()
    }
    assert (out[1]["n_tokens"], out[1]["n_kept"]) == (12, 2)
    assert (out[2]["n_tokens"], out[2]["n_kept"]) == (11, 1)


def test_exact_substring_from_fingerprints_equivalent(spark, tmp_path):
    """The persisted-fingerprint path (100 TB recipe: write
    substr_fingerprints once, dedup from it) must be bit-identical to
    the recompute path on the same corpus."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five"),
            (2, f"six seven {shared} eight"),
            (3, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),
            (4, shared),
        ],
        ["doc_id", "text"],
    )
    fp_dir = str(tmp_path / "fps")
    dedupe.substr_fingerprints(docs, window=8).write.parquet(fp_dir)
    fps = spark.read.parquet(fp_dir)
    assert set(fps.columns) == {"id", "start", "h1", "h2"}

    direct = sorted(
        map(tuple, dedupe.exact_substring_dedup(docs, window=8).collect())
    )
    via_fps = sorted(
        map(
            tuple,
            dedupe.exact_substring_dedup_from_fingerprints(
                docs, fps, window=8
            ).collect(),
        )
    )
    assert direct == via_fps


def test_from_fingerprints_single_source_scan(spark, tmp_path):
    """The whole point of the persisted path: the SOURCE is scanned
    exactly once per action (the recompute path scans it 3x). Counted
    on the EXECUTED plan (the optimized-plan string abbreviates file
    relations and drops the path), source as a parquet scan so each
    scan node prints its location."""
    docs_dir = str(tmp_path / "docs")
    fp_dir = str(tmp_path / "fps")
    spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")],
        ["doc_id", "text"],
    ).write.parquet(docs_dir)
    docs = spark.read.parquet(docs_dir)
    dedupe.substr_fingerprints(docs, window=8).write.parquet(fp_dir)
    fps = spark.read.parquet(fp_dir)

    def n_source_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count(docs_dir)

    assert n_source_scans(
        dedupe.exact_substring_dedup(docs, window=8)
    ) == 3  # the documented recompute cost
    assert n_source_scans(
        dedupe.exact_substring_dedup_from_fingerprints(docs, fps, window=8)
    ) == 1


def test_substr_fingerprints_128bit_pair_independent(spark):
    """h1/h2 are independent 64-bit streams (different values for the
    same span), and identical spans agree on BOTH — the 128-bit
    collision story relies on exactly this."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")], ["doc_id", "text"]
    )
    rows = dedupe.substr_fingerprints(docs, window=8).collect()
    assert len(rows) == 2
    (r1, r2) = rows
    assert r1["h1"] != r1["h2"]  # independent streams
    assert (r1["h1"], r1["h2"]) == (r2["h1"], r2["h2"])  # content-keyed


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_and_density(spark):
    """Any shared token run >= k+w-1 must leave a shared fingerprint;
    disjoint docs share nothing; short docs degenerate to one min."""
    from pyspark.sql import Row

    from clinvar_ingest_spark.operators.dedupe import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(11))  # k+w-1 = 11 tokens
    docs = [
        Row(doc_id=1, text="alpha beta " + shared + " gamma delta xx yy"),
        Row(doc_id=2, text=shared + " zz ww unrelated tokens here now"),
        Row(doc_id=3, text=" ".join(f"q{i}" for i in range(30))),
        Row(doc_id=4, text="tiny doc with nine words in it right here"),
    ]
    df = spark.createDataFrame(docs)
    fps = winnow_fingerprints(df, k=8, w=4)
    by_doc = {
        r.doc_id: {x.fp for x in rows}
        for r in fps.select("doc_id").distinct().collect()
        for rows in [fps.filter(fps.doc_id == r.doc_id).collect()]
    }
    # guarantee: docs 1 and 2 share the 11-token run
    assert by_doc[1] & by_doc[2]
    # disjoint vocab: doc 3 shares nothing with anyone
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # short doc (9 tokens -> 2 windows < w): exactly one fingerprint
    assert len(by_doc[4]) == 1
    # density: winnowing keeps far fewer than all windows on doc 3
    assert len(by_doc[3]) < 30 - 8 + 1

    pairs = winnow_overlap_pairs(df, k=8, w=4, min_shared=1)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and not any(3 in p for p in got)


def test_winnow_position_invariance(spark):
    """The same passage at different offsets fingerprints identically
    (content-defined selection — shifting a prefix must not reshuffle
    the winnowed set of the shared region)."""
    from pyspark.sql import Row

    from clinvar_ingest_spark.operators.dedupe import winnow_fingerprints

    passage = " ".join(f"p{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=passage),
            Row(doc_id=2, text="pre1 pre2 pre3 pre4 pre5 " + passage),
        ]
    )
    fps = {
        d: {r.fp for r in winnow_fingerprints(df, k=8, w=4)
            .filter(f"doc_id = {d}").collect()}
        for d in (1, 2)
    }
    # every fingerprint of the bare passage also fires inside doc 2
    assert fps[1] <= fps[2]
