"""BM25 ranked retrieval (operators/ranking.py): hand-computed scores,
deterministic top-k cut, and the broadcast/top-k plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.ranking import bm25_topk

DOCS = [
    (1, "spark merge spark spark"),
    (2, "merge vector merge"),
    (3, "the quick brown fox"),
    (4, "spark"),
    (5, ""),
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Row-at-a-time reference implementation (test-only)."""
    toks = {i: (t.split() if t.strip() else []) for i, t in docs}
    dl = {i: len(v) for i, v in toks.items()}
    n = float(len(docs))
    avgdl = sum(dl.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, v in toks.items():
            tf = float(v.count(term))
            if tf == 0:
                continue
            w = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl[i] / avgdl))
            s, c = out.get(i, (0.0, 0))
            out[i] = (s + w, c + 1)
    return {i: (c, round(s * 10000.0)) for i, (s, c) in out.items()}


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["bm25_e4"])
        for r in bm25_topk(df, ["spark", "merge"], k=10).collect()
    }
    assert got == _ref_bm25(DOCS, ["spark", "merge"])


def test_bm25_topk_cut_is_deterministic(spark):
    # four identical single-term docs -> equal scores; the k=2 cut must
    # keep the two lowest doc_ids (integer tie-break, not plan order)
    rows = [(i, "needle") for i in (9, 3, 7, 1)] + [(100, "hay")]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    out = bm25_topk(df, ["needle"], k=2).collect()
    assert [r["doc_id"] for r in out] == [1, 3]


def test_bm25_plan_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_topk(df, ["spark", "merge"], k=3)._jdf.queryExecution().executedPlan().toString()
    # distributed top-k, never a global sort
    assert "TakeOrderedAndProject" in plan
    # corpus stats reach the scored rows via broadcast, not shuffle
    assert plan.count("BroadcastExchange") >= 1
    # corpus tokenized exactly twice (stats + tf); dfreq must NOT
    # recompute the scan lineage a third time
    assert plan.count("FileScan") + plan.count("Scan ExistingRDD") <= 2
    # the term filter exists pre-aggregation (pushed below the tf agg)
    assert "needle" not in plan  # sanity: plan string is for this query


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    try:
        bm25_topk(df, [])
        assert False, "expected ValueError"
    except ValueError:
        pass


# ---------------------------------------------------------------- indexed

def _text_engine_with_index(spark, tmp_path):
    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.operators.index import InvertedIndex
    from clinvar_ingest_spark.operators.ranking import text_token_pairs
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
        write_changelog_parquet,
    )

    p = str(tmp_path / "cl.parquet")
    write_changelog_parquet(
        generate_changelog(ChangelogSpec(n_events=600, n_urls=80, seed=21)), p
    )
    eng = CdcEngine(spark, str(tmp_path / "pages"), n_buckets=8)
    eng.replay(spark.read.parquet(p), batch_size=600)
    idx = InvertedIndex(
        eng, str(tmp_path / "index"), n_buckets=8, tokenizer=text_token_pairs
    )
    idx.refresh()
    return eng, idx


def test_bm25_indexed_equals_bruteforce(spark, tmp_path):
    from clinvar_ingest_spark.operators.ranking import bm25_topk, bm25_topk_indexed

    eng, idx = _text_engine_with_index(spark, tmp_path)
    # pick real corpus terms at different frequencies, deterministically
    freqs = (
        idx.read()
        .select("token", F.size("urls").alias("df"))
        .orderBy(F.desc("df"), "token")
        .collect()
    )
    terms = [freqs[0]["token"], freqs[len(freqs) // 2]["token"], freqs[-1]["token"]]

    brute = bm25_topk(eng.pages(), terms, k=15, id_col="url").collect()
    indexed = bm25_topk_indexed(idx, terms, k=15).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in brute]


def test_bm25_indexed_precomputed_stats_and_staleness(spark, tmp_path):
    from clinvar_ingest_spark.functions.text import token_count
    from clinvar_ingest_spark.operators.ranking import bm25_topk_indexed
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )
    import pytest as _pytest

    eng, idx = _text_engine_with_index(spark, tmp_path)
    term = idx.read().orderBy(F.desc(F.size("urls")), "token").first()["token"]

    st = eng.pages().agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(token_count(F.col("text"))).alias("a"),
    ).first()
    with_stats = bm25_topk_indexed(idx, [term], k=5, stats=(st["n"], st["a"])).collect()
    without = bm25_topk_indexed(idx, [term], k=5).collect()
    assert [tuple(r) for r in with_stats] == [tuple(r) for r in without]

    # staleness: advance the engine without refreshing the index
    extra = generate_changelog(ChangelogSpec(n_events=50, n_urls=80, seed=22))
    extra["seq"] = extra["seq"] + 600
    eng.replay(spark.createDataFrame(extra), batch_size=50)
    with _pytest.raises(ValueError, match="stale"):
        bm25_topk_indexed(idx, [term], k=5)


def test_fixture_token_model_matches_extraction():
    """The bm25_indexed_replay ORACLE models the extraction kernel's
    token stream from the fixed page template as
    [url] + body tokens + [self, index, footer, &, links] — assert the
    model token-exact against extract_text_series so template drift in
    the generator can never silently skew the oracle."""
    import re

    from clinvar_ingest_spark.functions.extract import extract_text_series
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )

    df = generate_changelog(ChangelogSpec(n_events=2000, n_urls=300, seed=42))
    df = df[df.html.notna()]
    text = extract_text_series(df.html)
    for (_, row), t in zip(df.iterrows(), text):
        body = re.search(rb"<p>(.*?)</p>", row.html, re.S).group(1).decode()
        body = re.sub(r"<[^>]*>", "", body)
        model = [row.url] + body.split() + ["self", "index", "footer", "&", "links"]
        assert t.split() == model


def test_doc_len_sql_equals_token_count(spark):
    """DOC_LEN_SQL (the AggViewSpec sum-measure mirror of token_count)
    must agree with the Column form on edge shapes (blank, multi-space,
    newline-separated)."""
    from clinvar_ingest_spark.functions.text import token_count
    from clinvar_ingest_spark.operators.ranking import DOC_LEN_SQL

    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one\ntwo\tthree four",), ("x",)],
        "text string",
    )
    bad = df.select(
        token_count(F.col("text")).alias("a"), F.expr(DOC_LEN_SQL).alias("b")
    ).filter(F.col("a") != F.col("b"))
    assert bad.count() == 0


def test_bm25_indexed_with_maintained_stats_view(spark, tmp_path):
    """corpus_stats_view: the (N, avgdl) constants come from the
    maintained global IVM row — scoring must equal brute force, and a
    stale view (engine advanced, view not refreshed) must raise."""
    from clinvar_ingest_spark.operators.ranking import (
        bm25_topk,
        bm25_topk_indexed,
        corpus_stats_view,
    )
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )

    eng, idx = _text_engine_with_index(spark, tmp_path)
    view = corpus_stats_view(eng, str(tmp_path / "stats"))
    view.refresh()

    terms = ["merge", "snapshot"]
    brute = [tuple(r) for r in bm25_topk(eng.pages(), terms, k=10, id_col="url").collect()]
    viewed = [
        tuple(r) for r in bm25_topk_indexed(idx, terms, k=10, stats_view=view).collect()
    ]
    assert viewed == brute

    extra = generate_changelog(ChangelogSpec(n_events=40, n_urls=80, seed=23))
    extra["seq"] = extra["seq"] + 600
    eng.replay(spark.createDataFrame(extra), batch_size=40)
    idx.refresh()  # index fresh, view stale -> must still raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stats_view is stale"):
        bm25_topk_indexed(idx, terms, k=5, stats_view=view)
    view.refresh()
    again = bm25_topk_indexed(idx, terms, k=10, stats_view=view)
    brute2 = bm25_topk(eng.pages(), terms, k=10, id_col="url")
    assert [tuple(r) for r in again.collect()] == [tuple(r) for r in brute2.collect()]
