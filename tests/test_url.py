"""Canonical-URL ruleset (functions/url.py): unit cases per rule, the
must-not-touch cases, and the messy/clean collapse invariant the
canonical_url_dedup entry asserts."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.url import canonical_url

CASES = [
    # (input, expected)
    # rule 1: fragment
    ("https://a.com/x#frag", "https://a.com/x"),
    ("https://a.com/x#", "https://a.com/x"),
    # rule 2: scheme+authority lowercased, path case preserved
    ("HTTPS://WWW.A.COM/Path/X", "https://www.a.com/Path/X"),
    # rule 3: default port for the matching scheme only
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    ("http://a.com:443/x", "http://a.com:443/x"),
    # rule 4: tracking params out, real params kept in order
    ("https://a.com/x?utm_source=f", "https://a.com/x"),
    ("https://a.com/x?utm_source=f&page=2", "https://a.com/x?page=2"),
    ("https://a.com/x?page=2&utm_source=f", "https://a.com/x?page=2"),
    ("https://a.com/x?a=1&gclid=g&b=2", "https://a.com/x?a=1&b=2"),
    ("https://a.com/x?utm_a=1&utm_b=2", "https://a.com/x"),
    ("https://a.com/x?fbclid=z", "https://a.com/x"),
    # rule 4 anchoring: a param whose NAME merely contains a tracking
    # name is NOT a tracking param (regression: the unanchored strip
    # turned ?xgclid=2&b=3 into ?xb=3, merging distinct pages)
    ("https://a.com/x?xgclid=2&b=3", "https://a.com/x?xgclid=2&b=3"),
    ("https://a.com/x?custom_utm_source=1", "https://a.com/x?custom_utm_source=1"),
    ("https://a.com/x?a=1&xfbclid=9", "https://a.com/x?a=1&xfbclid=9"),
    # rule 4 runs: consecutive tracking params vanish wherever they sit
    ("https://a.com/x?utm_a=1&gclid=2&page=3", "https://a.com/x?page=3"),
    ("https://a.com/x?a=1&utm_b=2&fbclid=3&b=4", "https://a.com/x?a=1&b=4"),
    ("https://a.com/x?a=1&utm_b=2&utm_c=3", "https://a.com/x?a=1"),
    ("https://a.com/x?xgclid=7&gclid=z&utm_m=a&b=2", "https://a.com/x?xgclid=7&b=2"),
    # rule 5: trailing slash off a non-root path; empty path -> '/'
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/x///", "https://a.com/x"),
    ("https://a.com/", "https://a.com/"),
    ("https://a.com", "https://a.com/"),
    # combinations
    ("HTTPS://A.COM:443/Doc/5/?gclid=zz#s2", "https://a.com/Doc/5"),
    # must-not-touch: percent-encoding, param order, www
    ("https://a.com/x%2Fy?b=2&a=1", "https://a.com/x%2Fy?b=2&a=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: got {got[i]!r}, want {want!r}"


def test_canonical_url_is_idempotent(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in CASES], "url string"
    ).select(canonical_url(F.col("url")).alias("c1"))
    twice = df.select("c1", canonical_url(F.col("c1")).alias("c2"))
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_entry_collapse_invariant(spark):
    """Every canonical key in the entry query groups exactly its two
    spellings (messy + clean) of one document."""
    import __spark_entry__ as entry

    out = entry.queries()["canonical_url_dedup"](spark, "/root/testdata/sf0.001")
    bad = out.filter(F.col("n_variants") != 2).count()
    assert bad == 0
    # and keys are unique per doc: row count == documents count
    ndocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert out.count() == ndocs


def test_canonicalized_messy_changelog_replays_to_identical_state(spark, tmp_path):
    """The north-rule integration: key-partitioned MERGE on url is only
    correct if equivalent spellings hash to one key. Perturb every
    event's url with a deterministic messy spelling (uppercase
    authority / fragment / utm param / trailing slash by seq%4),
    canonicalize in front of the engine, and the replayed table must be
    bit-identical (state_hash incl. tombstones) to replaying the clean
    changelog."""
    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
    )

    cl = spark.createDataFrame(
        generate_changelog(ChangelogSpec(n_events=300, n_urls=50, seed=31))
    )
    head = F.regexp_extract(F.col("url"), r"^(https://[^/]+)", 1)
    rest = F.substring(F.col("url"), F.length(head) + 1, F.lit(2**30))
    mod = F.pmod(F.col("seq"), F.lit(4))
    messy = (
        F.when(mod == 0, F.concat(F.upper(head), F.lit(":443"), rest))
        .when(mod == 1, F.concat(F.col("url"), F.lit("#frag")))
        .when(mod == 2, F.concat(F.col("url"), F.lit("?utm_source=x")))
        .otherwise(F.concat(F.col("url"), F.lit("/")))
    )
    messy_cl = cl.withColumn("url", messy)

    # spelling-level sanity: canonical(messy) == original for every row
    diff = (
        messy_cl.select("seq", canonical_url(F.col("url")).alias("c"))
        .join(cl.select("seq", "url"), "seq")
        .filter(F.col("c") != F.col("url"))
        .count()
    )
    assert diff == 0

    eng_clean = CdcEngine(spark, str(tmp_path / "clean"), n_buckets=8)
    eng_clean.replay(cl, batch_size=150)
    eng_canon = CdcEngine(spark, str(tmp_path / "canon"), n_buckets=8)
    eng_canon.replay(
        messy_cl.withColumn("url", canonical_url(F.col("url"))), batch_size=150
    )
    assert eng_canon.state_hash(include_tombstones=True) == eng_clean.state_hash(
        include_tombstones=True
    )
