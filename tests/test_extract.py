"""Golden-byte tests for the HTML→text extractor (input_hint invariant:
byte-identical extracted text per url). Modeled on the reference's
golden-struct parser tests (SCVSpec.scala:21-130)."""

import pandas as pd

from clinvar_ingest_spark.functions.extract import (
    extract_text_series,
    extract_text_str,
)

GOLDENS = [
    (
        '<html lang="en"><head><title>t</title><script>var x=1;</script>'
        "<style>p{color:red}</style></head><body><!-- c --><h1>Hello</h1>"
        "<p>world &amp; friends</p><div>footer</div></body></html>",
        "Hello\nworld & friends\nfooter",
    ),
    ("<p>a</p><p>b</p>", "a\nb"),
    ("no tags at all", "no tags at all"),
    ("<b>bold</b> and <i>italic</i>", "bold and italic"),
    ("&lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;x", '<tag> "q" \'s\' x'),
    ("<script>alert('<p>hi</p>')</script>done", "done"),
    ("  <div>  spaced   out  </div>  ", "spaced out"),
    ("&amp;lt;", "&lt;"),  # no double-decode
]


def test_goldens_str():
    for html, want in GOLDENS:
        assert extract_text_str(html) == want, html


def test_series_matches_scalar_and_handles_bytes_nulls():
    htmls = [g[0] for g in GOLDENS]
    s = pd.Series([h.encode() for h in htmls] + [None, b""])
    out = extract_text_series(s)
    for i, (_, want) in enumerate(GOLDENS):
        assert out.iloc[i] == want
    assert out.iloc[len(GOLDENS)] is None
    assert out.iloc[len(GOLDENS) + 1] == ""


def test_deterministic_repeat():
    s = pd.Series([GOLDENS[0][0]] * 100)
    a = extract_text_series(s)
    b = extract_text_series(s)
    assert (a == b).all()


def test_jvm_expr_matches_python_kernel_edge_cases(spark):
    """Round-3 A/B: the codegen'd regexp-chain variant is
    byte-identical to the Python determinism-reference kernel on
    entity ordering, block tags, comments, and NULLs."""
    from pyspark.sql import functions as F

    from clinvar_ingest_spark.functions.extract import (
        extract_text_expr,
        extract_text_str,
        extract_text_udf,
    )

    cases = [
        b"<html><head><title>x</title></head><body><p>a</p><p>b</p></body></html>",
        b"a &amp;lt; b &nbsp;&quot;c&quot; &apos;d&apos; &amp; e",
        b"<div>x<!-- comment <p>hidden</p> -->y</div>",
        b"<SCRIPT>var x=1;</script>text<style>.a{}</STYLE>",
        b"line1<br><br><br>line2\n\n\nline3",
        b"  \t leading and trailing \n ",
        b"",
        None,
        b"plain text no tags",
        b"<p>unicode \xc3\xa9\xc3\xa0</p>",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, html binary"
    )
    rows = df.select(
        "i",
        extract_text_udf(F.col("html")).alias("py"),
        extract_text_expr(F.col("html")).alias("jvm"),
    ).collect()
    for r in rows:
        assert r["py"] == r["jvm"], f"case {r['i']}: {r['py']!r} != {r['jvm']!r}"
    # and both agree with the single-string reference
    for r in rows:
        want = (
            None
            if cases[r["i"]] is None
            else extract_text_str(cases[r["i"]].decode("utf-8", "replace"))
        )
        assert r["py"] == want


def test_jvm_kernel_engine_state_hash_identical(spark, tmp_path):
    """Same changelog through strategy='join' with both extraction
    kernels: bit-identical table state (the A/B acceptance gate)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clinvar_ingest_spark.engine import CdcEngine
    from clinvar_ingest_spark.sources.changelog import (
        ChangelogSpec,
        changelog_arrow_schema,
        generate_changelog,
    )

    pdf = generate_changelog(ChangelogSpec(n_events=800, n_urls=150, seed=19))
    p = str(tmp_path / "cl.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    cl = spark.read.parquet(p)
    a = CdcEngine(spark, str(tmp_path / "py"), n_buckets=8, strategy="join")
    b = CdcEngine(
        spark, str(tmp_path / "jvm"), n_buckets=8, strategy="join",
        extract_kernel="jvm",
    )
    a.replay(cl, batch_size=400)
    b.replay(cl, batch_size=400)
    assert a.state_hash() == b.state_hash()
    assert a.state_hash(include_tombstones=True) == b.state_hash(
        include_tombstones=True
    )
