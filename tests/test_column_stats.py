"""Generic per-column file stats: Iceberg column-stats file skipping.

Tables declare ``stats_cols``; promote records each file's [min,max]
footer bounds for them; ``read(where_between={col: (lo, hi)})`` prunes
files whose bounds can't overlap — BEFORE Spark plans the scan. The
prune is advisory (kept files may hold out-of-range rows), so callers
keep their row filter; combined with a sorted rewrite and a file-size
split, a range scan touches a fraction of each bucket's files.
"""

from __future__ import annotations

import pytest

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.lakelet.maintenance import sort_rewrite
from clinvar_ingest_spark.lakelet.table import select_files
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    generate_changelog,
    write_changelog_parquet,
)


@pytest.fixture(scope="module")
def table_with_stats(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("colstats")
    p = str(d / "cl.parquet")
    write_changelog_parquet(
        generate_changelog(ChangelogSpec(n_events=3000, n_urls=800, seed=23)), p
    )
    cl = spark.read.parquet(p)
    eng = CdcEngine(
        spark, str(d / "t"), n_buckets=4, max_records_per_file=60
    )
    eng.table.set_stats_cols(["lang"])
    eng.replay(cl, batch_size=3000)
    # cluster rows by lang so the split files carry narrow lang ranges
    sort_rewrite(spark, eng.table, by=["lang", "url"])
    return eng


def test_stats_recorded_and_pruning_sound(spark, table_with_stats):
    eng = table_with_stats
    m = eng.table.manifest()
    with_stats = [f for f in m.files if (f.col_stats or {}).get("lang")]
    assert with_stats, "no files carry lang bounds"
    # pick a lang present in the data
    lang = eng.live().select("lang").first()["lang"]
    kept = select_files(m.files, where_between={"lang": (lang, lang)})
    assert len(kept) < len(m.files), "range scan pruned nothing"
    # soundness: the pruned read returns EXACTLY the full read's rows
    # for that range once the row filter is applied
    got = (
        eng.table.read(spark, where_between={"lang": (lang, lang)})
        .filter(f"lang = '{lang}'")
        .count()
    )
    want = eng.table.read(spark).filter(f"lang = '{lang}'").count()
    assert got == want > 0


def test_unbounded_and_unknown_columns_never_prune(spark, table_with_stats):
    eng = table_with_stats
    m = eng.table.manifest()
    assert select_files(
        m.files, where_between={"nosuchcol": ("a", "z")}
    ) == list(m.files)
    assert select_files(
        m.files, where_between={"lang": (None, None)}
    ) == list(m.files)


def test_stats_survive_spec_grow(spark, table_with_stats):
    eng = table_with_stats
    eng.table.grow_buckets(16)
    m = eng.table.manifest()
    assert any((f.col_stats or {}).get("lang") for f in m.files)
    lang = eng.live().select("lang").first()["lang"]
    got = (
        eng.table.read(spark, where_between={"lang": (lang, lang)})
        .filter(f"lang = '{lang}'")
        .count()
    )
    want = eng.table.read(spark).filter(f"lang = '{lang}'").count()
    assert got == want
