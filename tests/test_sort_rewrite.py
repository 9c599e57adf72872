"""Sorted (clustered) rewrite: logically-empty commit, physically
ordered files, tight non-overlapping row-group stats (the pruning
evidence), Z-order interleave correctness."""

import math
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.engine import CdcEngine
from clinvar_ingest_spark.functions.zorder import column_bounds, zorder_key
from clinvar_ingest_spark.lakelet.maintenance import sort_rewrite
from clinvar_ingest_spark.sources.changelog import (
    ChangelogSpec,
    changelog_arrow_schema,
    generate_changelog,
)


@pytest.fixture()
def setup(spark, tmp_path):
    import pyarrow as pa

    pdf = generate_changelog(ChangelogSpec(n_events=1600, n_urls=250, seed=17))
    p = str(tmp_path / "cl.parquet")
    pa.parquet.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4)
    eng.replay(spark.read.parquet(p), batch_size=400)
    return eng


def _data_files(table):
    m = table.manifest()
    return [os.path.join(table.root, f.path) for f in m.files]


def test_zorder_key_matches_python_morton(spark):
    """The JVM bit-interleave must equal a Python Morton reference using
    the identical rank formula (same IEEE double ops)."""
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    bounds = {"x": (0.0, 15.0), "y": (0.0, 15.0)}
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key(df, ["x", "y"], bits=4, bounds=bounds)
        ).collect()
    }

    def rank(v, lo, hi):
        r = math.floor(((v - lo) / (hi - lo)) * 15.0)
        return min(max(r, 0), 15)

    def morton(x, y):
        rx, ry = rank(x, 0.0, 15.0), rank(y, 0.0, 15.0)
        out = 0
        for b in range(4):
            out |= ((rx >> b) & 1) << (2 * b)
            out |= ((ry >> b) & 1) << (2 * b + 1)
        return out

    assert got == {(x, y): morton(x, y) for x, y in rows}
    # bijective on the exact grid → a true space-filling curve ordering
    assert len(set(got.values())) == 256


def test_column_bounds_and_null_rank(spark):
    df = spark.createDataFrame(
        [(1, None), (5, 2.5), (3, 7.5)], "a int, b double"
    )
    b = column_bounds(df, ["a", "b"])
    assert b["a"] == (1.0, 5.0) and b["b"] == (2.5, 7.5)
    # NULL ranks 0 (sorts first), degenerate span ranks 0
    z = df.withColumn("z", zorder_key(df, ["b"], bits=8, bounds=b)).collect()
    byb = {r["a"]: r["z"] for r in z}
    assert byb[1] == 0  # NULL
    assert byb[5] == 0  # min of span
    assert byb[3] == 255  # max of span


def test_sort_rewrite_preserves_state_and_orders_files(spark, setup):
    eng = setup
    h = eng.state_hash()
    pre_sid = eng.table.current_snapshot_id()
    pre_rows = eng.pages().count()

    sid = sort_rewrite(spark, eng.table, by=["warc_ts"])
    assert eng.state_hash() == h  # logically empty commit
    assert eng.pages().count() == pre_rows
    # idempotent by deterministic snapshot id
    assert sort_rewrite(spark, eng.table, by=["warc_ts"]) == sid
    # time travel across the boundary still works
    assert eng.pages(pre_sid).count() == pre_rows

    # every bucket file is physically non-decreasing in warc_ts
    for fp in _data_files(eng.table):
        ts = pq.read_table(fp, columns=["warc_ts"])["warc_ts"].to_pylist()
        assert ts == sorted(ts), fp


def test_sort_rewrite_zorder_orders_by_interleave(spark, setup):
    eng = setup
    h = eng.state_hash()
    sort_rewrite(spark, eng.table, by=["warc_ts", "_seq"], zorder=True, bits=16)
    assert eng.state_hash() == h

    # recompute the key over each written file: must be non-decreasing
    full = eng.read()
    bounds = column_bounds(full, ["warc_ts", "_seq"])
    for fp in _data_files(eng.table):
        df = spark.read.parquet(fp)
        z = [
            r["z"]
            for r in df.select(
                zorder_key(df, ["warc_ts", "_seq"], bits=16, bounds=bounds).alias(
                    "z"
                )
            ).collect()
        ]
        assert z == sorted(z), fp


def test_maintain_cli_sort_by(spark, setup, capsys):
    """jobs/maintain.py --sort-by drives the rewrite and reports an
    unchanged state hash (in-process: getOrCreate reuses the session)."""
    import json

    from jobs.maintain import main

    eng = setup
    rc = main(
        [
            "--table",
            eng.table.root,
            "--sort-by",
            "warc_ts,_seq",
            "--zorder",
            "--master",
            "local[4]",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["state_hash_unchanged"]
    assert eng.table.manifest().summary["sort_order"] == "z:warc_ts,_seq:bits=16"


def test_sort_rewrite_tightens_rowgroup_stats(spark, tmp_path):
    """The pruning evidence: force multi-row-group files (tiny
    parquet.block.size), then show the sorted rewrite turns heavily
    overlapping per-row-group warc_ts ranges into pairwise
    NON-overlapping ones — exactly the property row-group skipping
    needs for a range predicate to drop most of each file."""
    import pyarrow as pa

    # a corpus big enough that each of the 4 buckets holds several
    # hundred live rows (parquet only checks row-group size after 100
    # buffered rows — tiny buckets would never split)
    pdf = generate_changelog(ChangelogSpec(n_events=6000, n_urls=2400, seed=23))
    p = str(tmp_path / "cl_big.parquet")
    pa.parquet.write_table(
        pa.Table.from_pandas(
            pdf, schema=changelog_arrow_schema(), preserve_index=False
        ),
        p,
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    old_page = hconf.get("parquet.page.size")
    old_check = hconf.get("parquet.block.size.row.check.min")
    hconf.setInt("parquet.block.size", 16 * 1024)
    hconf.setInt("parquet.page.size", 4 * 1024)
    hconf.setInt("parquet.block.size.row.check.min", 20)
    eng = CdcEngine(spark, str(tmp_path / "t_big"), n_buckets=4)
    eng.replay(spark.read.parquet(p), batch_size=6000)
    try:
        def rg_ranges(fp):
            md = pq.ParquetFile(fp).metadata
            ci = next(
                i
                for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "warc_ts"
            )
            out = []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                out.append((st.min, st.max))
            return out

        def overlaps(ranges):
            n = 0
            for i in range(len(ranges)):
                for j in range(i + 1, len(ranges)):
                    lo = max(ranges[i][0], ranges[j][0])
                    hi = min(ranges[i][1], ranges[j][1])
                    n += lo <= hi
            return n

        files = _data_files(eng.table)
        pre = [rg_ranges(fp) for fp in files]
        assert sum(len(r) for r in pre) > len(files), "need multi-RG files"
        assert sum(overlaps(r) for r in pre) > 0, "unsorted RGs must overlap"

        h = eng.state_hash()
        sort_rewrite(spark, eng.table, by=["warc_ts"])
        assert eng.state_hash() == h
        post = [rg_ranges(fp) for fp in _data_files(eng.table)]
        assert sum(len(r) for r in post) > len(post)
        # sorted ⇒ zero overlapping row-group ranges in every file
        assert sum(overlaps(r) for r in post) == 0
    finally:
        for key, val in (
            ("parquet.block.size", old_block),
            ("parquet.page.size", old_page),
            ("parquet.block.size.row.check.min", old_check),
        ):
            if val is None:
                hconf.unset(key)
            else:
                hconf.set(key, val)
