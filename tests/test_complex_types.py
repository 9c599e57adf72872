"""Complex payload column types (round 3): array<string> and
array<struct<...>> as first-class lakelet columns — declarable,
mergeable, evolvable (incl. NESTED field rename/add by col-id), and
diffable. Reference parity: every reference table carries these
("type":"repeated" string arrays in variation.table.json; xrefs
ARRAY<STRUCT> per jade-structs/xref.struct.json:1-29).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinvar_ingest_spark.lakelet.manifest import ColumnSpec
from clinvar_ingest_spark.lakelet.table import LakeletTable, bucket_expr, spark_schema
from clinvar_ingest_spark.operators.merge import merge_apply

ENTITY_COLS = [
    ColumnSpec(1, "url", "string"),
    ColumnSpec(2, "warc_ts", "timestamp"),
    ColumnSpec(3, "tags", "array<string>"),
    ColumnSpec(
        4, "xrefs", "array<struct>",
        fields=[ColumnSpec(5, "db", "string"), ColumnSpec(6, "xid", "string")],
    ),
    ColumnSpec(7, "score", "int"),
    ColumnSpec(8, "_seq", "long"),
    ColumnSpec(9, "_deleted", "boolean"),
]

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "xrefs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("db", T.StringType()),
                        T.StructField("xid", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("score", T.IntegerType()),
    ]
)


def _ts(h):
    return dt.datetime(2024, 6, 1, h, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(rows, schema=BATCH_SCHEMA)


@pytest.fixture()
def table(tmp_path):
    return LakeletTable.create(
        str(tmp_path / "ent"), ENTITY_COLS, n_buckets=4, key_col="url"
    )


def test_schema_roundtrip_and_commit(spark, table):
    st = spark_schema(table.manifest().columns)
    assert st["xrefs"].dataType == T.ArrayType(
        T.StructType(
            [
                T.StructField("db", T.StringType()),
                T.StructField("xid", T.StringType()),
            ]
        )
    )
    b = _batch(
        spark,
        [
            (1, "insert", "u1", _ts(1), ["a", "b"], [("db1", "x1")], 10),
            (2, "insert", "u2", _ts(1), [], None, None),
        ],
    )
    merge_apply(spark, table, b, "b0")
    rows = {r["url"]: r for r in table.read(spark).collect()}
    assert rows["u1"]["tags"] == ["a", "b"]
    assert [x.asDict() for x in rows["u1"]["xrefs"]] == [{"db": "db1", "xid": "x1"}]
    assert rows["u2"]["tags"] == [] and rows["u2"]["xrefs"] is None


def test_merge_lww_and_delete_with_arrays(spark, table):
    merge_apply(
        spark, table,
        _batch(spark, [
            (1, "insert", "u1", _ts(1), ["a"], [("d", "1")], 1),
            (2, "insert", "u2", _ts(1), ["b"], [("d", "2")], 2),
        ]),
        "b0",
    )
    merge_apply(
        spark, table,
        _batch(spark, [
            (3, "update", "u1", _ts(2), ["a", "a2"], [("d", "1"), ("e", "9")], 5),
            (4, "delete", "u2", _ts(2), None, None, None),
            (5, "update", "u1", _ts(0), ["stale"], None, 0),  # late: loses LWW
        ]),
        "b1",
    )
    live = {r["url"]: r for r in table.read(spark).filter("NOT _deleted").collect()}
    assert set(live) == {"u1"}
    assert live["u1"]["tags"] == ["a", "a2"]
    assert [x.asDict() for x in live["u1"]["xrefs"]] == [
        {"db": "d", "xid": "1"},
        {"db": "e", "xid": "9"},
    ]
    assert live["u1"]["score"] == 5


def test_nested_evolution_rename_add_widen(spark, table):
    merge_apply(
        spark, table,
        _batch(spark, [(1, "insert", "u1", _ts(1), ["a"], [("d", "1")], 7)]),
        "b0",
    )
    v1 = table.current_snapshot_id()

    # nested rename + nested add + top-level widen + new array column:
    # ALL metadata-only (file set identical before/after)
    files_before = [f.path for f in table.manifest().files]
    table.rename_column("xrefs.xid", "ref_id")
    table.add_field("xrefs", "note", "string")
    table.widen_column("score", "long")
    table.add_column("extra_tags", "array<string>")
    assert [f.path for f in table.manifest().files] == files_before

    # old files read through the nested col-id mapping
    r = table.read(spark).collect()[0]
    assert [x.asDict() for x in r["xrefs"]] == [{"db": "d", "ref_id": "1", "note": None}]
    assert r["score"] == 7 and isinstance(r["score"], int)
    assert r["extra_tags"] is None

    # a batch still speaking the OLD nested shape (xid) lands correctly
    merge_apply(
        spark, table,
        _batch(spark, [
            (2, "update", "u1", _ts(2), ["z"], [("d", "2"), ("e", "3")], 9),
            (3, "insert", "u2", _ts(2), ["w"], [("f", "4")], 1),
        ]),
        "b1",
    )
    rows = {r["url"]: r for r in table.read(spark).collect()}
    assert [x.asDict() for x in rows["u1"]["xrefs"]] == [
        {"db": "d", "ref_id": "2", "note": None},
        {"db": "e", "ref_id": "3", "note": None},
    ]
    assert [x.asDict() for x in rows["u2"]["xrefs"]] == [{"db": "f", "ref_id": "4", "note": None}]

    # time travel: the pre-evolution snapshot still presents its OWN schema
    old = table.read(spark, snapshot_id=v1).collect()[0]
    assert [x.asDict() for x in old["xrefs"]] == [{"db": "d", "xid": "1"}]


def test_diff_across_nested_rename_reports_no_phantom_updates(spark, table):
    """A pure nested rename must not classify every row as updated."""
    from clinvar_ingest_spark.operators.diff import diff_all
    from clinvar_ingest_spark.lakelet.table import align_select

    merge_apply(
        spark, table,
        _batch(spark, [
            (1, "insert", "u1", _ts(1), ["a"], [("d", "1")], 1),
            (2, "insert", "u2", _ts(1), ["b"], [("d", "2")], 2),
        ]),
        "b0",
    )
    old_sid = table.current_snapshot_id()
    old_m = table.manifest(old_sid)
    table.rename_column("xrefs.xid", "ref_id")
    merge_apply(
        spark, table,
        _batch(spark, [(3, "update", "u2", _ts(2), ["b2"], [("d", "2")], 2)]),
        "b1",
    )
    new_m = table.manifest()

    live = "NOT coalesce(_deleted, false)"
    old_df = (
        table.read(spark, old_sid)
        .select(*align_select(old_m.columns, new_m.columns))
        .filter(live)
        .drop("_seq", "_deleted")
    )
    new_df = table.read(spark).filter(live).drop("_seq", "_deleted")
    d = {(r["url"], r["_change"]) for r in diff_all(new_df, old_df, ["url"]).collect()}
    assert d == {("u2", "updated")}  # u1 untouched by the rename


def test_array_diff_and_export_json(spark, table, tmp_path):
    """Array columns flow through diff classification and a JSON export
    round trip (complex values serialize natively)."""
    from clinvar_ingest_spark.operators.diff import diff_all

    merge_apply(
        spark, table,
        _batch(spark, [
            (1, "insert", "u1", _ts(1), ["a"], [("d", "1")], 1),
            (2, "insert", "u2", _ts(1), ["b"], [("d", "2")], 2),
        ]),
        "b0",
    )
    old = table.read(spark).filter("NOT _deleted").drop("_seq", "_deleted")
    merge_apply(
        spark, table,
        _batch(spark, [
            (3, "update", "u1", _ts(2), ["a", "x"], [("d", "1")], 1),
            (4, "insert", "u3", _ts(2), None, [("g", "5")], 3),
        ]),
        "b1",
    )
    new = table.read(spark).filter("NOT _deleted").drop("_seq", "_deleted")
    d = diff_all(new, old, ["url"])
    got = {(r["url"], r["_change"]) for r in d.collect()}
    assert got == {("u1", "updated"), ("u3", "created")}

    out = str(tmp_path / "export")
    d.withColumnRenamed("_change", "change").write.mode("overwrite").partitionBy(
        "change"
    ).json(out)
    back = spark.read.json(out)
    assert back.count() == 2
    u1 = back.filter("url = 'u1'").collect()[0]
    assert sorted(u1["tags"]) == ["a", "x"]


def test_replay_convergence_with_arrays(spark, tmp_path):
    """Re-applying batches (idempotent snapshot ids) and a fresh replay
    both land on the identical state with array columns."""

    def run(root):
        t = LakeletTable.create(root, ENTITY_COLS, n_buckets=4, key_col="url")
        merge_apply(
            spark, t,
            _batch(spark, [
                (1, "insert", "u1", _ts(1), ["a"], [("d", "1")], 1),
                (2, "insert", "u2", _ts(1), ["b"], None, 2),
            ]),
            "b0",
        )
        merge_apply(
            spark, t,
            _batch(spark, [
                (3, "update", "u1", _ts(2), ["a2"], [("d", "9")], 4),
                (4, "delete", "u2", _ts(2), None, None, None),
            ]),
            "b1",
        )
        return t

    def content(t):
        return sorted(
            (
                r["url"], str(r["warc_ts"]), tuple(r["tags"] or []),
                str(r["xrefs"]), r["score"], r["_seq"], r["_deleted"],
            )
            for r in t.read(spark).collect()
        )

    t1 = run(str(tmp_path / "t1"))
    t2 = run(str(tmp_path / "t2"))
    assert content(t1) == content(t2)
    # re-deliver b1 on t1 (raw merge, no engine ledger): the LWW late-
    # event guard makes it a logical no-op — content is unchanged (the
    # engine's ledger/deterministic-sid layer additionally skips the
    # commit itself; tested in test_exactly_once.py)
    merge_apply(
        spark, t1,
        _batch(spark, [
            (3, "update", "u1", _ts(2), ["a2"], [("d", "9")], 4),
            (4, "delete", "u2", _ts(2), None, None, None),
        ]),
        "b1",
    )
    assert content(t1) == content(t2)


def test_cogroup_strategy_rejects_complex_types(spark, table):
    """The default cogroup merge cannot carry list/struct payloads
    through its Arrow hash join — it must fail with guidance, not die
    inside a worker."""
    from clinvar_ingest_spark.operators.merge_cogroup import (
        merge_apply_cogrouped,
    )

    b = _batch(spark, [(1, "insert", "u1", _ts(1), ["a"], [("d", "1")], 1)])
    with pytest.raises(ValueError, match="strategy='join'"):
        merge_apply_cogrouped(spark, table, b, "b0")


def test_array_element_widen(spark, tmp_path):
    """array<int> → array<long> is a metadata-only widen; old files
    read through an element cast."""
    from clinvar_ingest_spark.lakelet.table import LakeletTable

    cols = [
        ColumnSpec(1, "url", "string"),
        ColumnSpec(2, "warc_ts", "timestamp"),
        ColumnSpec(3, "nums", "array<int>"),
        ColumnSpec(4, "_seq", "long"),
        ColumnSpec(5, "_deleted", "boolean"),
    ]
    t = LakeletTable.create(str(tmp_path / "w"), cols, n_buckets=2, key_col="url")
    schema = (
        "seq long, op string, url string, warc_ts timestamp, nums array<int>"
    )
    b = spark.createDataFrame([(1, "insert", "u1", _ts(1), [1, 2])], schema)
    merge_apply(spark, t, b, "b0")
    t.widen_column("nums", "array<long>")
    r = t.read(spark).collect()[0]
    assert r["nums"] == [1, 2]
    assert dict(t.read(spark).dtypes)["nums"] == "array<bigint>"
    with pytest.raises(ValueError, match="illegal widen"):
        t.widen_column("nums", "array<string>")
