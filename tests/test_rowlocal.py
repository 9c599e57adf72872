"""Row-local nested-document kernels vs the reference's test ladder
(SCVTraitSetSpec.scala:94-209 precedence cases; TraitMetadataSpec
splitting; Interpretation attribute pop; VariationDescendantsSpec)."""

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators import rowlocal as rl

ITEM = "array<struct<id:string,name:string,xrefs:array<string>>>"
TARGET = (
    "array<struct<id:string,preferred_name:string,"
    "alternate_names:array<string>,xrefs:array<string>>>"
)


def _match(spark, items, targets):
    df = spark.createDataFrame(
        [(items, targets)], f"items {ITEM}, targets {TARGET}"
    )
    row = rl.match_with_precedence(df).collect()[0]["matches"]
    return [(m["item_id"], m["target_id"], m["match_type"]) for m in row]


T1 = ("t1", "Asthma", ["alt a"], ["medgen:C1"])
T2 = ("t2", "Cancer", ["alt b"], ["omim:2", "mesh:9"])


def test_direct_id_match(spark):
    # SCVTraitSetSpec.scala:94 (direct MedGen id)
    got = _match(spark, [("t2", None, None)], [T1, T2])
    assert got == [("t2", "t2", "direct")]


def test_xref_intersect_match(spark):
    # SCVTraitSetSpec.scala:104 (direct XRef)
    got = _match(spark, [(None, None, ["mesh:9"])], [T1, T2])
    assert got == [(None, "t2", "xref")]


def test_preferred_name_match(spark):
    # SCVTraitSetSpec.scala:116
    got = _match(spark, [(None, "Asthma", None)], [T1, T2])
    assert got == [(None, "t1", "preferred")]


def test_alternate_name_match(spark):
    # SCVTraitSetSpec.scala:147
    got = _match(spark, [(None, "alt b", None)], [T1, T2])
    assert got == [(None, "t2", "alternate")]


def test_no_match(spark):
    got = _match(spark, [(None, "Unknown", ["nope:0"])], [T1, T2])
    assert got == [(None, None, None)]


def test_precedence_direct_beats_everything(spark):
    # item would match t2 by name/xref, but t1 by id — id rung wins
    item = ("t1", "Cancer", ["mesh:9"])
    got = _match(spark, [item], [T1, T2])
    assert got == [("t1", "t1", "direct")]


def test_precedence_xref_beats_names(spark):
    item = (None, "Asthma", ["omim:2"])  # name → t1, xref → t2
    got = _match(spark, [item], [T1, T2])
    assert got == [(None, "t2", "xref")]


def test_link_by_set_equality(spark):
    # VCV.scala:238-257: RCV condition set ↔ trait-set membership
    targets = [("s1", ["a", "b"]), ("s2", ["a", "b", "c"])]
    df = spark.createDataFrame(
        [(["b", "a", "b"], targets), (["c"], targets)],
        "want_ids array<string>, targets array<struct<id:string,member_ids:array<string>>>",
    )
    got = [r["linked_id"] for r in rl.link_by_set_equality(df).collect()]
    assert got == ["s1", None]


NAMES = "names array<struct<value:string,type:string>>"


def test_split_preferred_alternates(spark):
    df = spark.createDataFrame(
        [([("zeta", "Alternate"), ("Asthma", "Preferred"), ("alpha", "Alternate")],)],
        NAMES,
    )
    row = rl.split_preferred_alternates(df).collect()[0]
    assert row["preferred"] == "Asthma"
    assert row["alternates"] == ["alpha", "zeta"]  # sorted (W3 determinism)


def test_split_duplicate_preferred_raises_in_strict(spark):
    df = spark.createDataFrame(
        [([("A", "Preferred"), ("B", "Preferred")],)], NAMES
    )
    with pytest.raises(Exception, match="duplicate Preferred"):
        rl.split_preferred_alternates(df, strict=True).collect()
    row = rl.split_preferred_alternates(df, strict=False).collect()[0]
    assert row["preferred"] == "A" and row["dup_preferred"] is True


ATTRS = "attrs array<struct<type:string,value:string>>"


def test_pop_attribute_with_residue(spark):
    df = spark.createDataFrame(
        [([("ModeOfInheritance", "AD"), ("Comment", "x"), ("Comment", "y")],)], ATTRS
    )
    row = rl.pop_attribute(df, "attrs", "ModeOfInheritance", out_col="moi").collect()[0]
    assert row["moi"] == "AD"
    # residue keeps order, popped type gone (index compaction)
    assert [(a["type"], a["value"]) for a in row["attrs"]] == [
        ("Comment", "x"), ("Comment", "y"),
    ]
    row2 = rl.pop_attributes(df, "attrs", "Comment", out_col="comments").collect()[0]
    assert row2["comments"] == ["x", "y"]
    assert [a["type"] for a in row2["attrs"]] == ["ModeOfInheritance"]


def test_tree_descendants(spark):
    import json

    tree = {
        "id": "root",
        "children": [
            {"id": "h1", "children": [{"id": "a2"}, {"id": "a1"}]},
            {"id": "g1", "children": [{"id": "h2", "children": [{"id": "a3"}]}]},
        ],
    }
    df = spark.createDataFrame([(json.dumps(tree),), (None,)], "tree string")
    rows = rl.tree_descendants(df, "tree").collect()
    got = rows[0]["descendants"]
    assert got["child_ids"] == ["g1", "h1"]
    assert got["descendant_ids"] == ["a1", "a2", "a3", "g1", "h1", "h2"]
    assert rows[1]["descendants"]["child_ids"] is None
