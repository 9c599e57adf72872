"""Diff classification vs the reference's created/updated/deleted
semantics (docker/diff/diff.py:117-182), incl. the NULL-safe fix."""

import pytest

from clinvar_ingest_spark.operators.diff import (
    created_rows,
    deleted_rows,
    diff_all,
    updated_rows,
)

COLS = ["id", "val", "tag"]


@pytest.fixture()
def states(spark):
    old = spark.createDataFrame(
        [(1, "a", "t1"), (2, "b", None), (3, "c", "t3"), (4, "d", "t4")], COLS
    )
    new = spark.createDataFrame(
        [
            (1, "a", "t1"),      # unchanged
            (2, "b", "t2"),      # NULL→value (only null-safe sees it)
            (3, "c2", "t3"),     # value change
            (5, "e", "t5"),      # created
        ],
        COLS,
    )
    return old, new


def test_created(states):
    old, new = states
    assert {r["id"] for r in created_rows(new, old, ["id"]).collect()} == {5}


def test_deleted(states):
    old, new = states
    assert {r["id"] for r in deleted_rows(new, old, ["id"]).collect()} == {4}


def test_updated_null_safe(states):
    old, new = states
    assert {r["id"] for r in updated_rows(new, old, ["id"]).collect()} == {2, 3}


def test_updated_reference_parity_drops_null_flips(states):
    old, new = states
    # bug-for-bug reference mode: BigQuery `!=` is NULL-blind (diff.py:148-152)
    got = {r["id"] for r in updated_rows(new, old, ["id"], null_safe=False).collect()}
    assert got == {3}


def test_diff_all_single_join(states):
    old, new = states
    out = {(r["id"], r["_change"]) for r in diff_all(new, old, ["id"]).collect()}
    assert out == {(5, "created"), (4, "deleted"), (2, "updated"), (3, "updated")}


def test_diff_all_array_columns(spark):
    old = spark.createDataFrame([(1, ["x", "y"]), (2, ["a"])], ["id", "arr"])
    new = spark.createDataFrame([(1, ["x", "y"]), (2, ["a", "b"])], ["id", "arr"])
    out = {(r["id"], r["_change"]) for r in diff_all(new, old, ["id"]).collect()}
    assert out == {(2, "updated")}


def test_diff_all_composite_keys(spark):
    # composite PKs per reference diff.py:122-129 (gene_association etc.)
    old = spark.createDataFrame([(1, 10, "a"), (1, 11, "b")], ["k1", "k2", "v"])
    new = spark.createDataFrame([(1, 10, "a2"), (2, 10, "c")], ["k1", "k2", "v"])
    out = {
        (r["k1"], r["k2"], r["_change"])
        for r in diff_all(new, old, ["k1", "k2"]).collect()
    }
    assert out == {(1, 10, "updated"), (1, 11, "deleted"), (2, 10, "created")}
