"""Row-local nested-document kernels — SURVEY.md §2.3 J6-J8 / §2.7 F7-F9.

The reference's per-archive parsers match, link, split, and pop nested
sub-documents entirely *within one row* (each VariationArchive is
self-contained, VCV.scala:49-55). The Spark-first expression of that is
higher-order column functions (``transform``/``filter``/``exists``)
over ``array<struct>`` columns — fully JVM-side, codegen'd, no shuffle
and no Python — except genuine unbounded recursion (descendant trees),
which runs as an Arrow-batched pandas kernel, the documented exception.

Kernels and their reference semantics:

- :func:`match_with_precedence` — SCVTraitSet.scala:107-164: match each
  item to a target by (1) direct id, (2) xref intersection,
  (3) preferred name, (4) alternate name; first rung wins.
- :func:`link_by_set_equality` — VCV.scala:238-257: find the target
  whose id-set equals the item's id-set (RCV ↔ trait-set linking).
- :func:`split_preferred_alternates` — TraitMetadata.scala:55-75: fold
  typed names into (preferred, sorted alternates); duplicate Preferred
  entries are an upstream data error (strict mode raises).
- :func:`pop_attribute` / :func:`pop_attributes` —
  Interpretation.scala:115-134: destructive typed-attribute extraction
  with residue compaction.
- :func:`tree_descendants` — VariationDescendants.scala:27-48 +
  Variation.scala:108-121: recursive child/descendant id collection
  over a nested tree.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _overlap(a: Column, b: Column) -> Column:
    """NULL-safe arrays_overlap (NULL/empty → false, like Scala's
    ``.toSet.intersect(...).nonEmpty`` on empty collections)."""
    return F.coalesce(F.arrays_overlap(a, b), F.lit(False))


def match_with_precedence(
    df: DataFrame,
    items_col: str = "items",
    targets_col: str = "targets",
    out_col: str = "matches",
) -> DataFrame:
    """Match every item in ``items_col`` against ``targets_col`` by the
    reference's fallback ladder (SCVTraitSet.scala:107-164):

    1. ``direct``   — target.id == item.id
    2. ``xref``     — target.xrefs ∩ item.xrefs ≠ ∅
    3. ``preferred``— target.preferred_name == item.name
    4. ``alternate``— item.name ∈ target.alternate_names
    5. no match     — match_type = NULL

    Expects ``items: array<struct<id, name, xrefs:array<string>>>`` and
    ``targets: array<struct<id, preferred_name,
    alternate_names:array<string>, xrefs:array<string>>>``. Appends
    ``out_col: array<struct<item_id, target_id, match_type>>``.
    Entirely row-local column expressions — zero shuffle.
    """
    items, targets = F.col(items_col), F.col(targets_col)

    def match_one(item: Column) -> Column:
        direct = F.filter(
            targets, lambda t: item["id"].isNotNull() & (t["id"] == item["id"])
        )
        xref = F.filter(targets, lambda t: _overlap(t["xrefs"], item["xrefs"]))
        pref = F.filter(
            targets,
            lambda t: item["name"].isNotNull()
            & (t["preferred_name"] == item["name"]),
        )
        alt = F.filter(
            targets,
            lambda t: F.coalesce(
                F.array_contains(t["alternate_names"], item["name"]), F.lit(False)
            ),
        )
        winner = F.coalesce(
            F.try_element_at(direct, F.lit(1)),
            F.try_element_at(xref, F.lit(1)),
            F.try_element_at(pref, F.lit(1)),
            F.try_element_at(alt, F.lit(1)),
        )
        match_type = (
            F.when(F.size(direct) > 0, F.lit("direct"))
            .when(F.size(xref) > 0, F.lit("xref"))
            .when(F.size(pref) > 0, F.lit("preferred"))
            .when(F.size(alt) > 0, F.lit("alternate"))
        )
        return F.struct(
            item["id"].alias("item_id"),
            winner["id"].alias("target_id"),
            match_type.alias("match_type"),
        )

    return df.withColumn(out_col, F.transform(items, match_one))


def link_by_set_equality(
    df: DataFrame,
    want_ids_col: str = "want_ids",
    targets_col: str = "targets",
    out_col: str = "linked_id",
) -> DataFrame:
    """VCV.scala:238-257: link to the target whose ``member_ids`` set
    equals the row's ``want_ids`` set (order/duplicate-insensitive).
    ``targets: array<struct<id, member_ids:array<string>>>``."""
    want = F.array_sort(F.array_distinct(F.col(want_ids_col)))
    hit = F.filter(
        F.col(targets_col),
        lambda t: F.array_sort(F.array_distinct(t["member_ids"])).eqNullSafe(want),
    )
    return df.withColumn(out_col, F.try_element_at(hit, F.lit(1))["id"])


def split_preferred_alternates(
    df: DataFrame,
    names_col: str = "names",
    strict: bool = True,
    prefix: str = "",
) -> DataFrame:
    """TraitMetadata.scala:55-75 (symbols variant
    Interpretation.scala:90-112): fold ``array<struct<value, type>>``
    into ``preferred`` (the unique type='Preferred' value) and sorted
    ``alternates``. The reference *errors* on a duplicate Preferred —
    ``strict=True`` mirrors that with raise_error; ``strict=False``
    keeps the first and flags ``<prefix>dup_preferred``."""
    names = F.col(names_col)
    prefs = F.filter(names, lambda n: n["type"] == "Preferred")
    preferred = F.try_element_at(prefs, F.lit(1))["value"]
    if strict:
        preferred = F.when(
            F.size(prefs) > 1,
            F.raise_error(
                F.concat(
                    F.lit("duplicate Preferred name: "), F.to_json(prefs)
                )
            ),
        ).otherwise(preferred)
    alternates = F.array_sort(
        F.transform(
            F.filter(names, lambda n: n["type"] != "Preferred"),
            lambda n: n["value"],
        )
    )
    out = df.withColumn(f"{prefix}preferred", preferred).withColumn(
        f"{prefix}alternates", alternates
    )
    if not strict:
        out = out.withColumn(f"{prefix}dup_preferred", F.size(prefs) > 1)
    return out


def pop_attribute(
    df: DataFrame,
    attrs_col: str,
    attr_type: str,
    out_col: str | None = None,
    residue_col: str | None = None,
) -> DataFrame:
    """Interpretation.scala:115-134 single-attribute pop: extract the
    value of the (unique) attribute with ``type == attr_type`` and drop
    it from the array (residue keeps original relative order — index
    compaction). ``attrs: array<struct<type, value>>``."""
    attrs = F.col(attrs_col)
    hit = F.filter(attrs, lambda a: a["type"] == attr_type)
    out = df.withColumn(
        out_col or attr_type, F.try_element_at(hit, F.lit(1))["value"]
    )
    return out.withColumn(
        residue_col or attrs_col,
        F.filter(attrs, lambda a: a["type"] != attr_type),
    )


def pop_attributes(
    df: DataFrame,
    attrs_col: str,
    attr_type: str,
    out_col: str | None = None,
    residue_col: str | None = None,
) -> DataFrame:
    """Repeated-attribute variant: all matching values (in order)."""
    attrs = F.col(attrs_col)
    out = df.withColumn(
        out_col or attr_type,
        F.transform(
            F.filter(attrs, lambda a: a["type"] == attr_type),
            lambda a: a["value"],
        ),
    )
    return out.withColumn(
        residue_col or attrs_col,
        F.filter(attrs, lambda a: a["type"] != attr_type),
    )


# ---------------------------------------------------------------- recursion

_DESC_SCHEMA = T.StructType(
    [
        T.StructField("child_ids", T.ArrayType(T.StringType())),
        T.StructField("descendant_ids", T.ArrayType(T.StringType())),
    ]
)


def _collect_descendants(node: dict) -> tuple[list[str], list[str]]:
    """children = direct child ids (sorted); descendants = full subtree
    ids (sorted) — reference SCV.scala:296-297 sorts both."""
    children = node.get("children") or []
    child_ids = [c["id"] for c in children if c.get("id") is not None]
    desc: list[str] = []
    for c in children:
        if c.get("id") is not None:
            desc.append(c["id"])
        _, sub = _collect_descendants(c)
        desc.extend(sub)
    return sorted(child_ids), sorted(desc)


@F.pandas_udf(_DESC_SCHEMA)
def tree_descendants_udf(tree_json: pd.Series) -> pd.DataFrame:  # pragma: no cover
    rows = []
    for s in tree_json:
        if s is None:
            rows.append((None, None))
            continue
        child_ids, desc = _collect_descendants(json.loads(s))
        rows.append((child_ids, desc))
    return pd.DataFrame(rows, columns=["child_ids", "descendant_ids"])


def tree_descendants(
    df: DataFrame, tree_col: str, out_col: str = "descendants"
) -> DataFrame:
    """VariationDescendants.scala:27-48: recursive child/descendant-id
    collection over a nested JSON tree ``{"id": …, "children": [...]}``.
    Unbounded recursion is the one shape column expressions cannot
    state, so this is an Arrow-batched row-local pandas kernel (each
    tree is self-contained — no shuffle)."""
    return df.withColumn(out_col, tree_descendants_udf(F.col(tree_col)))
