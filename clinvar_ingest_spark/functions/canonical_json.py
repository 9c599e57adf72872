"""Canonical JSON encoding — schema-drift spill column support.

Matches the reference's ``Content`` canonicalization semantics
(reference: transformation/src/main/scala/.../Content.scala:16-48 and
ordering rules :56-105; golden test ContentSpec.scala:16-48):

- drop JSON ``null`` values and **empty** objects/arrays (recursively);
- sort object keys;
- sort **array values** by a total order over JSON values;
- compact, whitespace-free rendering;
- an input that canonicalizes to nothing yields ``None`` (the reference
  leaves the ``content`` column unset).

Spark's ``to_json`` sorts nothing, hence this custom kernel; it runs
inside Arrow-batched pandas UDFs (never per-row in a JVM hot path).

The value total order mirrors Content.scala:56-105: type rank
(null < bool < number < string < array < object), then value compare;
numbers compare numerically across int/float.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_TYPE_RANK = {"null": 0, "bool": 1, "num": 2, "str": 3, "arr": 4, "obj": 5}


def _kind(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (list, tuple)):
        return "arr"
    if isinstance(v, dict):
        return "obj"
    raise TypeError(f"unsupported JSON value: {type(v)!r}")


def _sort_key(v: Any):
    k = _kind(v)
    rank = _TYPE_RANK[k]
    if k == "null":
        return (rank, 0)
    if k == "bool":
        return (rank, int(v))
    if k == "num":
        return (rank, float(v))
    if k == "str":
        return (rank, v)
    if k == "arr":
        return (rank, [_sort_key(x) for x in v])
    # obj: compare by sorted (key, value-key) pairs
    return (rank, sorted((key, _sort_key(val)) for key, val in v.items()))


def canonicalize(v: Any) -> Any:
    """Recursively drop null/empty and sort; returns None if nothing remains."""
    k = _kind(v)
    if k == "null":
        return None
    if k in ("bool", "num", "str"):
        return v
    if k == "arr":
        items = [c for c in (canonicalize(x) for x in v) if c is not None]
        if not items:
            return None
        return sorted(items, key=_sort_key)
    # obj
    out = {}
    for key in sorted(v.keys()):
        c = canonicalize(v[key])
        if c is not None:
            out[key] = c
    return out or None


def canonical_json(v: Any) -> str | None:
    """Canonical compact JSON string of ``v``, or None if it empties out."""
    c = canonicalize(v)
    if c is None:
        return None
    return json.dumps(c, separators=(",", ":"), ensure_ascii=False, sort_keys=True)


def canonical_json_of_string(s: str | None) -> str | None:
    """Parse a JSON string and re-encode canonically (None-safe)."""
    if s is None:
        return None
    return canonical_json(json.loads(s))


def canonical_json_series(s: pd.Series) -> pd.Series:
    """Vectorized: Series[str JSON] → Series[str canonical JSON]."""
    return s.map(lambda x: canonical_json_of_string(x) if isinstance(x, str) else None)


@F.pandas_udf(StringType())
def canonical_json_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - via Spark
    return canonical_json_series(s)
