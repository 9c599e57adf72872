"""Canonical JSON goldens — semantics transcribed from the reference's
ContentSpec.scala:16-48 (sorted keys AND sorted array values, dropped
nulls/empty containers, compact rendering)."""

from clinvar_ingest_spark.functions.canonical_json import (
    canonical_json,
    canonical_json_of_string,
    canonicalize,
)


def test_sorts_keys_and_array_values():
    v = {"b": 1, "a": [3, 1, 2]}
    assert canonical_json(v) == '{"a":[1,2,3],"b":1}'


def test_drops_nulls_and_empty_containers():
    v = {"a": None, "b": {}, "c": [], "d": {"e": None}, "f": 0}
    assert canonical_json(v) == '{"f":0}'


def test_empties_out_to_none():
    assert canonical_json({"a": None, "b": [None, {}]}) is None
    assert canonical_json_of_string(None) is None


def test_nested_array_of_objects_sorted():
    v = {"xs": [{"k": 2}, {"k": 1}]}
    assert canonical_json(v) == '{"xs":[{"k":1},{"k":2}]}'


def test_mixed_type_array_total_order():
    # null < bool < number < string < array < object; nulls dropped first
    v = {"xs": ["b", 2, True, [1], {"z": 1}, 1.5, "a"]}
    assert canonical_json(v) == '{"xs":[true,1.5,2,"a","b",[1],{"z":1}]}'


def test_string_roundtrip_compact():
    s = ' {"b" : [2, 1], "a": "x"} '
    assert canonical_json_of_string(s) == '{"a":"x","b":[1,2]}'


def test_idempotent():
    v = {"b": [2, 1], "a": {"c": None, "d": [{}]}}
    once = canonical_json(v)
    import json

    assert canonical_json(json.loads(once)) == once


def test_scalar_passthrough():
    assert canonicalize(5) == 5
    assert canonical_json("x") == '"x"'
