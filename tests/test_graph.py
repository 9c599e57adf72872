"""Fixed-point PageRank: hand-computed goldens, an exact Python
reference simulation, and input-hygiene invariants."""

from __future__ import annotations

import random

import pytest

from clinvar_ingest_spark.operators.graph import (
    host_edges_from_links,
    pagerank_fixed_point,
)

S = 1_000_000
BASE = S * 15 // 100


def _pr(spark, edges, iterations, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = pagerank_fixed_point(df, iterations=iterations, **kw)
    return {r["node"]: r["rank_fp"] for r in out.collect()}


def _simulate(edges, iterations, scale=S, num=85, den=100):
    """Exact integer reference simulation of the documented semantics."""
    edges = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    rank = {n: scale for n in nodes}
    base = scale * (den - num) // den
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for a, b in edges:
            inc[b] += rank[a] // deg[a]
        rank = {n: base + (num * inc[n]) // den for n in nodes}
    return rank


def test_cycle_is_a_fixed_point(spark):
    # in a 3-cycle every node keeps rank exactly 1.0 (scale) forever
    got = _pr(spark, [("a", "b"), ("b", "c"), ("c", "a")], iterations=4)
    assert got == {"a": S, "b": S, "c": S}


def test_star_hand_computed(spark):
    got = _pr(spark, [("a", "c"), ("b", "c")], iterations=2)
    # iter1: c = base + 85%*(1.0 + 1.0); a,b = base (no in-edges)
    # iter2: c = base + 85%*(base + base)
    assert got["a"] == BASE and got["b"] == BASE
    assert got["c"] == BASE + (85 * (BASE + BASE)) // 100


def test_matches_exact_simulation_on_random_graph(spark):
    rnd = random.Random(42)
    edges = [(f"h{rnd.randrange(20)}", f"h{rnd.randrange(20)}") for _ in range(120)]
    got = _pr(spark, edges, iterations=5)
    assert got == _simulate(edges, 5)


def test_self_loops_and_duplicates_ignored(spark):
    clean = [("a", "b"), ("b", "a")]
    noisy = clean + [("a", "a"), ("a", "b"), ("b", "b"), ("b", "a")]
    assert _pr(spark, noisy, iterations=3) == _pr(spark, clean, iterations=3)


def test_total_mass_bounded(spark):
    rnd = random.Random(7)
    edges = list({(f"h{rnd.randrange(12)}", f"h{rnd.randrange(12)}") for _ in range(60)})
    got = _pr(spark, edges, iterations=5)
    n = len(got)
    # dangling mass is dropped, never created: total <= n * scale
    assert sum(got.values()) <= n * S
    assert all(v >= BASE for v in got.values())


def test_host_edges_from_links(spark):
    rows = [
        ("https://a.example.com/p1", "https://hub.example.org/x"),
        ("https://a.example.com/p1", "https://a.example.com/p2"),  # self at host level
        ("https://b.example.com/q", "/relative/path"),  # non-absolute: dropped
        ("https://b.example.com/q", "https://hub.example.org/y"),
    ]
    df = spark.createDataFrame(rows, "url string, _norm_href string")
    edges = {(r["src"], r["dst"]) for r in host_edges_from_links(df).collect()}
    assert edges == {
        ("a.example.com", "hub.example.org"),
        ("a.example.com", "a.example.com"),  # kept here; pagerank drops self-loops
        ("b.example.com", "hub.example.org"),
    }
