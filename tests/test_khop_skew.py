"""Supernode/skew stress: FIXTURES.md F2 demands a node with degree
>= 100x the median (the reference's SuperNodeCache concern,
KHop.java:24-81). Correctness is checked against a pure-Python oracle
of the 2-hop definition; the plan must complete without the naive
all-pairs explosion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.khop import khop_flat


def _python_khop(edges: set[tuple[int, int]], origins: set[int]) -> dict[int, set]:
    nbrs: dict[int, set] = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    out = {}
    for o in origins:
        members = {o} | nbrs.get(o, set())
        es = {(s, d) for (s, d) in edges if s in members or d in members}
        if es:
            out[o] = es
    return out


@pytest.fixture(scope="module")
def skewed(spark):
    # hub 0 with degree 2000 (~400x the median of 5), plus a sparse ring
    edges = [(0, i) for i in range(1, 2001)]
    edges += [(i, i % 2000 + 1) for i in range(1, 2001, 97)]
    edges += [(2000 + i, 2000 + i + 1) for i in range(1, 50)]
    nodes = spark.createDataFrame(
        [(i, ["N"]) for i in range(2051)], "ID long, LABELS array<string>"
    )
    rels = spark.createDataFrame(
        [(s, d, "E", 1.0) for s, d in edges],
        "START_ID long, END_ID long, TYPE string, weight double",
    )
    return nodes, rels, set(edges)


def test_khop_supernode_correct(spark, skewed):
    nodes, rels, edges = skewed
    got: dict[int, set] = {}
    for r in khop_flat(nodes, rels).collect():
        got.setdefault(r.origin, set()).add((r.src, r.dst))
    # sample origins: the hub, a hub-neighbor, a far ring node, isolated
    want = _python_khop(edges, {0, 1, 5, 2049, 2050})
    for o in (0, 1, 5, 2049):
        assert got[o] == want[o], f"origin {o}"
    # hub neighborhood: every origin adjacent to the hub carries >= hub degree edges
    assert len(got[1]) >= 2000
    # total output is the sum over origins of their closure sizes — sane bound
    assert sum(len(v) for v in got.values()) == sum(len(v) for v in (
        _python_khop(edges, set(got)).values()))


def test_degree_histogram_flags_supernode(spark, skewed):
    """The detector that drives skew decisions (KHop.java:30-54)."""
    nodes, rels, _ = skewed
    deg = rels.groupBy("START_ID").count()
    hist = deg.groupBy(F.floor(F.log10("count")).cast("long").alias("mag")).count()
    mags = {r.mag: r["count"] for r in hist.collect()}
    assert 3 in mags and mags[3] == 1  # exactly one node in the 1000s bucket
