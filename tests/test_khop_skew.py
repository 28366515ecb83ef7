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


def test_hub_1e4_khop_and_node_similarity_bounded(spark):
    """FIXTURES.md F2 scaled up: a degree-10^4 hub (KHOP.md:157-184
    supernode math). The k-hop subset-origins leg and the Jaccard
    node-similarity wedge join must both complete inside a wall bound
    — the plans' skew answers (frontier anti-join decomposition,
    degree-ordered wedges + AQE skew splits) doing their job, not an
    all-pairs explosion timing out."""
    import time

    from neo4j_arrow_spark.operators.graph_algs import node_similarity

    hub_deg = 10_000
    edges = [(0, i) for i in range(1, hub_deg + 1)]
    # a moderately hot shared target (in-degree 500) to stress the
    # wedge join's skew handling, plus a sparse tail
    edges += [(i, hub_deg + 1) for i in range(1, 501)]
    edges += [(i, i + 1) for i in range(hub_deg + 2, hub_deg + 50)]
    rels = spark.createDataFrame(
        [(s, d, "E", 1.0) for s, d in edges],
        "START_ID long, END_ID long, TYPE string, weight double",
    )
    # subset origins: the hub + a handful of neighbors + tail nodes
    origin_ids = [0, 1, 2, 500, hub_deg + 1, hub_deg + 10]
    origins = spark.createDataFrame(
        [(i, ["N"]) for i in origin_ids], "ID long, LABELS array<string>"
    )

    t0 = time.monotonic()
    out = khop_flat(origins, rels, origins_complete=False)
    counts = {r["origin"]: r["n"] for r in
              out.groupBy("origin").agg(F.count("*").alias("n")).collect()}
    khop_sec = time.monotonic() - t0
    # hub origin covers every edge incident to its 1e4 neighbors
    assert counts[0] >= hub_deg
    # a hub-neighbor origin pulls in the hub's full edge set
    assert counts[1] >= hub_deg
    assert khop_sec < 90, f"khop on 1e4-degree hub took {khop_sec:.1f}s"

    t0 = time.monotonic()
    sim = node_similarity(
        rels.select(
            F.col("START_ID").alias("u"), F.col("END_ID").alias("v")
        ),
        threshold=0.0,
    )
    n_pairs = sim.count()
    sim_sec = time.monotonic() - t0
    # the 500 co-purchasers of the hot target all pair up
    assert n_pairs >= 500 * 499 // 2
    assert sim_sec < 90, f"node_similarity wedge join took {sim_sec:.1f}s"


def test_centrality_ops_on_hub(spark, skewed):
    """Round-4 centralities complete on the degree-2000 hub with sane
    values: the hub dominates harmonic reach, betweenness, and the
    eigenvector, and no stage explodes into all-pairs."""
    import time

    from neo4j_arrow_spark.operators.graph_algs import (
        betweenness_sampled,
        harmonic_centrality,
    )
    from neo4j_arrow_spark.operators.pagerank import eigenvector_fixed

    _, rels, _ = skewed
    edges = rels.select(
        F.col("START_ID").alias("u"), F.col("END_ID").alias("v")
    )
    t0 = time.time()

    # harmonic from a subset (full all-origins on a hub graph is the
    # documented quadratic-output case — subset is the scale mode)
    origins = spark.createDataFrame([(0,), (1,), (2049,)], "node long")
    h = {r.node: r for r in
         harmonic_centrality(edges, origins=origins, max_hops=2).collect()}
    assert h[0].reached >= 2000       # hub reaches everything near it
    assert h[0].harmonic_q > h[2049].harmonic_q

    src = spark.createDataFrame([(1,), (99,)], "node long")
    b = {r.node: r.betweenness_q for r in
         betweenness_sampled(edges, src, max_hops=2).collect()}
    assert b and max(b, key=b.get) == 0  # the hub carries the paths

    und = edges.union(edges.selectExpr("v as u", "u as v"))
    e = {r.node: r.centrality for r in eigenvector_fixed(und, 2).collect()}
    assert e[0] == 1_000_000  # max-normalized hub

    assert time.time() - t0 < 120, "centralities must not explode on a hub"
