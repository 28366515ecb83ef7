"""Fixed-point PageRank (operators/pagerank.py): hand-computed tiny
graph, parallel-edge dedup, determinism across partitioning."""

from __future__ import annotations

from neo4j_arrow_spark.operators.pagerank import pagerank_fixed


def _pr(spark, pairs, iterations):
    edges = spark.createDataFrame(pairs, "u long, v long")
    out = pagerank_fixed(edges, iterations=iterations)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_hand_computed_two_iterations(spark):
    # 1->2, 1->3, 2->3; SCALE=1e6, base=150000
    # iter1: r(2)=150000+85*(1e6//2)//100=575000
    #        r(3)=150000+85*(500000+1000000)//100=1425000; r(1)=150000
    # iter2: r(2)=150000+85*(150000//2)//100=213750
    #        r(3)=150000+85*(75000+575000)//100=702500
    got1 = _pr(spark, [(1, 2), (1, 3), (2, 3)], 1)
    assert got1 == {1: 150000, 2: 575000, 3: 1425000}
    got2 = _pr(spark, [(1, 2), (1, 3), (2, 3)], 2)
    assert got2 == {1: 150000, 2: 213750, 3: 702500}


def test_parallel_edges_deduplicated(spark):
    # duplicate 1->2 must not double the contribution
    a = _pr(spark, [(1, 2)], 1)
    b = _pr(spark, [(1, 2), (1, 2)], 1)
    assert a == b == {1: 150000, 2: 1000000}


def test_partitioning_invariance(spark):
    pairs = [(i, (i * 7) % 23 + 100) for i in range(1, 60)]
    edges1 = spark.createDataFrame(pairs, "u long, v long").repartition(1)
    edges32 = spark.createDataFrame(pairs, "u long, v long").repartition(32)
    r1 = {r["node"]: r["rank"] for r in pagerank_fixed(edges1, 3).collect()}
    r32 = {r["node"]: r["rank"] for r in pagerank_fixed(edges32, 3).collect()}
    assert r1 == r32
