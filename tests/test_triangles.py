"""Triangle counting (operators/triangles.py)."""

from __future__ import annotations

from neo4j_arrow_spark.operators.triangles import oriented_edges, triangle_counts


def _counts(spark, pairs):
    edges = spark.createDataFrame(pairs, "u long, v long")
    return {r["node"]: r["n_tri"] for r in triangle_counts(edges).collect()}


def test_single_triangle_every_orientation(spark):
    # same triangle given with mixed orientations and a duplicate edge
    got = _counts(spark, [(1, 2), (3, 2), (1, 3), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_k4_counts(spark):
    # complete graph on 4 nodes: 4 triangles, each node in 3
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = _counts(spark, k4)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_no_triangles_in_star(spark):
    got = _counts(spark, [(1, 2), (1, 3), (1, 4)])
    assert got == {}


def test_orientation_bounds_hub_outdegree(spark):
    # hub node 1 connected to 20 leaves: after degree orientation the
    # hub must have out-degree 0 (every edge points leaf -> hub)
    edges = spark.createDataFrame([(1, i) for i in range(2, 22)], "u long, v long")
    o = oriented_edges(edges)
    assert o.filter("s = 1").count() == 0
    assert o.filter("t = 1").count() == 20


def test_local_clustering_hand_computed(spark):
    from neo4j_arrow_spark.operators.triangles import local_clustering

    # triangle 1-2-3 plus pendant 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3,
    # lcc(4)=0 (degree 1)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
    )
    got = {r.node: r for r in local_clustering(e).collect()}
    assert got[1].lcc_q == 1_000_000 and got[2].lcc_q == 1_000_000
    assert got[3].lcc_q == 2_000_000 // 6  # 2*1/(3*2)
    assert got[4].lcc_q == 0 and got[4].degree == 1
    assert got[3].n_tri == 1


def test_local_clustering_triangle_free(spark):
    from neo4j_arrow_spark.operators.triangles import local_clustering

    e = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    rows = local_clustering(e).collect()
    assert all(r.lcc_q == 0 and r.n_tri == 0 for r in rows)
