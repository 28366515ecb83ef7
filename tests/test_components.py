"""Connected components (operators/components.py): star-contraction
correctness on hand-built graphs, singleton handling, convergence."""

from __future__ import annotations

from neo4j_arrow_spark.operators.components import connected_components


def _cc(spark, pairs, nodes=None):
    edges = spark.createDataFrame(pairs, "u long, v long")
    ndf = (
        spark.createDataFrame([(n,) for n in nodes], "node long")
        if nodes is not None
        else None
    )
    out = connected_components(edges, ndf)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_two_components_and_path(spark):
    # path 1-2-3-4 and triangle 10-11-12 (as undirected edges, mixed
    # orientation + a duplicate)
    got = _cc(
        spark,
        [(2, 1), (2, 3), (4, 3), (10, 11), (12, 10), (11, 12), (11, 10)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges_logarithmically(spark):
    # 64-node chain: label propagation would need 63 rounds; star
    # contraction must converge well under the 50-iteration cap
    got = _cc(spark, [(i, i + 1) for i in range(1, 64)])
    assert set(got.values()) == {1}
    assert len(got) == 64


def test_singletons_from_node_frame(spark):
    got = _cc(spark, [(1, 2)], nodes=[1, 2, 99])
    assert got == {1: 1, 2: 1, 99: 99}


def test_self_loops_ignored(spark):
    got = _cc(spark, [(5, 5), (1, 2)])
    assert got == {1: 1, 2: 1}
