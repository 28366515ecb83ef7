"""Regressions for the round-5 advisor findings (ADVICE.md r5) and the
round-5 verdict's varlength-blowup task: open lower bound above the hop
guard, OPTIONAL MATCH within-clause relationship uniqueness, undirected
rel property refs in varlength emissions, the distinct-frontier
compilation that bounds unbounded expansion on cyclic graphs, and the
restored (finite) recursion-row-limit backstop."""

from __future__ import annotations

import pytest

from neo4j_arrow_spark.cypher import CypherUnsupported, cypher_to_sql


def _run(spark, nodes_rows, rels_rows, cypher, **kw):
    nodes = spark.createDataFrame(
        nodes_rows, "ID long, LABELS array<string>, name string"
    )
    rels = spark.createDataFrame(
        rels_rows, "START_ID long, END_ID long, TYPE string, w double"
    )
    nodes.createOrReplaceTempView("r5nodes")
    rels.createOrReplaceTempView("r5rels")
    sql = cypher_to_sql(cypher, "r5nodes", "r5rels", **kw)
    return spark.sql(sql)


def _chain_graph(n):
    """Directed chain n0 -> n1 -> ... -> n_{n-1}."""
    nodes = [(i, ["P"], f"n{i}") for i in range(n)]
    rels = [(i, i + 1, "T", 1.0) for i in range(n - 1)]
    return nodes, rels


def _complete_digraph(n):
    """Every ordered pair (i, j), i != j — maximally cyclic."""
    nodes = [(i, ["P"], f"n{i}") for i in range(n)]
    rels = [
        (i, j, "E", 1.0) for i in range(n) for j in range(n) if i != j
    ]
    return nodes, rels


# -- ADVICE medium: open lower bound above the hop guard --------------------

def test_open_lower_bound_above_guard_returns_rows(spark):
    # `*12..` with UNBOUNDED_HOP_GUARD=10: r5 emitted `_hops < 10` with
    # an outer `_hops >= 12` — guaranteed empty. The guard must grow.
    nodes, rels = _chain_graph(16)
    rows = _run(
        spark,
        nodes,
        rels,
        "MATCH (a:P {name: 'n0'})-[:T*12..]->(b) "
        "RETURN DISTINCT b.name AS name",
    ).collect()
    # n0 reaches n12..n15 at >= 12 hops
    assert sorted(r.name for r in rows) == ["n12", "n13", "n14", "n15"]


def test_explicit_max_hops_below_lower_bound_rejected():
    with pytest.raises(CypherUnsupported, match="exceeds"):
        cypher_to_sql(
            "MATCH (a)-[:T*12..]->(b) RETURN DISTINCT b.ID AS id",
            "n",
            "e",
            max_hops=5,
        )


# -- ADVICE low: OPTIONAL MATCH within-clause rel uniqueness ----------------

def test_optional_match_two_rels_cannot_bind_same_edge(spark):
    # Only one K edge (1 -> 2). OPTIONAL MATCH (a)-[r1:K]->(b)<-[r2:K]-(c)
    # can only complete by binding r1 and r2 to THE SAME edge (c = a),
    # which Cypher's within-clause uniqueness forbids -> pattern nulls.
    nodes = [(1, ["P"], "a"), (2, ["P"], "b")]
    rels = [(1, 2, "K", 1.0)]
    rows = _run(
        spark,
        nodes,
        rels,
        "MATCH (a:P {name: 'a'}) "
        "OPTIONAL MATCH (a)-[r1:K]->(b)<-[r2:K]-(c) "
        "RETURN a.ID AS id, count(r2.START_ID) AS dup_binds",
    ).collect()
    assert rows == [type(rows[0])(id=1, dup_binds=0)]


def test_optional_match_two_rels_distinct_edges_still_match(spark):
    # with a second distinct K edge (3 -> 2) the pattern completes
    nodes = [(1, ["P"], "a"), (2, ["P"], "b"), (3, ["P"], "c")]
    rels = [(1, 2, "K", 1.0), (3, 2, "K", 1.0)]
    rows = _run(
        spark,
        nodes,
        rels,
        "MATCH (a:P {name: 'a'}) "
        "OPTIONAL MATCH (a)-[r1:K]->(b)<-[r2:K]-(c) "
        "RETURN a.ID AS id, count(r2.START_ID) AS matches",
    ).collect()
    assert rows[0].matches == 1


# -- ADVICE low: undirected rel prop refs in varlength emissions ------------

def test_undirected_prop_ref_with_varlength_segment_executes(spark):
    # r5: _collect_undirected_prop_refs ran only in _plain_sql, so the
    # undirected union view lacked `w` and this raised AnalysisException
    nodes = [(1, ["P"], "a"), (2, ["P"], "b"), (3, ["P"], "c"), (4, ["P"], "d")]
    rels = [(2, 1, "K", 2.0), (2, 3, "T", 1.0), (3, 4, "T", 1.0)]
    rows = _run(
        spark,
        nodes,
        rels,
        "MATCH (a:P {name: 'a'})-[r:K]-(b)-[:T*1..2]->(c) "
        "WHERE r.w > 1.0 RETURN c.name AS name ORDER BY name",
    ).collect()
    assert [r.name for r in rows] == ["c", "d"]


def test_undirected_prop_ref_with_unbounded_segment_executes(spark):
    nodes = [(1, ["P"], "a"), (2, ["P"], "b"), (3, ["P"], "c"), (4, ["P"], "d")]
    rels = [(2, 1, "K", 2.0), (2, 3, "T", 1.0), (3, 4, "T", 1.0)]
    rows = _run(
        spark,
        nodes,
        rels,
        "MATCH (a:P {name: 'a'})-[r:K]-(b)-[:T*]->(c) "
        "WHERE r.w > 1.0 RETURN DISTINCT c.name AS name",
    ).collect()
    assert sorted(r.name for r in rows) == ["c", "d"]


# -- verdict task #2: distinct-frontier bounds cyclic expansion -------------

def test_distinct_frontier_completes_on_dense_cyclic_graph(spark):
    # complete digraph on 15 nodes: walk enumeration within 10 hops is
    # ~15 * 14^9 ≈ 3e11 rows — impossible. The distinct-frontier mode
    # keeps ≤ |V|² rows per hop; prove it by running under a recursion
    # row limit that walk mode would trip in the first two hops.
    nodes, rels = _complete_digraph(15)
    key = "spark.sql.cteRecursionRowLimit"
    prev = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        rows = _run(
            spark,
            nodes,
            rels,
            "MATCH (a:P {name: 'n0'})-[:E*]->(b) "
            "RETURN DISTINCT b.name AS name",
        ).collect()
    finally:
        spark.conf.set(key, prev)
    # every node (n0 itself via any 2-cycle) is reachable
    assert sorted(r.name for r in rows) == sorted(f"n{i}" for i in range(15))


def test_walk_mode_backstop_trips_instead_of_materializing(spark):
    # multiplicity-sensitive shape (count(*)) keeps walk semantics; on
    # a cyclic graph the restored finite cteRecursionRowLimit must trip
    # rather than materialize ~6 * 5^9 walks.
    nodes, rels = _complete_digraph(6)
    key = "spark.sql.cteRecursionRowLimit"
    prev = spark.conf.get(key)
    spark.conf.set(key, "10000")
    try:
        with pytest.raises(Exception, match="RECURSION_ROW_LIMIT_EXCEEDED"):
            _run(
                spark,
                nodes,
                rels,
                "MATCH (a:P {name: 'n0'})-[:E*]->(b) "
                "RETURN b.name AS name, count(*) AS walks",
            ).collect()
    finally:
        spark.conf.set(key, prev)


def test_count_distinct_uses_frontier_mode(spark):
    # duplicate-insensitive aggregate -> frontier mode, exact reach count
    nodes, rels = _complete_digraph(12)
    rows = _run(
        spark,
        nodes,
        rels,
        "MATCH (a:P {name: 'n0'})-[:E*]->(b) "
        "RETURN count(DISTINCT b.ID) AS reach",
    ).collect()
    assert rows[0].reach == 12


# -- verdict task #6: undirected unbounded varlength ------------------------

def test_undirected_unbounded_traverses_against_edge_direction(spark):
    # edges all point AWAY from n3: 3->2, 2->1, 3->4; undirected [*]
    # from n1 must still reach everything
    nodes = [(i, ["P"], f"n{i}") for i in range(1, 5)]
    rels = [(3, 2, "E", 1.0), (2, 1, "E", 1.0), (3, 4, "E", 1.0)]
    rows = _run(
        spark,
        nodes,
        rels,
        "MATCH (a:P {name: 'n1'})-[:E*]-(b) RETURN DISTINCT b.name AS name",
    ).collect()
    assert sorted(r.name for r in rows) == ["n1", "n2", "n3", "n4"]


def test_undirected_unbounded_walk_counting_rejected():
    with pytest.raises(CypherUnsupported, match="duplicate-insensitive"):
        cypher_to_sql(
            "MATCH (a)-[:E*]-(b) RETURN b.ID AS id, count(*) AS c",
            "n",
            "e",
        )
