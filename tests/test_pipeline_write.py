"""Pipeline writes (r11): ``MATCH … WITH <pipeline> SET/DELETE/
CREATE`` — a write clause driven by a read pipeline. The pipeline
compiles through the READ transpiler with synthesized RETURN items
(target ids + values in pipeline scope), and the write applies as one
set-based frame op. Values see the PRE-statement state; MERGE after a
pipeline and aggregate-valued SETs refuse with targeted lines.
"""

from __future__ import annotations

import pytest

from neo4j_arrow_spark.api import Neo4jArrowSpark
from neo4j_arrow_spark.cypher import CypherUnsupported


@pytest.fixture()
def papi(spark):
    api = Neo4jArrowSpark(spark)
    nodes = spark.createDataFrame(
        [
            (1, ["P"], "alice", 30),
            (2, ["P"], "bob", 25),
            (3, ["Q"], "carol", 35),
        ],
        "ID long, LABELS array<string>, name string, age long",
    )
    rels = spark.createDataFrame(
        [(1, 2, "K", 1.0), (2, 3, "K", 2.0), (1, 3, "K", 3.0)],
        "START_ID long, END_ID long, TYPE string, w double",
    )
    api.catalog.register("pw", nodes, rels, overwrite=True)
    return api


def test_pipeline_set_top_k(papi):
    rows = (
        papi.cypher(
            "MATCH (n:P) WITH n ORDER BY n.age DESC LIMIT 1 "
            "SET n.top = true RETURN n.name AS nm, n.top AS t",
            graph="pw",
        )
        .result(120)
        .collect()
    )
    assert [(r.nm, r.t) for r in rows] == [("alice", True)]
    rows = (
        papi.cypher(
            "MATCH (n:P) RETURN n.name AS nm, n.top AS t ORDER BY nm",
            graph="pw",
        )
        .result(120)
        .collect()
    )
    assert [(r.nm, r.t) for r in rows] == [("alice", True), ("bob", None)]


def test_pipeline_set_aggregate_alias(papi):
    # degree materialization — THE canonical pipeline-SET idiom
    s = (
        papi.cypher(
            "MATCH (a)-[r:K]->() WITH a, count(*) AS d SET a.deg = d",
            graph="pw",
        )
        .result(120)
        .collect()[0]
    )
    assert (s.op, s.props_set) == ("set", 2)
    rows = (
        papi.cypher(
            "MATCH (n) RETURN n.name AS nm, n.deg AS d ORDER BY nm",
            graph="pw",
        )
        .result(120)
        .collect()
    )
    assert [(r.nm, r.d) for r in rows] == [
        ("alice", 2),
        ("bob", 1),
        ("carol", None),
    ]


def test_pipeline_set_value_sees_pre_state(papi):
    papi.cypher(
        "MATCH (n:P {name: 'bob'}) WITH n SET n.age = n.age + 1",
        graph="pw",
    ).result(120)
    rows = (
        papi.cypher(
            "MATCH (n:P {name: 'bob'}) RETURN n.age AS a", graph="pw"
        )
        .result(120)
        .collect()
    )
    assert [r.a for r in rows] == [26]


def test_pipeline_create_from_aggregate(papi):
    rows = (
        papi.cypher(
            "MATCH (n:P) WITH count(*) AS c, sum(n.age) AS s "
            "CREATE (st:Stat {n: c, total: s}) "
            "RETURN st.n AS n, st.total AS t",
            graph="pw",
        )
        .result(120)
        .collect()
    )
    assert [(r.n, r.t) for r in rows] == [(2, 55)]
    s = (
        papi.cypher(
            "MATCH (st:Stat) RETURN count(*) AS c", graph="pw"
        )
        .result(120)
        .collect()
    )
    assert s[0].c == 1


def test_pipeline_create_one_node_per_row(papi):
    s = (
        papi.cypher(
            "MATCH (n:P) WITH n.name AS nm, n.age * 2 AS a2 "
            "CREATE (c:Copy {name: nm, dbl: a2})",
            graph="pw",
        )
        .result(120)
        .collect()[0]
    )
    assert (s.nodes_created, s.props_set) == (2, 4)
    rows = (
        papi.cypher(
            "MATCH (c:Copy) RETURN c.name AS nm, c.dbl AS d ORDER BY nm",
            graph="pw",
        )
        .result(120)
        .collect()
    )
    assert [(r.nm, r.d) for r in rows] == [("alice", 60), ("bob", 50)]


def test_pipeline_delete_by_aggregate(papi):
    s = (
        papi.cypher(
            "MATCH (a)-[r:K]->(b) WITH b, count(*) AS indeg "
            "WHERE indeg > 1 DETACH DELETE b",
            graph="pw",
        )
        .result(120)
        .collect()[0]
    )
    assert (s.nodes_deleted, s.rels_deleted) == (1, 2)
    rows = (
        papi.cypher(
            "MATCH (n) RETURN n.name AS nm ORDER BY nm", graph="pw"
        )
        .result(120)
        .collect()
    )
    assert [r.nm for r in rows] == ["alice", "bob"]


def test_pipeline_plain_delete_needs_detach(papi):
    with pytest.raises(RuntimeError, match="DETACH"):
        papi.cypher(
            "MATCH (n:Q) WITH n LIMIT 1 DELETE n", graph="pw"
        ).result(120)


def test_pipeline_merge_refused(papi):
    with pytest.raises(CypherUnsupported, match="MERGE after a WITH"):
        papi.cypher(
            "MATCH (n:P) WITH n LIMIT 1 MERGE (m:X {k: n.name})",
            graph="pw",
        )


def test_pipeline_set_aggregate_value_refused(papi):
    with pytest.raises(CypherUnsupported, match="aggregates"):
        papi.cypher(
            "MATCH (a)-[r:K]->() WITH a SET a.deg = count(*)",
            graph="pw",
        )


def test_pipeline_set_two_variables_refused(papi):
    with pytest.raises(CypherUnsupported, match="ONE carried"):
        papi.cypher(
            "MATCH (a:P)-[r:K]->(b) WITH a, b SET a.x = 1, b.y = 2",
            graph="pw",
        )
