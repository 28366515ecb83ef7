"""Regressions for the round-4 advisor findings (ADVICE.md r4):
MERGE ON MATCH SET snapshot mask, per-MATCH relationship uniqueness,
merge_rel full-pattern identity, drift_psi zero-range guard, and
parse-time validation of type()/labels()/size(labels())."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.api import Neo4jArrowSpark
from neo4j_arrow_spark.cypher import (
    CypherSyntaxError,
    CypherUnsupported,
    cypher_to_sql,
)
from neo4j_arrow_spark.operators.profiling import drift_psi


@pytest.fixture()
def wapi(spark):
    api = Neo4jArrowSpark(spark)
    nodes = spark.createDataFrame(
        [
            (1, ["P"], "alice", 10.0),
            (2, ["P"], "bob", 20.0),
            (3, ["P"], "carol", 30.0),
        ],
        "ID long, LABELS array<string>, name string, bal double",
    )
    rels = spark.createDataFrame(
        [(1, 2, "K", 1.0), (1, 3, "K", 2.0)],
        "START_ID long, END_ID long, TYPE string, w double",
    )
    api.catalog.register("adv", nodes, rels, overwrite=True)
    return api


# -- MERGE ON MATCH SET: snapshot mask (ADVICE high) ------------------------

def test_merge_on_match_set_merge_key_rewrite_applies_all_sets(wapi):
    # the first SET rewrites the merge-key property `bal`; the second
    # SET must still apply (Neo4j evaluates all SET items against the
    # pre-update match, not the already-updated frame)
    s = (
        wapi.cypher(
            "MERGE (n:P {bal: 10.0}) ON MATCH SET n.bal = 2.0, n.name = 'z'",
            graph="adv",
        )
        .result(60)
        .collect()[0]
    )
    assert s.nodes_created == 0 and s.props_set == 2
    rows = {
        r.id: (r.name, r.bal)
        for r in wapi.cypher(
            "MATCH (m) RETURN m.ID AS id, m.name AS name, m.bal AS bal",
            graph="adv",
        )
        .result(60)
        .collect()
    }
    assert rows[1] == ("z", 2.0)  # BOTH sets applied
    assert rows[2] == ("bob", 20.0)  # unmatched untouched


# -- merge_rel: pattern props are part of the MERGE identity ----------------

def test_merge_rel_different_props_creates_second_edge(wapi):
    # a K edge alice->bob exists with w=1.0; MERGE with w=5.0 must
    # create (Cypher matches on the full pattern property map)
    s = (
        wapi.cypher(
            "MATCH (a:P {name: 'alice'}), (b:P {name: 'bob'}) "
            "MERGE (a)-[:K {w: 5.0}]->(b)",
            graph="adv",
        )
        .result(60)
        .collect()[0]
    )
    assert s.rels_created == 1
    # MERGE with the existing w=1.0 must NOT create
    s2 = (
        wapi.cypher(
            "MATCH (a:P {name: 'alice'}), (b:P {name: 'bob'}) "
            "MERGE (a)-[:K {w: 1.0}]->(b)",
            graph="adv",
        )
        .result(60)
        .collect()[0]
    )
    assert s2.rels_created == 0


# -- per-MATCH relationship uniqueness (ADVICE medium) ----------------------

def test_rel_uniqueness_within_one_match(wapi):
    # edges: alice->bob, alice->carol (both :K). Comma-separated slots
    # r1, r2 in ONE clause must not bind the same edge: 2 ordered
    # bindings, not 4.
    one_clause = (
        wapi.cypher(
            "MATCH (a:P {name: 'alice'})-[r1:K]->(b), (a)-[r2:K]->(c) "
            "RETURN count(*) AS n",
            graph="adv",
        )
        .result(60)
        .collect()[0]
    )
    assert one_clause.n == 2
    # separate MATCH clauses: the rule does not apply — 4 bindings
    two_clauses = (
        wapi.cypher(
            "MATCH (a:P {name: 'alice'})-[r1:K]->(b) "
            "MATCH (a)-[r2:K]->(c) RETURN count(*) AS n",
            graph="adv",
        )
        .result(60)
        .collect()[0]
    )
    assert two_clauses.n == 4


def test_rel_uniqueness_disjoint_types_skip_predicate():
    sql = cypher_to_sql(
        "MATCH (a:P)-[r1:K]->(b), (a)-[r2:L]->(c) RETURN count(*) AS n",
        "gn",
        "gr",
    )
    assert "NOT (" not in sql  # :K and :L can never collide


def test_rel_uniqueness_undirected_uses_physical_identity():
    # late-r6 semantic-fuzz fix: undirected slots compare the PHYSICAL
    # (START_ID, END_ID, TYPE) triple via the union view's _OS/_OE
    # columns — endpoint-SET equality wrongly merged two distinct
    # anti-parallel edges into one relationship
    sql = cypher_to_sql(
        "MATCH (a:P)-[r1:K]-(b), (a)-[r2:K]-(c) RETURN count(*) AS n",
        "gn",
        "gr",
    )
    assert "r1._OS = r2._OS AND r1._OE = r2._OE" in sql


def test_rel_uniqueness_same_sql_both_dialects_shape():
    q = "MATCH (a:P)-[r1:K]->(b), (a)-[r2:K]->(c) RETURN count(*) AS n"
    for dialect in ("spark", "duckdb"):
        sql = cypher_to_sql(q, "gn", "gr", dialect=dialect)
        assert "NOT (r1.START_ID = r2.START_ID" in sql


# -- drift_psi: constant reference column (ADVICE low) ----------------------

def test_drift_psi_constant_reference_column(spark):
    ref = spark.range(100).select(F.lit(7.0).alias("v"))
    cur = spark.range(50).select(F.lit(7.0).alias("v"))
    rows = drift_psi(ref, cur, "v", n_buckets=5).collect()
    assert len(rows) == 5
    by_bucket = {r.bucket: (r.ref_n, r.cur_n) for r in rows}
    assert by_bucket[0] == (100, 50)  # everything lands in bucket 0
    assert all(by_bucket[b] == (0, 0) for b in range(1, 5))


# -- parse-time accessor validation (ADVICE low) ----------------------------

def test_type_on_node_variable_rejected():
    with pytest.raises((CypherSyntaxError, CypherUnsupported)):
        cypher_to_sql(
            "MATCH (n:P)-[r:K]->(m) RETURN type(n) AS t, count(*) AS c",
            "gn",
            "gr",
        )


def test_type_on_rel_variable_still_works():
    sql = cypher_to_sql(
        "MATCH (n:P)-[r:K]->(m) RETURN type(r) AS t, count(*) AS c",
        "gn",
        "gr",
    )
    assert "r.TYPE" in sql


def test_labels_on_rel_variable_rejected():
    with pytest.raises((CypherSyntaxError, CypherUnsupported)):
        cypher_to_sql(
            "MATCH (n:P)-[r:K]->(m) RETURN labels(r) AS l, count(*) AS c",
            "gn",
            "gr",
        )


def test_id_on_unbound_variable_rejected():
    with pytest.raises((CypherSyntaxError, CypherUnsupported)):
        cypher_to_sql(
            "MATCH (n:P) RETURN id(zzz) AS i, count(*) AS c", "gn", "gr"
        )


def test_size_labels_on_unbound_variable_rejected():
    with pytest.raises((CypherSyntaxError, CypherUnsupported)):
        cypher_to_sql(
            "MATCH (n:P) RETURN size(labels(zzz)) AS k", "gn", "gr"
        )


def test_size_labels_on_bound_node_still_works():
    sql = cypher_to_sql(
        "MATCH (n:P) RETURN size(labels(n)) AS k", "gn", "gr"
    )
    assert "size(n.LABELS)" in sql
