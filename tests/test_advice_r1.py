"""Regressions for the round-1 advisor findings (ADVICE.md r1):
catalog view-namespace collisions, asof_join's empty-payload default,
api.cypher database scoping + params handling, Cypher SKIP/LIMIT token
validation, and string-literal escape normalization."""

from __future__ import annotations

import datetime as dt

import pytest

from neo4j_arrow_spark.api import Neo4jArrowSpark
from neo4j_arrow_spark.catalog import GraphAlreadyExists, GraphCatalog
from neo4j_arrow_spark.cypher import (
    CypherSyntaxError,
    CypherUnsupported,
    cypher_to_sql,
)
from neo4j_arrow_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def tiny_nodes(spark):
    return spark.createDataFrame(
        [(1, ["X"]), (2, ["Y"])], "ID long, LABELS array<string>"
    )


def test_catalog_rejects_cross_key_name_clash(spark, tiny_nodes):
    cat = GraphCatalog(spark)
    cat.register("clashg", tiny_nodes, database="db1")
    # same name under another database/user would clobber clashg_nodes
    with pytest.raises(GraphAlreadyExists, match="single namespace"):
        cat.register("clashg", tiny_nodes, database="db2")
    with pytest.raises(GraphAlreadyExists):
        cat.register("clashg", tiny_nodes, database="db2", overwrite=True)
    # same key + overwrite stays allowed
    cat.register("clashg", tiny_nodes, database="db1", overwrite=True)
    cat.drop("clashg", database="db1")


def test_asof_join_default_empty_payload(spark):
    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, 100, ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, ts(5)), (100, ts(5)), (100, ts(20))], "user_id long, ts timestamp"
    )
    # the documented default payload=() used to die at analysis time
    # (row_number window with an empty ORDER BY)
    out = asof_join(left, right, on="user_id").collect()
    assert len(out) == 1
    assert out[0]["asof_ts"] == ts(5)


def test_cypher_params_now_bound(spark, tiny_nodes):
    # r1 advice had params rejected; r3 VERDICT item 4 asked for real
    # binding (neo4j_arrow.py:161-180 passes params with Cypher), so the
    # contract flipped: params are bound as Spark named parameters.
    client = Neo4jArrowSpark(spark)
    client.catalog.register("pgraph", tiny_nodes)
    job = client.cypher(
        "MATCH (a:X) WHERE a.ID = $x RETURN a.ID AS id", params={"x": 1}
    )
    assert job.result().collect()[0]["id"] == 1
    client.catalog.drop("pgraph")


def test_cypher_graph_resolution_scoped_by_database(spark, tiny_nodes):
    client = Neo4jArrowSpark(spark)  # default database "neo4j"
    client.catalog.register("dbg", tiny_nodes, database="otherdb")
    # the only graph lives in otherdb: default-db resolution must not see it
    with pytest.raises(ValueError, match=r"\(neo4j, neo4j\)"):
        client.cypher("MATCH (a:X) RETURN a.ID AS id")
    job = client.cypher("MATCH (a:X) RETURN a.ID AS id", database="otherdb")
    assert job.result().collect()[0]["id"] == 1
    # naming a graph that is not under the requested database fails loudly
    from neo4j_arrow_spark.catalog import GraphNotFound

    with pytest.raises(GraphNotFound):
        client.cypher("MATCH (a:X) RETURN a.ID", graph="dbg", database="neo4j")
    client.catalog.drop("dbg", database="otherdb")


def test_skip_limit_require_integer_literal():
    for bad in ("LIMIT x", "LIMIT 1.5", "SKIP -1", "LIMIT LIMIT"):
        with pytest.raises(CypherSyntaxError):
            cypher_to_sql(f"MATCH (a:X) RETURN a.ID {bad}", "n", "e")
    sql = cypher_to_sql("MATCH (a:X) RETURN a.ID SKIP 2 LIMIT 3", "n", "e")
    assert "LIMIT 3" in sql


def test_string_literal_normalization():
    # backslash-escaped quote becomes dialect-neutral '' doubling
    sql = cypher_to_sql(
        r"MATCH (a:X {name: 'O\'Brien'}) RETURN a.ID", "n", "e"
    )
    assert "'O''Brien'" in sql and "\\" not in sql
    # literal backslash content has no portable SQL form: loud error
    with pytest.raises(CypherUnsupported):
        cypher_to_sql(r"MATCH (a:X {name: 'a\\b'}) RETURN a.ID", "n", "e")
    with pytest.raises(CypherSyntaxError):
        cypher_to_sql(r"MATCH (a:X {name: 'a\qb'}) RETURN a.ID", "n", "e")


def test_dedup_unpersist_hook(spark):
    from neo4j_arrow_spark.operators.dedup import (
        minhash_lsh_pairs,
        unpersist_intermediates,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox leaps"),
         (3, "entirely different text here")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    pairs.count()
    handles = pairs._persisted_intermediates
    assert handles and all(f.storageLevel.useMemory for f in handles)
    unpersist_intermediates(pairs)
    assert all(not f.storageLevel.useMemory for f in handles)
