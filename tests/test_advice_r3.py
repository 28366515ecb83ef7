"""Regressions for the round-3 advisor findings (ADVICE.md r3):
khop node_id remap fail-fast, shortestPath endpoint-pair multiplicity,
bpe_pair_counts deterministic partition key, two-phase put() timeout,
and modularity on an empty/unlabeled edge set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.cypher import cypher_to_sql
from neo4j_arrow_spark.operators import text
from neo4j_arrow_spark.operators.graph_algs import modularity
from neo4j_arrow_spark.operators.khop import khop


@pytest.fixture(scope="module")
def chain_graph(spark):
    nodes = spark.createDataFrame(
        [(1, ["N"], 101), (2, ["N"], 102), (3, ["N"], None)],
        "ID long, LABELS array<string>, alt long",
    )
    rels = spark.createDataFrame(
        [(1, 2, "T"), (2, 3, "T")],
        "START_ID long, END_ID long, TYPE string",
    )
    return nodes, rels


def test_khop_remap_ok_when_property_covers(spark, chain_graph):
    nodes, rels = chain_graph
    covered = nodes.withColumn("alt", F.coalesce("alt", F.lit(103)))
    out = khop(covered, rels, k=1, node_id="alt").collect()
    origins = {r["_origin_id_"] for r in out}
    assert origins <= {101, 102, 103} and origins  # remapped ids only


def test_khop_remap_null_property_fails_not_shrinks(spark, chain_graph):
    # node 3's `alt` is NULL: the r3 advisor found the inner-join remap
    # silently dropped such edges; now the job fails fast instead
    nodes, rels = chain_graph
    with pytest.raises(Exception, match="missing or non-integral"):
        khop(nodes, rels, k=1, node_id="alt").collect()


@pytest.fixture(scope="module")
def sp_graph(spark):
    # two components with IDENTICAL projected names: (a1)->(b1), (a2)->(b2)
    # where a1.name == a2.name and b1.name == b2.name — the r3 advisor
    # found these collapse into one row under value-DISTINCT multiplicity
    nodes = spark.createDataFrame(
        [
            (1, ["P"], "src"),
            (2, ["P"], "dst"),
            (3, ["P"], "src"),
            (4, ["P"], "dst"),
        ],
        "ID long, LABELS array<string>, name string",
    )
    rels = spark.createDataFrame(
        [(1, 2, "T"), (3, 4, "T")],
        "START_ID long, END_ID long, TYPE string",
    )
    nodes.createOrReplaceTempView("sp_nodes")
    rels.createOrReplaceTempView("sp_rels")
    return nodes, rels


def test_shortest_path_one_row_per_endpoint_pair(spark, sp_graph):
    sql = cypher_to_sql(
        "MATCH p = shortestPath((a:P)-[:T*1..2]->(b:P)) "
        "RETURN a.name AS an, b.name AS bn, length(p) AS hops",
        "sp_nodes",
        "sp_rels",
    )
    rows = spark.sql(sql).collect()
    # 2 endpoint pairs share (an, bn, hops) — must stay 2 rows
    assert len(rows) == 2
    assert all((r["an"], r["bn"], r["hops"]) == ("src", "dst", 1) for r in rows)


def test_shortest_path_user_aggregate_stays_global(spark, sp_graph):
    sql = cypher_to_sql(
        "MATCH p = shortestPath((a:P)-[:T*1..2]->(b:P)) "
        "RETURN count(*) AS n",
        "sp_nodes",
        "sp_rels",
    )
    rows = spark.sql(sql).collect()
    assert len(rows) == 1 and rows[0]["n"] == 2


def test_bpe_pair_counts_uses_id_col(spark):
    df = spark.createDataFrame(
        [(7, "abab"), (9, "ab")], "doc_id long, text string"
    )
    got = {
        (r["lhs"], r["rhs"]): r["n_pairs"]
        for r in text.bpe_pair_counts(df, "text", min_count=1).collect()
    }
    # "abab": ab, ba, ab; "ab": ab  ->  ab:3, ba:1
    assert got == {("a", "b"): 3, ("b", "a"): 1}
    # and the plan contains no nondeterministic id expression
    plan = text.bpe_pair_counts(df, "text", min_count=1)._jdf.queryExecution().toString()
    assert "monotonically_increasing_id" not in plan


def test_deferred_put_timeout_errors_job(spark):
    from neo4j_arrow_spark.api import Neo4jArrowSpark

    api = Neo4jArrowSpark(spark)
    job = api._deferred("gds.write.nodes", lambda df: df, timeout=0.2)
    assert not job.wait(10) or job.status.value == "ERROR"
    job._done.wait(10)
    assert job.status.value == "ERROR"
    assert "no put()" in (job.error or "")


def test_modularity_empty_labeled_edge_set(spark):
    edges = spark.createDataFrame([(1, 2)], "u long, v long")
    labels = spark.createDataFrame(
        [(99, 0)], "node long, label long"
    )  # covers neither endpoint -> m == 0
    row = modularity(edges, labels).collect()[0]
    assert row["m"] == 0
    assert row["q_numerator"] == 0
    assert row["modularity"] == 0.0
