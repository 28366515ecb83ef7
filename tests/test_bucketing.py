"""Bucketed storage layout (sources/bucketed.py): the co-located join
must plan with ZERO Exchange operators, and produce the same rows as
the shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.sources import load_tables
from neo4j_arrow_spark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    write_bucketed(tables["orders"], "b_orders", "o_orderkey", buckets=8)
    write_bucketed(tables["lineitem"], "b_lineitem", "l_orderkey", buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the sort-merge path: a broadcast join would also be
    # exchange-free and mask what bucketing buys
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_colocated_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    tables = load_tables(spark, sf_dir)
    expected = (
        tables["orders"]
        .join(
            tables["lineitem"],
            tables["orders"]["o_orderkey"] == tables["lineitem"]["l_orderkey"],
        )
        .count()
    )
    got = colocated_join(spark, lt, rt, "o_orderkey", "l_orderkey").count()
    assert got == expected and got > 0


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    # partial+final agg on the bucket key needs no shuffle either
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
