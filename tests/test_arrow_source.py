"""Python DataSource reader (sources/arrow_source.py): round-trips a
bulk_import database through spark.read.format("neo4j_arrow"),
including partition-directory pruning via pushed filters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.catalog import GraphCatalog
from neo4j_arrow_spark.operators.ingest import bulk_import
from neo4j_arrow_spark.sources import graph_frames_from_tpch, load_tables
from neo4j_arrow_spark.sources.arrow_source import GraphArrowDataSource


@pytest.fixture(scope="module")
def db_dir(spark, sf_dir, tmp_path_factory):
    nodes, rels = graph_frames_from_tpch(spark, load_tables(spark, sf_dir))
    path = str(tmp_path_factory.mktemp("arrowdb") / "graphdb")
    bulk_import(
        spark, GraphCatalog(spark), path, nodes, rels, register=False
    )
    spark.dataSource.register(GraphArrowDataSource)
    return path


def test_rels_roundtrip_with_type_reinjected(spark, sf_dir, db_dir):
    got = spark.read.format("neo4j_arrow").option("path", f"{db_dir}/rels").load()
    _, rels = graph_frames_from_tpch(spark, load_tables(spark, sf_dir))
    assert got.count() == rels.count()
    got_types = {
        r["TYPE"]: r["n"]
        for r in got.groupBy("TYPE").agg(F.count("*").alias("n")).collect()
    }
    exp_types = {
        r["TYPE"]: r["n"]
        for r in rels.groupBy("TYPE").agg(F.count("*").alias("n")).collect()
    }
    assert got_types == exp_types


def test_nodes_roundtrip_values(spark, sf_dir, db_dir):
    got = spark.read.format("neo4j_arrow").option("path", f"{db_dir}/nodes").load()
    nodes, _ = graph_frames_from_tpch(spark, load_tables(spark, sf_dir))
    assert sorted(got.columns) == sorted(nodes.columns)
    a = sorted(got.select("ID", "name").collect())
    b = sorted(nodes.select("ID", "name").collect())
    assert a == b


def test_type_filter_prunes_partitions(spark, db_dir):
    df = (
        spark.read.format("neo4j_arrow")
        .option("path", f"{db_dir}/rels")
        .load()
        .filter(F.col("TYPE") == "IN_NATION")
    )
    # 160 IN_NATION rels at sf0.001 (150 customers + 10 suppliers)
    assert df.count() == 160
    assert df.select("TYPE").distinct().collect()[0][0] == "IN_NATION"


def test_batch_size_option(spark, db_dir):
    df = (
        spark.read.format("neo4j_arrow")
        .option("path", f"{db_dir}/rels")
        .option("batch_size", "64")
        .load()
    )
    assert df.count() == 6160
