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


# -- Arrow IPC writer ------------------------------------------------------

def test_arrow_writer_roundtrip(spark, tmp_path):
    from neo4j_arrow_spark.sources.arrow_source import register

    register(spark)
    df = spark.createDataFrame(
        [(1, "a", [0.1, 0.2]), (2, "b", [0.3, 0.4])],
        "id long, name string, vec array<double>",
    ).repartition(2)
    out = str(tmp_path / "ipc")
    df.write.format("neo4j_arrow").option("path", out).mode("append").save()
    import os
    files = [f for f in os.listdir(out) if f.endswith(".arrows")]
    assert files and "_SUCCESS" in os.listdir(out)
    back = spark.read.format("neo4j_arrow").option("path", out).load()
    got = sorted((r.id, r.name, tuple(r.vec)) for r in back.collect())
    assert got == [(1, "a", (0.1, 0.2)), (2, "b", (0.3, 0.4))]


def test_arrow_writer_overwrite_clears_previous(spark, tmp_path):
    from neo4j_arrow_spark.sources.arrow_source import register

    register(spark)
    out = str(tmp_path / "ipc2")
    a = spark.range(5).selectExpr("id", "id * 2 AS v")
    a.write.format("neo4j_arrow").option("path", out).mode("append").save()
    b = spark.range(3).selectExpr("id", "id * 10 AS v")
    b.write.format("neo4j_arrow").option("path", out).mode("overwrite").save()
    back = spark.read.format("neo4j_arrow").option("path", out).load()
    assert back.count() == 3
    assert {r.v for r in back.collect()} == {0, 10, 20}


def test_arrow_writer_empty_partitions_write_no_files(spark, tmp_path):
    from neo4j_arrow_spark.sources.arrow_source import register

    register(spark)
    out = str(tmp_path / "ipc3")
    df = spark.range(2).repartition(8)  # 6+ empty partitions
    df.write.format("neo4j_arrow").option("path", out).mode("append").save()
    import os
    files = [f for f in os.listdir(out) if f.endswith(".arrows")]
    assert 0 < len(files) <= 2
    back = spark.read.format("neo4j_arrow").option("path", out).load()
    assert back.count() == 2
