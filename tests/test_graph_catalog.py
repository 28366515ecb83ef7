from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.catalog import GraphAlreadyExists, GraphCatalog, GraphNotFound
from neo4j_arrow_spark.graph import GraphSchemaError, validate_nodes
from neo4j_arrow_spark.sources.tpch import load_tables
from neo4j_arrow_spark.sources.tpch_graph import (
    NATION_OFFSET,
    SUPPLIER_OFFSET,
    graph_frames_from_tpch,
)


@pytest.fixture(scope="module")
def tpch_graph(spark, sf_dir):
    tables = load_tables(spark, sf_dir, ("customer", "supplier", "nation", "orders", "lineitem"))
    return graph_frames_from_tpch(spark, tables), tables


def test_derived_graph_counts(tpch_graph):
    (nodes, rels), tables = tpch_graph
    n_customer = tables["customer"].count()
    n_supplier = tables["supplier"].count()
    n_nation = tables["nation"].count()
    assert nodes.count() == n_customer + n_supplier + n_nation
    assert rels.count() == n_customer + n_supplier + tables["lineitem"].count()


def test_id_spaces_disjoint(tpch_graph):
    (nodes, _), _ = tpch_graph
    ids = nodes.select("ID")
    assert ids.count() == ids.distinct().count()
    # offsets respected
    assert nodes.filter(
        F.array_contains("LABELS", "Supplier") & (F.col("ID") < SUPPLIER_OFFSET)
    ).count() == 0
    assert nodes.filter(
        F.array_contains("LABELS", "Nation") & (F.col("ID") < NATION_OFFSET)
    ).count() == 0


def test_catalog_register_get_drop(spark, tpch_graph):
    (nodes, rels), _ = tpch_graph
    cat = GraphCatalog(spark)
    g = cat.register("g1", nodes, rels)
    assert cat.get("g1") is g
    # temp views exist for spark.sql (S1 capability)
    assert spark.sql("SELECT count(*) AS n FROM g1_nodes").collect()[0]["n"] > 0
    with pytest.raises(GraphAlreadyExists):
        cat.register("g1", nodes, rels)
    cat.register("g1", nodes, rels, overwrite=True)
    cat.drop("g1")
    with pytest.raises(GraphNotFound):
        cat.get("g1")


def test_schema_validation(spark):
    bad = spark.createDataFrame([(1, "x")], "ID long, LABELS string")
    with pytest.raises(GraphSchemaError):
        validate_nodes(bad)
    ok = spark.createDataFrame(
        [(1, ["User"], 1.5)], "ID long, LABELS array<string>, score double"
    )
    validate_nodes(ok)


def test_graph_metadata_api(spark, tpch_graph):
    (nodes, rels), _ = tpch_graph
    cat = GraphCatalog(spark)
    g = cat.register("gmeta", nodes, rels, overwrite=True)
    assert "Supplier" in g.labels()
    assert g.rel_types() == ["BUYS_FROM", "IN_NATION"]
    assert g.node_properties() == ["name", "acctbal"]
    assert g.rel_properties() == ["weight"]
    cat.drop("gmeta")


def test_project_rels_aggregations(spark):
    from neo4j_arrow_spark.graph import project_rels

    rels = spark.createDataFrame(
        [(1, 2, "T", 3.0), (1, 2, "T", 5.0), (1, 3, "T", 1.0),
         (1, 2, "U", 9.0)],
        "START_ID long, END_ID long, TYPE string, weight double",
    )
    got = {(r.START_ID, r.END_ID, r.TYPE): r
           for r in project_rels(rels, weight="weight").collect()}
    assert got[(1, 2, "T")].weight == 8.0
    assert got[(1, 2, "T")].parallel_count == 2
    assert got[(1, 2, "U")].weight == 9.0
    mins = {(r.START_ID, r.END_ID, r.TYPE): r.weight for r in
            project_rels(rels, weight="weight", aggregation="min").collect()}
    assert mins[(1, 2, "T")] == 3.0
    single = {(r.START_ID, r.END_ID, r.TYPE): r.weight for r in
              project_rels(rels, weight="weight", aggregation="single").collect()}
    assert single[(1, 2, "T")] == 3.0  # deterministic SINGLE = min
    import pytest
    with pytest.raises(ValueError):
        project_rels(rels, weight="weight", aggregation="avg2")
