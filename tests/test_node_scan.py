from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.node_scan import PropertyNotFound, gds_nodes


@pytest.fixture(scope="module")
def nodes(spark):
    return spark.createDataFrame(
        [
            (0, ["User"], 30, 0.5, [0.1, 0.2]),
            (1, ["User", "Admin"], 40, 0.9, [0.3, 0.4]),
            (2, ["Account"], None, 0.1, None),
            (3, ["Merchant"], 25, None, [0.5, 0.6]),
        ],
        "ID long, LABELS array<string>, age long, score double, embedding array<double>",
    )


def test_full_scan_all_properties(nodes):
    out = gds_nodes(nodes)
    assert out.columns == ["ID", "LABELS", "age", "score", "embedding"]
    assert out.count() == 4


def test_projection(nodes):
    out = gds_nodes(nodes, properties=["score"])
    assert out.columns == ["ID", "LABELS", "score"]


def test_label_filter_any_semantics(nodes):
    out = gds_nodes(nodes, filters=["User", "Merchant"])
    assert sorted(r.ID for r in out.collect()) == [0, 1, 3]


def test_missing_property_raises(nodes):
    with pytest.raises(PropertyNotFound):
        gds_nodes(nodes, properties=["nope"])


def test_node_id_remap(nodes):
    out = gds_nodes(nodes, properties=["score"], node_id="age")
    rows = {r.ID: r.score for r in out.collect() if r.ID is not None}
    assert rows[30] == 0.5
    assert rows[40] == 0.9


def test_projection_prunes_parquet_scan(spark, sf_dir):
    """Column pruning must reach the parquet ReadSchema."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("ID"),
        F.array(F.lit("Customer")).alias("LABELS"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    out = gds_nodes(cust, properties=["acctbal"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "c_name" not in plan  # pruned
