from __future__ import annotations

import math

import pytest

from neo4j_arrow_spark.operators.rel_scan import PropertyNotFound, gds_relationships


@pytest.fixture(scope="module")
def rels(spark):
    return spark.createDataFrame(
        [
            (0, 1, "FOLLOWS", 1.0, 5.0),
            (1, 2, "PAYS", 2.5, None),
            (2, 0, "KNOWS", None, 7.0),
        ],
        "START_ID long, END_ID long, TYPE string, weight double, cost double",
    )


def test_melt_one_row_per_edge_property(rels):
    out = gds_relationships(rels)
    assert out.columns == ["START_ID", "END_ID", "TYPE", "property", "value"]
    assert out.count() == 6  # 3 edges x 2 properties


def test_nan_fallback_for_missing(rels):
    out = gds_relationships(rels, properties=["weight"])
    row = {r.START_ID: r.value for r in out.collect()}
    assert math.isnan(row[2])
    assert row[1] == 2.5


def test_type_filter(rels):
    out = gds_relationships(rels, filters=["PAYS", "KNOWS"])
    assert sorted(set(r.TYPE for r in out.collect())) == ["KNOWS", "PAYS"]


def test_missing_property_raises(rels):
    with pytest.raises(PropertyNotFound):
        gds_relationships(rels, properties=["nope"])


def test_propertyless_table(spark):
    bare = spark.createDataFrame(
        [(0, 1, "FOLLOWS")], "START_ID long, END_ID long, TYPE string"
    )
    out = gds_relationships(bare)
    r = out.collect()[0]
    assert r.property is None and math.isnan(r.value)
