"""Salted join (functions/skew.py): equivalence with the plain join
on skewed data, duplicate preservation, left-join nulls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.functions.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail, with duplicate rows
    rows = [(1, i % 3) for i in range(900)] + [(k, k) for k in range(2, 102)]
    left = spark.createDataFrame(rows, "k long, payload long")
    right = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (50, "c")], "k long, tag string"
    )
    return left, right


def test_inner_matches_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salts=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_left_join_preserves_unmatched(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", how="left", salts=8)
    assert salted.count() == plain.count() == left.count()
    assert salted.filter(F.col("tag").isNull()).count() == plain.filter(
        F.col("tag").isNull()
    ).count()


def test_rejects_unsupported_how(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")
