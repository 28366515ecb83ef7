"""KMV distinct sketch (operators/sketches.py): exact below k,
estimate accuracy above k, duplicate insensitivity, determinism."""

from __future__ import annotations

from neo4j_arrow_spark.operators.sketches import kmv_distinct


def _kmv(spark, rows, k):
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_distinct(df, ["g"], "v", k=k)
    return {r["g"]: r["n_kmv"] for r in out.collect()}


def test_exact_below_k_and_duplicate_insensitive(spark):
    rows = [("a", i) for i in range(10)] * 3 + [("b", 7)]
    got = _kmv(spark, rows, k=64)
    assert got == {"a": 10, "b": 1}


def test_estimate_accuracy_above_k(spark):
    n = 5000
    rows = [("g", i * 2654435761 % (1 << 31)) for i in range(n)]
    got = _kmv(spark, rows, k=256)
    assert abs(got["g"] - n) / n < 0.15  # KMV rel-err ~ 1/sqrt(k) ≈ 6%


def test_partitioning_invariance(spark):
    rows = [("g", i) for i in range(1000)]
    df1 = spark.createDataFrame(rows, "g string, v long").repartition(1)
    df32 = spark.createDataFrame(rows, "g string, v long").repartition(32)
    a = kmv_distinct(df1, ["g"], "v", k=32).collect()[0]["n_kmv"]
    b = kmv_distinct(df32, ["g"], "v", k=32).collect()[0]["n_kmv"]
    assert a == b
