"""Edge packing round-trip — the reference's EdgePackingTest semantics
(plugin/src/test/java/org/neo4j/arrow/job/EdgePackingTest.java:9-38,
including the 300M-id case)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_arrow_spark.functions import edge


def test_roundtrip_including_300m_ids(spark):
    rows = [(0, 1), (1, 0), (300_000_000, 299_999_999), (42, 42), (0, 0)]
    df = spark.createDataFrame(rows, "src long, dst long")
    out = df.select(
        "src",
        "dst",
        edge.pack_edge(F.col("src"), F.col("dst"), True).alias("p_nat"),
        edge.pack_edge(F.col("src"), F.col("dst"), False).alias("p_rev"),
    ).select(
        "src",
        "dst",
        edge.unpack_source(F.col("p_nat")).alias("s1"),
        edge.unpack_target(F.col("p_nat")).alias("t1"),
        edge.is_natural(F.col("p_nat")).alias("n1"),
        edge.unpack_source(F.col("p_rev")).alias("s2"),
        edge.is_natural(F.col("p_rev")).alias("n2"),
    )
    for r in out.collect():
        assert r.s1 == r.src and r.t1 == r.dst
        assert r.n1 is True and r.n2 is False
        assert r.s2 == r.src


def test_packable_bounds(spark):
    df = spark.createDataFrame(
        [(1, 2), (1 << 30, 0), (-1, 5)], "src long, dst long"
    )
    got = [r[0] for r in df.select(edge.packable(F.col("src"), F.col("dst"))).collect()]
    assert got == [True, False, False]
