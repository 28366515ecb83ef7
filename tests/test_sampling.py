"""Dataset selection operators (operators/sampling.py): split
coverage/determinism, stratified sample size and reproducibility,
vocabulary ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.sampling import (
    build_vocab,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 1000).withColumnRenamed("id", "doc_id")


def test_hash_split_partitions_everything_once(spark, ids):
    out = hash_split(ids, "doc_id")
    assert out.count() == 1000
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "valid", "test"}
    assert counts["train"] > 900  # 98% nominal

    # deterministic: same assignment on recompute and on a reshuffle
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids.repartition(7), "doc_id").collect()
    }
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_hash_split_validates_percentages(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", {"train": 50, "test": 40})


def test_stratified_sample_k_per_label(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(100)], "doc_id long, lab string"
    )
    out = stratified_sample(df, "lab", "doc_id", k=5)
    counts = {r["lab"]: r["n"] for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 5}
    # reproducible, and a different seed gives a different sample
    s0 = sorted(r["doc_id"] for r in stratified_sample(df, "lab", "doc_id", 5).collect())
    s0b = sorted(r["doc_id"] for r in stratified_sample(df, "lab", "doc_id", 5).collect())
    s1 = sorted(r["doc_id"] for r in stratified_sample(df, "lab", "doc_id", 5, seed=9).collect())
    assert s0 == s0b and s0 != s1


def test_build_vocab_order_and_cut(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple banana"),
            (3, "apple cherry"),
            (4, "durian"),
        ],
        "doc_id long, text string",
    )
    rows = build_vocab(docs, "doc_id", min_df=2, top_n=2).collect()
    got = [(r["token"], r["df"], r["rank"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # df: apple 3 docs, banana 2; cherry/durian below min_df
    assert got == [("apple", 3, 1), ("banana", 2, 2)]


def test_weighted_sample_extremes_and_determinism(spark):
    from neo4j_arrow_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(50)] + [(i, 0.0) for i in range(50, 100)],
        "doc_id long, w double",
    )
    kept = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w").collect())
    # weight 1.0 always kept, weight 0.0 never
    assert kept == list(range(50))
    # mid-probability: reproducible, seed-sensitive, roughly proportional
    half = spark.createDataFrame([(i, 0.5) for i in range(1000)], "doc_id long, w double")
    a = sorted(r["doc_id"] for r in weighted_sample(half, "doc_id", "w").collect())
    b = sorted(r["doc_id"] for r in weighted_sample(half, "doc_id", "w").collect())
    c = sorted(r["doc_id"] for r in weighted_sample(half, "doc_id", "w", seed=7).collect())
    assert a == b and a != c
    assert 400 < len(a) < 600
