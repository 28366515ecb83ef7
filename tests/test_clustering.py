"""Integer-exact k-means (operators/clustering.py)."""

from __future__ import annotations

from neo4j_arrow_spark.operators.clustering import kmeans_fixed


def _assign(spark, rows, k, iterations):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_fixed(df, "vec_id", "embedding", k=k, iterations=iterations)
    return {r["vec_id"]: r["cluster"] for r in out.collect()}


def test_two_obvious_clusters(spark):
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.1, 0.1]),
        (3, [10.1, 9.9]),
        (4, [0.05, -0.05]),
        (5, [9.9, 10.05]),
    ]
    got = _assign(spark, rows, k=2, iterations=2)
    # seeds are vec 0 and vec 1; near-origin points follow cluster 0
    assert got[0] == got[2] == got[4] == 0
    assert got[1] == got[3] == got[5] == 1


def test_partitioning_invariance(spark):
    rows = [(i, [float((i * 13) % 7), float((i * 5) % 11)]) for i in range(60)]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(1)
    df32 = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(32)
    a1 = {r["vec_id"]: (r["cluster"], r["qdist"]) for r in
          kmeans_fixed(df1, "vec_id", "embedding", k=3, iterations=2).collect()}
    a32 = {r["vec_id"]: (r["cluster"], r["qdist"]) for r in
           kmeans_fixed(df32, "vec_id", "embedding", k=3, iterations=2).collect()}
    assert a1 == a32


def test_every_vector_assigned_once(spark):
    rows = [(i, [float(i), 0.0]) for i in range(20)]
    got = _assign(spark, rows, k=4, iterations=1)
    assert len(got) == 20
    assert set(got.values()) <= {0, 1, 2, 3}


def test_join_assignment_matches_literal(spark):
    # the broadcast-join path must be bit-identical to the literal
    # path, including the lowest-cluster tie-break
    rows = [(i, [float((i * 13) % 7), float((i * 5) % 11)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lit = {r["vec_id"]: (r["cluster"], r["qdist"]) for r in
           kmeans_fixed(df, "vec_id", "embedding", k=5, iterations=2,
                        assign="literal").collect()}
    jn = {r["vec_id"]: (r["cluster"], r["qdist"]) for r in
          kmeans_fixed(df, "vec_id", "embedding", k=5, iterations=2,
                       assign="join").collect()}
    assert lit == jn


def test_large_k_join_path(spark):
    # k=512, dim=64 — the plan-literal path would be a ~33k-node
    # expression tree; auto mode must take the join path and complete
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_fixed(df, "vec_id", "embedding", k=512, iterations=1)
    got = out.collect()
    assert len(got) == 1200
    assert len({r["cluster"] for r in got}) > 256  # most seeds keep members
