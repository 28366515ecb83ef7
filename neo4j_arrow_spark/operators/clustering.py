"""K-means over embedding columns, integer-exact for a fixed
iteration count — the training half of the IVF index in
operators/similarity.py (which consumes a centroid table).

Determinism contract (same rationale as operators/pagerank.py):
vectors are quantized to 20-fractional-bit integers (the
operators/dedup.py convention, shared with the oracle), distances are
integer squared-L2, centroid updates are element-wise integer means
(sum div count) — every reduction is order-independent, so k-means
for a FIXED number of iterations is a pure function of the data,
bit-identical on any engine/partitioning. (Float k-means is famously
run-to-run unstable; fixing iterations + integer arithmetic is what
makes an exact cross-engine oracle possible at all.)

Scale shape per iteration: assignment is a broadcast cross join
(k centroids ship to every executor; one narrow pass over vectors),
update is one shuffle of (vector × dim) rows grouped by
(cluster, position). Seeding: the k lowest-id vectors (deterministic;
swap in k-means|| offline if quality matters more than replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.dedup import QUANT_SCALE

__all__ = ["kmeans_fixed"]


def _quantize(vec_col: str):
    return F.transform(
        F.col(vec_col), lambda x: F.round(x * QUANT_SCALE).cast("long")
    )


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def kmeans_fixed(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Run ``iterations`` rounds of Lloyd's algorithm and return the
    final assignment ``(id_col, cluster, qdist)`` — cluster is the
    0-based seed rank, qdist the integer squared-L2 distance to the
    final centroid (quantized units)."""
    q = vectors.select(F.col(id_col), _quantize(vec_col).alias("qv"))

    # distributed top-k (TakeOrderedAndProject) instead of a global
    # row_number window — the seed scan never single-partitions the
    # corpus. The 0-based seed rank over the k survivors is computed
    # windowless (rank = |seeds with smaller id|, broadcast self-join
    # over k rows) since an unpartitioned window warns + single-
    # partitions even on bounded input.
    seeds = q.orderBy(F.col(id_col)).limit(k)
    sa, sb = seeds.alias("sa"), seeds.alias("sb")
    centroids = (
        sa.join(F.broadcast(sb), F.col(f"sb.{id_col}") < F.col(f"sa.{id_col}"), "left")
        .groupBy(F.col(f"sa.{id_col}"), F.col("sa.qv").alias("cv"))
        .agg(F.count(f"sb.{id_col}").alias("cluster"))
        .select("cluster", "cv")
        .localCheckpoint()
    )

    assign = None
    for _ in range(iterations):
        scored = q.join(F.broadcast(centroids), how="cross").select(
            F.col(id_col),
            "cluster",
            _sqdist(F.col("qv"), F.col("cv")).alias("qdist"),
        )
        w = Window.partitionBy(id_col).orderBy("qdist", "cluster")
        assign = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "cluster", "qdist")
        )
        # element-wise integer mean over members -> next centroids
        elems = q.join(assign.select(id_col, "cluster"), id_col).select(
            "cluster", F.posexplode("qv").alias("pos", "val")
        )
        centroids = (
            elems.groupBy("cluster", "pos")
            .agg(F.expr("sum(val) div count(*)").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .localCheckpoint()
        )
    # distances in the returned frame are to the PREVIOUS round's
    # centroids; recompute against the final ones for a clean contract
    final = q.join(F.broadcast(centroids), how="cross").select(
        F.col(id_col),
        "cluster",
        _sqdist(F.col("qv"), F.col("cv")).alias("qdist"),
    )
    w = Window.partitionBy(id_col).orderBy("qdist", "cluster")
    return (
        final.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster", "qdist")
    )
