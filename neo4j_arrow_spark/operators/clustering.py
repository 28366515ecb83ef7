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

Scale shape: centroids are MODEL PARAMETERS (k × dim integers), so
they live on the driver between iterations — exactly how spark.ml's
KMeans iterates. Assignment is strategy-switched on k: small k enters
the pass as literal arrays (map-only argmin — no join, no shuffle);
past ``JOIN_ASSIGN_THRESHOLD`` the centroids become a broadcast frame
and the argmin is a broadcast join + min-struct aggregation, keeping
the plan size k-independent at IVF-scale nlist (the round-3 audit's
large-k concern). The per-iteration update is ONE hash aggregation
with map-side partial combine: ``groupBy(cluster).agg(sum(qv[i])...)``
— dim sum columns, not a posexplode row blowup. Per iteration that
is a single narrow job; the only shuffled rows are k per partition.
Seeding: the k lowest-id vectors (deterministic; swap in k-means||
offline if quality matters more than replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.dedup import QUANT_SCALE

__all__ = ["kmeans_fixed", "lloyd_centroids"]


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


def _lit_vec(values: list[int]):
    # one ArrayType Literal node — NOT CreateArray over dim scalar
    # literals, which inflates analysis/codegen time quadratically
    return F.lit([int(v) for v in values]).cast("array<long>")


#: above this k, assignment switches from plan-literal centroids to a
#: broadcast centroid frame + join: the literal expression tree grows
#: O(k·dim) and chokes analysis/codegen at IVF-scale nlist, while the
#: join plan is k-independent (same shape as similarity.ivf_assign)
JOIN_ASSIGN_THRESHOLD = 64


def _assign_literal(q: DataFrame, centroids: list[tuple[int, list[int]]], id_col: str):
    """Map-only argmin against literal centroids: ``(id, cluster,
    qdist)``. Ties break to the lowest cluster id (scan order).
    Zero shuffle — the right plan while k·dim stays plan-sized."""
    dists = [
        _sqdist(F.col("qv"), _lit_vec(cv)).alias(f"_d{c}") for c, cv in centroids
    ]
    scored = q.select(F.col(id_col), F.col("qv"), *dists)
    dcols = [F.col(f"_d{c}") for c, _ in centroids]
    # F.least needs >= 2 columns; a codebook can collapse to one
    # centroid when every other cluster loses all members
    best = F.least(*dcols) if len(dcols) > 1 else dcols[0]
    cluster = F.lit(None).cast("long")
    for c, _ in reversed([*centroids]):
        cluster = F.when(F.col(f"_d{c}") == best, F.lit(c)).otherwise(cluster)
    return scored.select(
        F.col(id_col), F.col("qv"), cluster.alias("cluster"), best.alias("qdist")
    )


def _assign_join(q: DataFrame, centroids: list[tuple[int, list[int]]], id_col: str):
    """Broadcast-join argmin for large k: centroids become a k-row
    broadcast frame, every vector scores all k in the joined stage,
    and one hash aggregation keeps the min — the struct min orders by
    (qdist, cluster), reproducing the literal path's lowest-cluster
    tie-break exactly. One shuffle keyed by ``id_col`` (high
    cardinality, skew-free); map-side partial min keeps the exchange
    at ~|data| rows. Centroid payload at nlist=65k, dim=256 is ~130 MB
    of longs — still broadcast range."""
    spark = q.sparkSession
    cent = spark.createDataFrame(
        [(c, [int(v) for v in cv]) for c, cv in centroids],
        "cluster long, _cv array<long>",
    )
    scored = q.join(F.broadcast(cent)).select(
        F.col(id_col),
        F.col("qv"),
        F.col("cluster"),
        _sqdist(F.col("qv"), F.col("_cv")).alias("qdist"),
    )
    m = F.min(F.struct("qdist", "cluster", "qv")).alias("_m")
    return scored.groupBy(id_col).agg(m).select(
        F.col(id_col),
        F.col("_m.qv").alias("qv"),
        F.col("_m.cluster").alias("cluster"),
        F.col("_m.qdist").alias("qdist"),
    )


def _assign(
    q: DataFrame,
    centroids: list[tuple[int, list[int]]],
    id_col: str,
    strategy: str = "auto",
):
    if strategy == "join" or (
        strategy == "auto" and len(centroids) > JOIN_ASSIGN_THRESHOLD
    ):
        return _assign_join(q, centroids, id_col)
    return _assign_literal(q, centroids, id_col)


def lloyd_centroids(
    q: DataFrame,
    id_col: str,
    k: int = 4,
    iterations: int = 2,
    assign: str = "auto",
) -> list[tuple[int, list[int]]]:
    """Run ``iterations`` rounds of Lloyd's algorithm over an already
    quantized ``(id_col, qv)`` frame and return the final centroid list
    ``[(cluster, centroid_vector)]`` — the reusable training core
    shared by :func:`kmeans_fixed` and the product-quantization
    codebooks in operators/similarity.py."""
    # seeds: k lowest ids — a TakeOrdered, never a global sort
    seed_rows = q.orderBy(F.col(id_col)).limit(k).collect()
    centroids = [(i, list(r["qv"])) for i, r in enumerate(seed_rows)]
    dim = len(centroids[0][1])

    sums = [F.sum(F.col("qv")[i]).alias(f"_s{i}") for i in range(dim)]
    for _ in range(iterations):
        assigned = _assign(q, centroids, id_col, assign)
        rows = (
            assigned.groupBy("cluster")
            .agg(F.count("*").alias("_n"), *sums)
            .collect()
        )
        def _tdiv(a: int, b: int) -> int:
            # truncation toward zero — Spark `div` and DuckDB `//`
            # semantics (Python's // floors, which differs on negatives)
            return -(-a // b) if a < 0 else a // b

        centroids = sorted(
            (
                int(r["cluster"]),
                [_tdiv(int(r[f"_s{i}"]), int(r["_n"])) for i in range(dim)],
            )
            for r in rows
        )
    return centroids


def kmeans_fixed(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 2,
    assign: str = "auto",
) -> DataFrame:
    """Run ``iterations`` rounds of Lloyd's algorithm and return the
    final assignment ``(id_col, cluster, qdist)`` — cluster is the
    0-based seed rank, qdist the integer squared-L2 distance to the
    final centroid (quantized units). Clusters that lose all members
    drop out (matching the unrolled SQL oracle)."""
    q = vectors.select(F.col(id_col), _quantize(vec_col).alias("qv"))
    centroids = lloyd_centroids(q, id_col, k, iterations, assign)
    return _assign(q, centroids, id_col, assign).select(id_col, "cluster", "qdist")
