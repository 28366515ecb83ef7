"""Similarity search over embedding columns.

- :func:`cosine_topk` — brute-force exact top-k: the correctness
  baseline. O(|Q|·|N|); fine when the query set is small or as the
  per-bucket kernel.
- :func:`ivf_assign` / :func:`ivf_topk` — IVF-style approximate
  search: vectors are bucketed by nearest centroid, queries probe only
  ``nprobe`` closest centroid buckets. The 100 TB path: centroids are
  broadcast-size, the bucket assignment is a narrow map, and the
  search join is an equi-join on bucket id.

Scores use the deterministic sequential-fold cosine from
:mod:`~neo4j_arrow_spark.operators.dedup`, rounded to 6 digits, with
id tie-breaks — reproducible on DuckDB for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.dedup import cosine, cosine_prenormed, norm


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    ``queries`` rows join against every item (broadcast the query side
    when small — Catalyst does this automatically under AQE since the
    query frame is tiny relative to items). Norms precomputed per row,
    one dot per pair. Ranking: (cos desc, neighbor id asc) via
    row_number — fully deterministic.

    Output: (query_id, neighbor_id, rank, cos).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    n = items.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        norm(F.col(vec_col)).alias("nn"),
    )
    scored = q.join(n, how="cross").select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_prenormed(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")), 6
        ).alias("cos"),
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos")
    )


def ivf_assign(
    items: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign every item to its nearest centroid (max cosine, centroid
    id tie-break). centroids must be small (it is broadcast).

    Output: (item id, bucket, cos_to_centroid)."""
    c = centroids.select(
        F.col(id_col).alias("bucket"), F.col(vec_col).alias("cv")
    )
    scored = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("iv")
    ).join(F.broadcast(c), how="cross").select(
        "item_id",
        "bucket",
        F.round(cosine(F.col("iv"), F.col("cv")), 6).alias("ccos"),
    )
    w = Window.partitionBy("item_id").orderBy(
        F.col("ccos").desc(), F.col("bucket").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("item_id", "bucket", "ccos")
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroid buckets
    of each query and rank exactly within them.

    The item·query pairing is an equi-join on bucket — at scale this is
    the difference between |Q|·|N| and |Q|·|N|/n_buckets·nprobe.
    Output: (query_id, neighbor_id, rank, cos)."""
    c = centroids.select(F.col(id_col).alias("bucket"), F.col(vec_col).alias("cv"))
    assigned = ivf_assign(items, centroids, id_col, vec_col).join(
        items.select(
            F.col(id_col).alias("item_id"),
            F.col(vec_col).alias("nv"),
            norm(F.col(vec_col)).alias("nn"),
        ),
        "item_id",
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    q_scored = q.join(F.broadcast(c), how="cross").select(
        "query_id",
        "qv",
        "qn",
        "bucket",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("qcos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("bucket").asc()
    )
    probes = (
        q_scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "qn", "bucket")
    )

    scored = probes.join(assigned, "bucket").select(
        "query_id",
        F.col("item_id").alias("neighbor_id"),
        F.round(
            cosine_prenormed(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")), 6
        ).alias("cos"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos")
    )
