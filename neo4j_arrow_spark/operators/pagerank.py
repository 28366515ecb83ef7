"""PageRank with fixed-point integer arithmetic.

Why integer: floating-point PageRank sums contributions in partition
order, so two runs (or two engines) legitimately differ in the last
ulps — unverifiable by an exact oracle. Quantizing ranks to integer
micro-units makes every operation (integer div by out-degree, integer
sum, integer damping) associative and order-independent: the result is
bit-identical on any partitioning, any engine. Same trick as the
quantized embedding kernels in operators/similarity.py.

Per iteration: one equi-join (ranks ⋈ edges) + one shuffle aggregation
(sum by target) — the canonical scalable plan. Ranks frames are
``localCheckpoint``-ed every round to cut iterative lineage (use a
durable checkpoint dir on a real cluster).

Semantics: un-normalized rank, r0 = SCALE for every node, then
``r'(v) = (15·SCALE)/100 + (85·Σ_{u→v} r(u) div outdeg(u))/100``
(all divisions integer). Dangling-node mass is not redistributed —
documented simplification, identical in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_fixed", "SCALE"]

SCALE = 1_000_000


def pagerank_fixed(
    edges: DataFrame, iterations: int = 3, scale: int = SCALE
) -> DataFrame:
    """Integer-quantized PageRank over directed ``edges (u, v)``.
    Returns ``(node long, rank long)`` for every node appearing as
    source or target. Parallel edges are deduplicated."""
    e = edges.select(F.col("u").cast("long"), F.col("v").cast("long")).distinct()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    outdeg = e.groupBy("u").agg(F.count("*").alias("deg"))
    fanout = e.join(outdeg, "u").persist()
    fanout.count()  # materialize once; reused every iteration

    base = 15 * scale // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contribs = (
            fanout.join(ranks, fanout["u"] == ranks["node"])
            .select(F.col("v").alias("node"), F.expr("rank div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.expr(f"{base} + (85 * coalesce(c, 0)) div 100").alias("rank"),
            )
            .localCheckpoint()
        )
    nodes.unpersist()
    fanout.unpersist()
    return ranks
