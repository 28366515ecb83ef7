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
    edges: DataFrame,
    iterations: int = 3,
    scale: int = SCALE,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Integer-quantized PageRank over directed ``edges (u, v)``.
    Returns ``(node long, rank long)`` for every node appearing as
    source or target. Parallel edges are deduplicated.

    ``sources`` (a ``(node)`` frame) switches to PERSONALIZED PageRank:
    initial mass and the per-iteration teleport term go only to the
    source set (GDS ``sourceNodes`` semantics) — rank then measures
    proximity to the sources rather than global importance. The source
    flag rides along as a column on the node frame (one broadcast-able
    left join at setup, zero extra per-iteration work).
    """
    # ONE keyed exchange builds the whole static side: the explicit
    # repartition on u lets the (u, v) dedup, the out-degree aggregate
    # and the fan-out join all reuse that partitioning (hash(u)
    # satisfies clustering on (u, v) and on (u) — guide §2.4, "two
    # operations keyed the same way share one exchange"); previously
    # dedup, degree and join each shuffled the edge frame separately.
    par = edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .repartition(par, "u")
        .dropDuplicates(["u", "v"])
    )
    outdeg = e.groupBy("u").agg(F.count("*").alias("deg"))
    fanout = e.join(outdeg, "u").persist()
    # node universe from the cached fan-out (every deduped edge
    # carries its degree row, so the endpoint set is identical)
    nodes = (
        fanout.select(F.col("u").alias("node"))
        .unionAll(fanout.select(F.col("v").alias("node")))
        .distinct()
    )
    if sources is None:
        nodes = nodes.withColumn("_base", F.lit(15 * scale // 100).cast("long"))
        init = F.lit(scale).cast("long")
    else:
        src = sources.select(F.col("node").cast("long")).distinct().withColumn(
            "_is_src", F.lit(True)
        )
        nodes = nodes.join(F.broadcast(src), "node", "left").select(
            "node",
            F.when(F.col("_is_src"), F.lit(15 * scale // 100))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_base"),
        )
        init = F.when(F.col("_base") > 0, F.lit(scale)).otherwise(F.lit(0)).cast(
            "long"
        )
    nodes = nodes.persist()

    ranks = nodes.select("node", init.alias("rank"))
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
                F.expr("_base + (85 * coalesce(c, 0)) div 100").alias("rank"),
            )
            .localCheckpoint()
        )
    nodes.unpersist()
    fanout.unpersist()
    return ranks


def eigenvector_fixed(
    edges: DataFrame, iterations: int = 3, scale: int = SCALE
) -> DataFrame:
    """Integer-quantized eigenvector centrality (GDS
    ``gds.eigenvector`` analogue): power iteration ``x' = Aᵀx`` with
    max-normalization each round, all in integer arithmetic —
    ``x'(v) = (Σ_{u→v} x(u)) · scale div max_w Σ_{u→w} x(u)`` — so the
    result is bit-identical on any partitioning/engine (see module
    docstring). Nodes with no in-edges hold centrality 0, exactly as
    the power iteration drives them.

    Returns ``(node long, centrality long)`` with max = ``scale``.
    Per iteration: one equi-join + one sum-by-target shuffle + a
    1-row max aggregate (the same scalar-collect pattern as the
    connected-components convergence check).
    """
    # one keyed exchange for dedup + every iteration's join side
    # (see pagerank_fixed); caches fill inside the first iteration's
    # job instead of a dedicated count() round-trip
    par = edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .repartition(par, "u")
        .dropDuplicates(["u", "v"])
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    x = nodes.withColumn("centrality", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contribs = (
            e.join(x, e["u"] == x["node"])
            .select(F.col("v").alias("node"), F.col("centrality").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
            # materialize once: the max aggregate AND the normalization
            # projection both read this frame — without the checkpoint
            # the join+agg executes twice per iteration
            .localCheckpoint()
        )
        m = contribs.agg(F.max("c")).collect()[0][0]
        if not m:
            break
        # no checkpoint needed here: contribs IS checkpointed, so this
        # frame's lineage is one join deep (cached nodes ⋈ checkpoint)
        # — the next iteration re-derives it in its own job for one
        # fewer materialization round-trip per iteration
        x = nodes.join(contribs, "node", "left").select(
            "node",
            F.expr(f"(coalesce(c, 0) * {scale}) div {m}").alias("centrality"),
        )
    # materialize the final frame before releasing its cached inputs
    x = x.localCheckpoint()
    nodes.unpersist()
    e.unpersist()
    return x


def pagerank_weighted(
    edges: DataFrame, iterations: int = 3, scale: int = SCALE
) -> DataFrame:
    """Weighted PageRank (GDS ``relationshipWeightProperty`` analogue):
    a node's rank splits over its out-edges proportionally to integer
    edge weights instead of uniformly.

    ``edges (u, v, w)`` carries non-negative integer weights; parallel
    edges are pre-aggregated (``sum(w)`` per pair) so multi-edges mean
    strength, not multiplicity. The per-edge contribution
    ``(rank · w) div W_u`` is computed through the overflow-safe exact
    identity::

        (rank * w) div W = (rank div W) * w + ((rank mod W) * w) div W

    — no ``rank·w`` product ever forms, so int64 holds as long as
    ``W_u · w < 2^63`` (W_u is the node's total out-weight). Same
    fixed-point determinism contract as :func:`pagerank_fixed`; the
    oracle unrolls the identical identity.
    """
    # one keyed exchange for the whole static side (see pagerank_fixed):
    # hash(u) partitioning serves the (u, v) weight aggregate, the
    # total-out-weight aggregate and the fan-out join without further
    # shuffles
    par = edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(
            F.col("u").cast("long"), F.col("v").cast("long"),
            F.col("w").cast("long"),
        )
        .repartition(par, "u")
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .persist()  # shared by the fan-out AND the node universe
    )
    # a node whose weights sum to zero has no mass to give; dropping
    # its fan-out rows avoids an integer division by zero (Spark would
    # yield NULL, DuckDB would error — this keeps both paths identical
    # by never dividing)
    outw = e.groupBy("u").agg(F.sum("w").alias("tw")).filter(F.col("tw") > 0)
    fanout = e.join(outw, "u").persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("_base", F.lit(15 * scale // 100).cast("long"))
        .persist()
    )

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contribs = (
            fanout.join(ranks, fanout["u"] == ranks["node"])
            .select(
                F.col("v").alias("node"),
                F.expr(
                    "(rank div tw) * w + ((rank % tw) * w) div tw"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.expr("_base + (85 * coalesce(c, 0)) div 100").alias("rank"),
            )
            .localCheckpoint()
        )
    nodes.unpersist()
    fanout.unpersist()
    e.unpersist()
    return ranks
