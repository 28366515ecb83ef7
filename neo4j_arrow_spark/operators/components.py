"""Connected components via alternating large-star / small-star.

The reference streams graphs out to external tooling for analytics
(README.md:23-39); an engine replacing it should close the loop on the
most common whole-graph primitive. Implemented with the two-phase
star-contraction algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) rather than naive label propagation:

- label propagation needs O(diameter) rounds — a 100 TB web-ish graph
  can have diameter in the hundreds;
- alternating star rounds converge in O(log n) and every round is two
  bounded shuffles (groupBy min + equi-join), no frontier explosion.

Each round's edge set is ``localCheckpoint``-ed: iterative plans
otherwise accumulate lineage that re-executes from the source on every
action (on a real cluster, use a checkpoint dir on HDFS/S3 instead of
local checkpoints to survive executor loss).

Determinism: the component label is the minimum node id of the
component — a set property, independent of partitioning or iteration
order — which is what lets a recursive-CTE oracle hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, min(Γ(u) ∪ {u})) for every neighbor v > u — hangs all large
    neighbors under the local minimum.

    Deliberately NOT pre-partitioned on u (r11 A/B): the min aggregate
    partial-aggregates map-side so its shuffle carries ~|V| rows, and
    the planner broadcasts the aggregated min-frame into the neighbor
    join — the raw 2|E| frame never shuffles. An explicit repartition
    "shared exchange" adds a full 2|E| shuffle and measured 1.7x
    SLOWER at sf0.1 (5.5s -> 9.2s connected_components)."""
    both = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = (
        both.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("m"))
    )
    return (
        both.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct each edge toward its larger endpoint; hang that node and
    all its smaller neighbors under the minimum neighbor. Like
    :func:`_large_star`, not pre-partitioned: partial agg + broadcast
    min-frame beat a raw-edge exchange here (r11 A/B)."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    hang = directed.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = m.select(F.col("u"), F.col("m").alias("v"))
    return hang.unionAll(self_edge).filter(F.col("u") != F.col("v")).distinct()


def _checksum(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``
    (columns ``u``, ``v``; orientation and duplicates irrelevant).

    Returns ``(node long, comp long)`` with ``comp`` = min node id of
    the component, one row per node that appears in ``edges`` (plus any
    extra ids in ``nodes['node']``, which come out as singletons unless
    connected)."""
    # lazy checkpoints: the checksum collect on the next line is the
    # materializing action, so each round runs ONE job instead of an
    # eager-checkpoint job followed by a checksum job; the checkpoint
    # blocks still truncate lineage for every later consumer
    e = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = _checksum(e)
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _checksum(nxt)
        e.unpersist()
        e = nxt
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"did not converge in {max_iterations} iterations")

    # converged: every edge is (node -> component root)
    roots = e.select(F.col("v").alias("node")).distinct()
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("comp")).unionByName(
        roots.select("node", F.col("node").alias("comp"))
    )
    if nodes is not None:
        missing = nodes.select(F.col("node").cast("long")).exceptAll(
            labels.select("node")
        )
        labels = labels.unionByName(
            missing.select("node", F.col("node").alias("comp"))
        )
    return labels
