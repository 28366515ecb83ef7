"""Graph algorithms beyond the reference's streaming surface: BFS
shortest hop distance and (GDS-style) frequency label propagation.

The reference extracts graphs so external tooling can run exactly these
algorithms (README.md:23-39; its GDS host exposes them server-side) —
an engine replacing it should run them in place. Both are iterative
frontier/relabel loops of bounded, fixed shape:

- every round is one equi-join + one shuffle aggregation — the scalable
  Pregel-style plan; no per-row traversal, no driver-side loops over
  collected data;
- rounds are ``localCheckpoint``-ed to cut iterative lineage (use a
  durable checkpoint dir on a real cluster);
- results are deterministic on any partitioning (min-hop is a set
  property; LPA uses synchronous updates with a total (count desc,
  label asc) tie-break), which is what lets recursive-CTE / unrolled
  DuckDB oracles hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bfs_hops", "label_propagation"]


def _undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .unionAll(
            edges.select(
                F.col("v").cast("long").alias("u"),
                F.col("u").cast("long").alias("v"),
            )
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def bfs_hops(
    edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Minimum hop distance from a source set over the undirected view
    of ``edges (u, v)`` — the Cypher ``shortestPath``/GDS BFS analogue.

    Returns ``(node long, hop int)`` for every node within
    ``max_hops``; sources themselves are hop 0. Frontier expansion:
    each round joins ONLY the newly-reached frontier against the edge
    table (never the full visited set), anti-joins visited, and stops
    early when the frontier drains — at 100 TB the per-round shuffle is
    bounded by |frontier| × avg-degree, the minimum any BFS must touch.
    """
    und = _undirected(edges).persist()
    visited = (
        sources.select(F.col("node").cast("long"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    und.unpersist()
    return visited


def label_propagation(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Synchronous frequency-based label propagation (the GDS LPA
    semantics made deterministic): every node starts labeled with its
    own id; each round it adopts the most frequent label among its
    neighbors, ties broken by the smallest label. Fixed iteration
    count; synchronous updates (all nodes relabel from the same
    snapshot) so the result is partitioning-independent.

    Returns ``(node long, label long)`` for every node incident to an
    edge. Per round: one equi-join (labels onto edge targets) + two
    shuffle aggregations (label counts, per-node argmax via a single
    ``max(struct(count, -label))`` — no window, no skew pivot).
    """
    und = _undirected(edges).persist()
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).localCheckpoint()
    for _ in range(iterations):
        neigh = und.join(labels, und["v"] == labels["node"]).select(
            und["u"].alias("node"), "label"
        )
        counts = neigh.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        labels = (
            counts.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"),
                        (-F.col("label")).alias("neg"),
                        F.col("label"),
                    )
                ).alias("best")
            )
            .select("node", F.col("best.label").alias("label"))
            .localCheckpoint()
        )
    und.unpersist()
    return labels
