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

__all__ = ["bfs_hops", "label_propagation", "node_similarity"]


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


def node_similarity(
    edges: DataFrame,
    threshold: float = 0.0,
    degree_cutoff: int = 1,
) -> DataFrame:
    """GDS ``nodeSimilarity`` semantics: pairwise Jaccard similarity of
    OUT-neighbor sets for every pair of source nodes that share at
    least one target. Returns ``(node_a, node_b, intersection long,
    similarity double)`` with ``node_a < node_b`` (the relationship is
    symmetric) and ``similarity >= threshold``; similarity is rounded
    to 6 decimals (an exact rational, so cross-engine stable).

    Plan: wedge join — the edge table self-joined on the shared target
    — then one aggregation for intersection sizes and a broadcast-able
    degree join. The wedge join's size is Σ_t deg(t)², so hub targets
    dominate cost; ``degree_cutoff`` (GDS's ``degreeCutoff``) drops
    low-degree SOURCES first, and at 100 TB a target-degree cap or
    AQE skew splitting bounds the hot-target wedges. No driver-side
    loops; every step is a shuffle-partitioned join/agg.
    """
    e = edges.select(F.col("u").cast("long"), F.col("v").cast("long")).distinct()
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    if degree_cutoff > 1:
        deg = deg.filter(F.col("deg") >= degree_cutoff)
        e = e.join(deg.select("u"), "u", "left_semi")
    wedges = (
        e.select(F.col("u").alias("node_a"), "v")
        .join(e.select(F.col("u").alias("node_b"), "v"), "v")
        .filter(F.col("node_a") < F.col("node_b"))
    )
    inter = wedges.groupBy("node_a", "node_b").agg(
        F.count("*").alias("intersection")
    )
    da = deg.select(F.col("u").alias("node_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("u").alias("node_b"), F.col("deg").alias("_db"))
    sim = F.round(
        F.col("intersection")
        / (F.col("_da") + F.col("_db") - F.col("intersection")),
        6,
    )
    return (
        inter.join(F.broadcast(da), "node_a")
        .join(F.broadcast(db), "node_b")
        .select("node_a", "node_b", "intersection", sim.alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


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
