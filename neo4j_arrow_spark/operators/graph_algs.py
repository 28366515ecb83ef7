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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_arrow_spark.functions.hashing import hash64

__all__ = [
    "bfs_hops",
    "label_propagation",
    "node_similarity",
    "shortest_paths",
    "random_walks",
    "kcore",
    "neighbor_sample",
    "hits_fixed",
    "modularity",
]


def _undirected(edges: DataFrame) -> DataFrame:
    # dedup + join-ready layout in ONE exchange: the explicit hash
    # repartition on u co-locates duplicate (u, v) rows (hash(u)
    # satisfies clustering on (u, v)), so dropDuplicates adds no second
    # shuffle — and every downstream equi-join / groupBy keyed on u
    # (the frontier-expansion joins, degree aggregates) reuses the same
    # partitioning instead of re-shuffling the edge frame per round
    # (guide §2.4). defaultParallelism keeps the width scale-adaptive.
    par = edges.sparkSession.sparkContext.defaultParallelism
    return (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .unionAll(
            edges.select(
                F.col("v").cast("long").alias("u"),
                F.col("u").cast("long").alias("v"),
            )
        )
        .filter(F.col("u") != F.col("v"))
        .repartition(par, "u")
        .dropDuplicates(["u", "v"])
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
    prev = None
    for h in range(1, max_hops + 1):
        # only the new frontier is checkpointed; `visited` stays a
        # lazy union of already-checkpointed rounds (shallow lineage),
        # saving one materialization job per round. The dedup
        # anti-join reads only the LAST TWO levels (und is symmetric,
        # so a frontier neighbor is at depth h-2, h-1 or h — the
        # r11 band argument in _bounded_distances); at scale the
        # anti-join input is the frontier band, not the full reach.
        recent = frontier if prev is None else prev.unionByName(frontier)
        nxt = (
            frontier.join(und, frontier["node"] == und["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(recent, "node", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        prev = frontier
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


def shortest_paths(
    edges: DataFrame, sources: DataFrame, rounds: int = 3
) -> DataFrame:
    """Bounded weighted shortest paths (the GDS Dijkstra/delta-stepping
    analogue as synchronous Bellman-Ford rounds): ``edges (u, v, w)``
    directed with non-negative INTEGER weights, ``sources (node)`` at
    distance 0. After ``rounds`` relaxations every node reachable
    within ``rounds`` edges carries the exact shortest distance among
    paths of that length — fixed iteration count, so the result is a
    pure function of the graph (and an unrolled SQL oracle can verify
    it exactly; integer weights make min() order-independent).

    Per round: one equi-join (distances onto edge sources) + one
    min-aggregation — the Pregel relaxation step; no priority queue, no
    driver-side state. Parallel edges collapse to their min weight up
    front. Returns ``(node long, dist long)``.
    """
    e = (
        edges.select(
            F.col("u").cast("long"),
            F.col("v").cast("long"),
            F.col("w").cast("long"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    dist = (
        sources.select(F.col("node").cast("long"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        relaxed = e.join(dist, e["u"] == dist["node"]).select(
            F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    e.unpersist()
    return dist


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    walk_len: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Deterministic "random" walks (the GDS randomWalk analogue made
    reproducible): from every start node, take ``walk_len`` steps; at
    step t the walker at node n moves to the neighbor v minimizing
    ``md5hash(seed:walk_id:t:v)`` — a uniform-ish choice that is a pure
    function of (walk, step, neighbor), so any engine and any
    partitioning traces the identical walks. Reruns of a sampling
    pipeline reproduce the same corpus — same motivation as the
    hash-based samplers in operators/sampling.py.

    ``edges (u, v)`` is used as given (pass a symmetrized frame for
    undirected walks); ``starts (walk_id, node)`` — walk ids let one
    node launch many walks. Walks ending at a sink node stop (emit no
    further steps). Per step: one equi-join frontier⋈edges + one
    min-struct argmin aggregation — shuffle bounded by |frontier| ×
    avg-degree. Returns ``(walk_id long, step int, node long)`` with
    step 0 = the start node.
    """
    e = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .distinct()
        .persist()
    )
    cur = (
        starts.select(F.col("walk_id").cast("long"), F.col("node").cast("long"))
        .withColumn("step", F.lit(0))
        .localCheckpoint()
    )
    out = cur
    for t in range(1, walk_len + 1):
        draw = hash64(
            F.concat_ws(
                ":",
                F.col("walk_id").cast("string"),
                F.lit(str(t)),
                F.col("v").cast("string"),
            ),
            seed=seed,
        )
        cur = (
            cur.join(e, cur["node"] == e["u"])
            .select("walk_id", F.col("v"), draw.alias("_d"))
            .groupBy("walk_id")
            .agg(F.min(F.struct("_d", "v")).alias("_best"))
            .select(
                "walk_id",
                F.lit(t).alias("step"),
                F.col("_best.v").alias("node"),
            )
            .localCheckpoint()
        )
        out = out.unionByName(cur)
    e.unpersist()  # safe: every round is eagerly checkpointed
    return out


def kcore(edges: DataFrame, k: int = 2, rounds: int = 3) -> DataFrame:
    """Bounded k-core peeling (the GDS kCore analogue): repeatedly drop
    nodes whose undirected degree is below ``k``, ``rounds`` times.
    With enough rounds this converges to the exact k-core; a fixed
    round budget keeps the plan static and the result a pure function
    of the graph (each round can only shrink the survivor set, so
    early convergence is just idempotent extra rounds).

    Per round: one degree aggregation + two semi-joins restricting the
    edge set to surviving endpoints — no driver-side state, shuffle
    bounded by the shrinking |E|. Returns ``(node long, degree long)``
    for survivors, with their degree inside the peeled subgraph.
    """
    und = _undirected(edges).localCheckpoint()
    for _ in range(rounds):
        alive = (
            und.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        und = (
            und.join(alive, "u", "left_semi")
            .join(alive.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
    return und.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("degree")
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


def neighbor_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (10, 5),
    seed: int = 0,
    und: DataFrame | None = None,
) -> DataFrame:
    """GraphSAGE-style minibatch neighbor sampling over the undirected
    view of ``edges (u, v)``: starting from ``seeds (node)``, keep at
    most ``fanouts[l-1]`` neighbors per frontier node at hop ``l``; the
    sampled nodes become the next frontier. Returns one row per
    sampled edge: ``(hop int, u long, v long)``.

    Sampling is DETERMINISTIC: a frontier node's neighbors are ranked
    by the cross-engine md5 hash of "u:v" (tie-break v) and the top-f
    kept — same data, same sample, on any engine (reproducible GNN
    minibatches; no RNG state on executors).

    Scale shape: hop ``l`` shuffles |frontier_l| x avg-degree candidate
    rows for the per-u top-f window — the minimum any fan-out sampler
    touches; the fanout cap keeps frontier growth geometric in the
    fanouts, not the degree distribution (supernode-proof: a hub
    contributes at most f edges per appearance).

    ``und`` (optional): a caller-supplied undirected edge frame — the
    exact set ``_undirected(edges)`` would produce, typically already
    persisted because the caller needs it again (e.g. the invariants
    query's membership anti-join). Supplying it avoids deriving the
    undirected view twice; the caller owns its persist lifecycle.
    """
    if und is None:
        und = _undirected(edges).persist()
        own_und = True
    else:
        own_und = False
    frontier = seeds.select(F.col("node").cast("long")).distinct()
    out = None
    for hop, f in enumerate(fanouts, start=1):
        w = Window.partitionBy("u").orderBy(
            hash64(F.concat_ws(":", F.col("u"), F.col("v")), seed=seed),
            F.col("v"),
        )
        samp = (
            frontier.join(und, frontier["node"] == und["u"])
            .select("u", "v")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= f)
            .select(F.lit(hop).alias("hop"), "u", "v")
            .localCheckpoint()
        )
        out = samp if out is None else out.unionByName(samp)
        frontier = samp.select(F.col("v").alias("node")).distinct()
    if own_und:
        und.unpersist()
    return out


def hits_fixed(
    edges: DataFrame, iterations: int = 2, scale: int = 1_000_000
) -> DataFrame:
    """HITS hubs & authorities over directed ``edges (u, v)`` with
    fixed-point integer arithmetic. Returns ``(node long, hub long,
    auth long)`` for every node appearing as source or target.

    Classic HITS normalizes by the L2 norm — a float reduction whose
    value depends on summation order, unverifiable by an exact oracle.
    Here each half-step renormalizes by the MAX score instead
    (``x' = x * scale // max(x)``): integer sums, integer max, and
    integer division are all associative/order-independent, so the
    result is bit-identical on any partitioning or engine (same trick
    as operators/pagerank.py). The top hub/authority always scores
    exactly ``scale``; relative ordering matches L2-normalized HITS.

    Overflow bound: per-node sums are <= max_degree * scale and the
    rescale multiplies by ``scale`` before dividing — keep
    ``max_degree * scale^2 < 2^63`` (at the default scale: degree up
    to ~9e6).

    Per iteration: two equi-join + shuffle-agg rounds (auth from hubs
    over in-edges, hubs from auth over out-edges) plus two broadcast
    scalar maxes — the Pregel-shaped plan; no driver-side state.
    """
    e = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .distinct()
        .persist()
    )
    # initial hubs: only edge SOURCES need a starting score — a node
    # with no out-edges joins no e.u row, so its initial `scale` can
    # never reach an auth sum; seeding distinct(u) instead of the full
    # endpoint universe halves the seed dedup and drops a persist
    # (identical fixpoint, r11)
    hub = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.lit(scale).cast("long").alias("hub"))
    )
    auth = None

    def _half(scores: DataFrame, col: str, join_key: str, out_key: str, out: str):
        """One HITS half-step: sum `col` over edges grouped by the
        other endpoint, then max-rescale. The raw sums are
        checkpointed ONCE — they feed both the scalar max and the
        rescale; leaving them lazy recomputes the join+agg twice.
        Score frames stay SPARSE (touched nodes only): an absent node
        scores 0, contributes nothing to the next half-step's sums,
        and (scores being non-negative with at least one positive) the
        max over present rows equals the max over all nodes. Zeros are
        filled once at the end instead of per half-step — halves the
        per-iteration join count."""
        raw = (
            e.join(scores, e[join_key] == scores["node"])
            .groupBy(F.col(out_key).alias("node"))
            .agg(F.sum(col).cast("long").alias("s"))
            .localCheckpoint()
        )
        m = raw.agg(F.max("s").alias("_m"))
        return raw.crossJoin(F.broadcast(m)).select(
            "node", F.expr(f"CAST(s * {scale} div _m AS BIGINT)").alias(out)
        )

    for _ in range(iterations):
        auth = _half(hub, "hub", "u", "v", "auth")
        hub = _half(auth, "auth", "v", "u", "hub")
    # after ≥1 iteration hub covers exactly the edge sources and auth
    # exactly the edge targets, so hub ∪ auth IS the endpoint universe
    # — a full outer join replaces the separate nodes frame (one
    # union+distinct+persist and one join fewer; same rows)
    out = hub.join(auth, "node", "full_outer").select(
        "node",
        F.coalesce(F.col("hub"), F.lit(0)).cast("long").alias("hub"),
        F.coalesce(F.col("auth"), F.lit(0)).cast("long").alias("auth"),
    )
    e.unpersist()
    return out


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a community assignment over the undirected
    simple graph of ``edges (u, v)`` — the quality score for LPA/
    Louvain-style partitions. ``labels`` is ``(node, label)``.

    Exact cross-engine arithmetic: with m = |undirected edges|,
    e_c = intra-community edges, d_c = total degree of community c,

        Q = (1/(4m^2)) * SUM_c (4m * e_c - d_c^2)

    The numerator is pure int64 (exact on any engine); the single
    final IEEE division is exactly specified — so Q hash-matches an
    oracle bit-for-bit, unlike the textbook sum of per-community
    doubles (order-dependent). Overflow: needs 4m * max(e_c) and
    max(d_c)^2 < 2^63 — fine below ~10^9 edges; beyond that, scale
    with the decimal(38,0) variant.

    Returns one row: ``(m long, q_numerator long, modularity double)``.
    One shuffle for the canonical edge dedup, two broadcast-able label
    joins, then scalar aggregation.

    Edges whose endpoints lack a label row are EXCLUDED from m (the
    label joins are inner): Q is the modularity of the labeled
    subgraph. m == 0 (empty or fully-unlabeled edge set) short-circuits
    to Q = 0.0 — the defined no-structure value — instead of NULL from
    a 0/0 division.
    """
    canon = (
        edges.select(
            F.least(F.col("u"), F.col("v")).cast("long").alias("a"),
            F.greatest(F.col("u"), F.col("v")).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    lab = labels.select(
        F.col("node").cast("long"), F.col("label").cast("long")
    )
    la = lab.select(F.col("node").alias("a"), F.col("label").alias("_la"))
    lb = lab.select(F.col("node").alias("b"), F.col("label").alias("_lb"))
    tagged = canon.join(la, "a").join(lb, "b").persist()
    m = tagged.count()
    intra = (
        tagged.filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count("*").alias("e_c"))
    )
    deg = (
        tagged.select(F.col("a").alias("node"), "_la")
        .unionAll(tagged.select(F.col("b").alias("node"), "_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count("*").alias("d_c"))
    )
    per_c = deg.join(intra, "label", "left").select(
        "label",
        F.coalesce(F.col("e_c"), F.lit(0)).cast("long").alias("e_c"),
        F.col("d_c").cast("long").alias("d_c"),
    )
    q_col = (
        (F.col("q_numerator") / F.lit(float(4 * m * m)))
        if m > 0
        else F.lit(0.0)
    )
    out = per_c.agg(
        F.coalesce(
            F.sum(
                F.lit(4 * m) * F.col("e_c") - F.col("d_c") * F.col("d_c")
            ),
            F.lit(0),
        ).alias("q_numerator")
    ).select(
        F.lit(m).cast("long").alias("m"),
        F.col("q_numerator").cast("long").alias("q_numerator"),
        q_col.alias("modularity"),
    )
    canon.unpersist()
    tagged.unpersist()
    return out


def harmonic_centrality(
    edges: DataFrame,
    origins: DataFrame | None = None,
    max_hops: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Hop-bounded harmonic closeness centrality (GDS
    ``gds.closeness.harmonic`` analogue, truncated at ``max_hops`` —
    the unbounded sum needs all-pairs distances, which no engine
    computes at 100 TB; the truncated form is the standard large-graph
    variant and exact for graphs with diameter <= max_hops).

    ``h(v) = sum_{u != v, d(u,v) <= max_hops} (scale div d(u,v))``

    over the undirected view of ``edges (u, v)``. Each reciprocal is
    an integer (``scale div d``), so the sum is order-independent and
    bit-exact against the oracle's unrolled min-distance recurrence —
    the same fixed-point rationale as operators/pagerank.py.

    Returns ``(node long, reached long, harmonic_q long)``; nodes that
    reach nobody are omitted (no zero-padding join).

    Plan: labeled multi-origin BFS — the frontier carries (origin,
    node) pairs, expands by one edge join per round, anti-joins the
    visited set per origin, and stops early when it drains. Per-round
    shuffle is bounded by |frontier| x avg-degree, the same budget as
    khop; hot hubs are AQE skew-split.

    100-TB default: pass ``origins=`` with a source SAMPLE (the
    ``harmonic_sampled`` registry query's shape, mirroring GDS's
    samplingSize convention). All-origins join powers materialize every
    (origin, node) pair within max_hops — on a low-diameter graph that
    tends to |V|^2, the one shape here that cannot survive 100x.

    Choosing ``max_hops`` and the sampling rate is DATA-DRIVEN, not a
    guess: run ``operators.anf.anf_curve`` first (linear O(|V|*m)
    state) and read ``operators.anf.effective_diameter_hops`` — the
    90%-plateau hop (the ``anf_effective_diameter`` registry query).
    Cap ``max_hops`` there (hops past the effective diameter multiply
    frontier cost for <10% more pairs), and when ``eff_hops`` is small
    while the plateau approaches |V|^2 q-units, skip the exact
    expansion entirely: the frontier WILL materialize ~|V|^2 rows by
    that hop, so use ``operators.anf.harmonic_anf`` (estimates) or a
    source sample sized to the budget instead.
    """
    dist = _bounded_distances(edges, origins, max_hops)
    return dist.groupBy(F.col("origin").alias("node")).agg(
        F.count("*").alias("reached"),
        F.sum(F.expr(f"{scale} div hop")).alias("harmonic_q"),
    )


def _bounded_distances(
    edges: DataFrame, origins: DataFrame | None, max_hops: int
) -> DataFrame:
    """``(origin, node, hop)`` min-distance pairs with ``1 <= hop <=
    max_hops`` over the undirected view — the shared core of the
    hop-bounded centralities (harmonic, closeness).

    Two physical strategies: for small bounds with all origins,
    deduplicated JOIN POWERS — level k holds the exact-length-k path
    pairs, min(level) is the distance; skips the per-round anti-join +
    checkpoint of the frontier form (measured 1.9x at sf0.1, hop 3).
    The frontier loop stays the shape for larger bounds (reach
    saturates and exact-length levels stop shrinking) and for origin
    subsets (powers would expand every origin before pruning)."""
    und = _undirected(edges).persist()
    if max_hops <= 3 and origins is None:
        # r12: every level dedup rides _undirected's hash(u) exchange.
        # cur1 is (u AS origin, v) — already hash(origin)-partitioned —
        # and when the planner broadcasts the (2|E|-row) step side, the
        # extension join PRESERVES that partitioning, so
        # dropDuplicates(origin, node) is satisfied by the subset key
        # hash(origin) and plans NO exchange: the |V|²-tending walk
        # fan-outs dedup in place, in _undirected's pinned `par`
        # partitions (so the old AQE-coalescing hazard — exchanges
        # squeezed to ~1 partition, measured 2x in r10 — cannot occur:
        # there is no exchange to coalesce). If step is too big to
        # broadcast, the join re-keys and each dedup pays its exchange
        # — exactly the pre-r12 plan, never worse. Only the final
        # min-over-levels aggregate exchanges (the union's partitioning
        # is unknown to the planner), pinned wide explicitly because
        # its input is the full multi-level pair frame.
        par = und.sparkSession.sparkContext.defaultParallelism * 2
        step = und.select(F.col("u").alias("_su"), F.col("v").alias("_sv"))
        cur = und.select(F.col("u").alias("origin"), F.col("v").alias("node"))
        acc = cur.withColumn("hop", F.lit(1))
        for h in range(2, max_hops + 1):
            cur = (
                cur.join(step, cur["node"] == step["_su"])
                .select("origin", F.col("_sv").alias("node"))
                .dropDuplicates(["origin", "node"])
            )
            acc = acc.unionAll(cur.withColumn("hop", F.lit(h)))
        dist = (
            acc.filter(F.col("origin") != F.col("node"))
            .repartition(par, "origin", "node")
            .groupBy("origin", "node")
            .agg(F.min("hop").alias("hop"))
        )
        und.unpersist()
        return dist
    if origins is None:
        starts = und.select(F.col("u").alias("origin")).distinct()
    else:
        starts = origins.select(F.col("node").cast("long").alias("origin")).distinct()
    visited = (
        starts.withColumn("node", F.col("origin"))
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited.select("origin", "node")
    # The dedup anti-join only needs the LAST TWO levels, not the full
    # visited set: over an undirected view, a neighbor of a node at
    # distance h-1 has distance in {h-2, h-1, h} (an edge to any node
    # at distance < h-2 would contradict its parent's distance), so
    # rows excluded by "all visited" and by "levels h-2 ∪ h-1" are the
    # same set. Locally that trims the anti-join's build side; at
    # scale it bounds the per-round anti-join input at the frontier
    # band instead of the whole (origin, node) reach set, which for
    # all-origins tends to |V|² (guide §2.3 — shuffle fewer bytes).
    prev = None
    for h in range(1, max_hops + 1):
        recent = frontier if prev is None else prev.unionByName(frontier)
        nxt = (
            frontier.join(und, frontier["node"] == und["u"])
            .select("origin", F.col("v").alias("node"))
            .distinct()
            .join(recent, ["origin", "node"], "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        prev = frontier
        frontier = nxt.select("origin", "node")
    und.unpersist()
    return visited.filter(F.col("hop") >= 1)


def closeness_centrality(
    edges: DataFrame,
    origins: DataFrame | None = None,
    max_hops: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Hop-bounded closeness centrality (GDS ``gds.closeness`` with its
    component-local convention ``reached / sum-of-distances``, truncated
    at ``max_hops`` like harmonic_centrality — exact for diameters
    <= max_hops, the standard large-graph variant otherwise).

    ``closeness_q(v) = (reached(v) * scale) div total_hops(v)`` — an
    all-integer identity, so the result is order-independent and
    bit-exact against the oracle's recursive-CTE min-distance BFS.
    Returns ``(node long, reached long, total_hops long,
    closeness_q long)``; unreachable nodes are omitted.

    Plan: shares _bounded_distances with harmonic_centrality (join
    powers at small bounds, frontier BFS otherwise) — one extra
    aggregate over the same distance frame, no new shuffle shape.
    Same 100-TB guidance as :func:`harmonic_centrality`: size
    ``max_hops`` / the origin sample from the ANF curve's 90%-plateau
    hop (``anf.effective_diameter_hops`` / the
    ``anf_effective_diameter`` registry query) before paying for the
    exact all-origins frontier."""
    dist = _bounded_distances(edges, origins, max_hops)
    return dist.groupBy(F.col("origin").alias("node")).agg(
        F.count("*").alias("reached"),
        F.sum("hop").alias("total_hops"),
        F.expr(f"(count(*) * {scale}) div sum(hop)").alias("closeness_q"),
    )


def landmark_closeness(
    edges: DataFrame,
    k: int = 8,
    max_hops: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Landmark (pivot) closeness — the scale path between the exact
    all-origins expansion and a random source sample (r9 verdict #5):
    BFS from only the ``k`` highest-degree nodes (ties broken by id,
    deterministic), so the distance state is ``k x |V|`` — LINEAR in
    |V| for fixed k, never the |V|^2-tending all-pairs frame.

    Output per node:

    - the k landmarks get their EXACT hop-bounded closeness (the BFS
      from a landmark reaches everything within ``max_hops``);
    - every other node u gets a triangle-inequality UPPER bound on its
      distance sum through its best landmark:
      ``est_total(u) = min_l (reached_l * d(l,u) + S_l)`` where
      ``S_l = sum_v d(l,v)`` — so ``closeness_q`` is a LOWER-bound
      estimate. All-integer arithmetic keeps it order-independent and
      oracle-exact.

    Returns ``(node long, is_landmark boolean, reached long,
    total_hops_q long, closeness_q long)``; nodes no landmark reaches
    are omitted. ``reached`` is exact for landmarks and the max over
    reaching landmarks otherwise (component-size proxy).

    100-TB shape: k BFS waves (frontier rows <= k·|V|), one broadcast-
    sized stats frame (k rows), one groupBy over k·|V| — every piece
    linear in |V|. This is the non-sampled option the exact
    closeness/harmonic family was missing at 100x."""
    und = _undirected(edges)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("_deg")
    )
    lm = (
        deg.orderBy(F.col("_deg").desc(), F.col("node").asc())
        .limit(k)
        .select("node")
        .localCheckpoint()  # consumed by BFS origins + anti-join
    )
    dist = _bounded_distances(edges, lm, max_hops)  # (origin=l, node, hop)
    stats = (
        dist.groupBy("origin")
        .agg(
            F.count("*").alias("_reached"),
            F.sum("hop").alias("_s"),
        )
        .localCheckpoint()  # k rows, consumed twice
    )
    exact = stats.select(
        F.col("origin").alias("node"),
        F.lit(True).alias("is_landmark"),
        F.col("_reached").cast("long").alias("reached"),
        F.col("_s").cast("long").alias("total_hops_q"),
        F.expr(f"(_reached * {scale}) div _s").cast("long").alias(
            "closeness_q"
        ),
    )
    est = (
        dist.join(F.broadcast(stats), "origin")
        .withColumn("_bound", F.col("_reached") * F.col("hop") + F.col("_s"))
        .groupBy("node")
        .agg(
            F.min("_bound").alias("total_hops_q"),
            F.max("_reached").alias("reached"),
        )
        .join(lm, "node", "left_anti")
        .select(
            F.col("node"),
            F.lit(False).alias("is_landmark"),
            F.col("reached").cast("long").alias("reached"),
            F.col("total_hops_q").cast("long").alias("total_hops_q"),
            F.expr(f"(reached * {scale}) div total_hops_q")
            .cast("long")
            .alias("closeness_q"),
        )
    )
    return exact.unionByName(est)


def landmark_harmonic(
    edges: DataFrame,
    k: int = 8,
    max_hops: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Landmark (pivot) harmonic centrality — the harmonic twin of
    :func:`landmark_closeness` (r10 verdict #7): BFS from only the
    ``k`` highest-degree nodes, so the distance state is ``k x |V|``.

    - landmarks get their EXACT hop-bounded harmonic
      ``sum_v (scale div d(l, v))``;
    - every other node u gets a triangle-inequality LOWER-bound
      estimate through its best landmark: since
      ``d(u, v) <= d(u, l) + d(l, v)``, each reciprocal
      ``scale div (d_ul + d_lv)`` under-counts ``scale div d(u, v)``.
      The per-landmark sum collapses to a k·max_hops DISTANCE
      HISTOGRAM join (``sum_h cnt_l(h) * (scale div (d_ul + h))``) —
      never an all-pairs frame — plus the exact ``scale div d_ul``
      term for the landmark itself, minus u's own self-bucket term.
      The estimate is ``max_l`` over reaching landmarks.

    All-integer arithmetic keeps it order-independent and
    oracle-exact. Returns ``(node long, is_landmark boolean,
    reached long, harmonic_q long)``; nodes no landmark reaches are
    omitted. ``reached`` is exact for landmarks, the max over
    reaching landmarks otherwise.

    100-TB shape: k BFS waves, a broadcast k·max_hops histogram, and
    one groupBy over k·|V| — every piece linear in |V| for fixed k."""
    und = _undirected(edges)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("_deg")
    )
    lm = (
        deg.orderBy(F.col("_deg").desc(), F.col("node").asc())
        .limit(k)
        .select("node")
        .localCheckpoint()  # consumed by BFS origins + anti-join
    )
    dist = _bounded_distances(edges, lm, max_hops)  # (origin=l, node, hop)
    dist = dist.localCheckpoint()  # consumed by exact + hist + est
    stats = (
        dist.groupBy("origin")
        .agg(
            F.count("*").alias("_reached"),
            F.sum(F.expr(f"{scale} div hop")).alias("_hq"),
        )
        .localCheckpoint()  # k rows, consumed twice
    )
    exact = stats.select(
        F.col("origin").alias("node"),
        F.lit(True).alias("is_landmark"),
        F.col("_reached").cast("long").alias("reached"),
        F.col("_hq").cast("long").alias("harmonic_q"),
    )
    hist = (
        dist.groupBy("origin", F.col("hop").alias("_h"))
        .agg(F.count("*").alias("_cnt"))
        .localCheckpoint()  # k·max_hops rows — broadcast side
    )
    est = (
        dist.join(F.broadcast(hist), "origin")
        .withColumn(
            "_term", F.col("_cnt") * F.expr(f"{scale} div (hop + _h)")
        )
        .groupBy("node", "origin", "hop")
        .agg(F.sum("_term").alias("_sum"))
        .withColumn(
            "_est",
            F.col("_sum")
            + F.expr(f"{scale} div hop")  # the landmark itself
            - F.expr(f"{scale} div (2 * hop)"),  # u's own bucket term
        )
        .join(F.broadcast(stats), "origin")
        .groupBy("node")
        .agg(
            F.max("_est").alias("harmonic_q"),
            F.max("_reached").alias("reached"),
        )
        .join(lm, "node", "left_anti")
        .select(
            F.col("node"),
            F.lit(False).alias("is_landmark"),
            F.col("reached").cast("long").alias("reached"),
            F.col("harmonic_q").cast("long").alias("harmonic_q"),
        )
    )
    return exact.unionByName(est)


def degree_centrality(
    edges: DataFrame,
    orientation: str = "NATURAL",
    weight: str | None = None,
    round_weight: int = 2,
) -> DataFrame:
    """GDS ``gds.degree`` parity: per-node degree under NATURAL /
    REVERSE / UNDIRECTED orientation, optionally weighted (sum of the
    ``weight`` column, rounded per the cross-engine determinism
    contract). Returns ``(node, degree[, weighted_degree])``.

    Plan: a single map-side-combinable groupBy — no join, no driver
    state; the cheapest centrality and the supernode detector's twin
    (queries.degree_histogram builds its histogram from the same agg).
    """
    cols = ["u", "v"] + ([weight] if weight else [])
    e = edges.select(*cols)
    if orientation == "NATURAL":
        keyed = e.select(F.col("u").alias("node"), *cols[2:])
    elif orientation == "REVERSE":
        keyed = e.select(F.col("v").alias("node"), *cols[2:])
    elif orientation == "UNDIRECTED":
        keyed = e.select(F.col("u").alias("node"), *cols[2:]).unionAll(
            e.select(F.col("v").alias("node"), *cols[2:])
        )
    else:
        raise ValueError(f"unknown orientation {orientation!r}")
    aggs = [F.count("*").alias("degree")]
    if weight:
        aggs.append(F.round(F.sum(weight), round_weight).alias("weighted_degree"))
    return keyed.groupBy("node").agg(*aggs)


def link_prediction(
    edges: DataFrame,
    max_neighbor_degree: int | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Link-prediction scores for node pairs sharing >= 1 neighbor in
    the undirected view (GDS ``gds.alpha.linkprediction.*`` parity):
    common neighbors, resource allocation ``sum(scale div deg(z))``,
    and Adamic-Adar ``sum(floor(scale / ln(deg(z))))`` — both emitted
    as integer fixed-point per shared neighbor z, so the sums are
    order-independent and oracle-exact (any z in a wedge has
    deg(z) >= 2, so ln(deg) > 0).

    Returns ``(node_a, node_b, common_neighbors, ra_q, aa_q)`` with
    ``node_a < node_b``.

    Plan: per-z score terms joined onto the adjacency BEFORE the wedge
    self-join (each term attaches once, not once per pair), then one
    pair aggregation. The wedge join is Σ_z deg(z)² — hub neighbors
    dominate, and they carry the least signal (1/ln(deg) → 0), so
    ``max_neighbor_degree`` drops them from the z-side up front: the
    standard 100 TB cap, mirrored exactly in the oracle."""
    und = (
        _undirected(edges)
        .select(F.col("u").alias("node"), F.col("v").alias("z"))
        .distinct()
    )
    deg = und.groupBy("z").agg(F.count("*").alias("deg"))
    if max_neighbor_degree is not None:
        deg = deg.filter(F.col("deg") <= max_neighbor_degree)
    # deg-1 neighbors can't close a wedge; dropping them up front also
    # keeps ln(deg) > 0 so the ANSI cast can't see an Infinity
    deg = deg.filter(F.col("deg") >= 2)
    zterms = deg.select(
        "z",
        F.expr(f"{scale} div deg").alias("_ra"),
        F.expr(f"CAST(floor({scale} / ln(deg)) AS LONG)").alias("_aa"),
    )
    left = und.select(F.col("node").alias("node_a"), "z").join(zterms, "z")
    right = und.select(F.col("node").alias("node_b"), "z")
    return (
        left.join(right, "z")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum("_ra").alias("ra_q"),
            F.sum("_aa").alias("aa_q"),
        )
    )


def betweenness_sampled(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Source-sampled, hop-bounded betweenness centrality — the GDS
    ``gds.betweenness`` analogue with ``samplingSize`` (Brandes'
    pivot sampling) and a BFS depth cap (the standard large-graph
    truncation; exact when the graph's diameter <= ``max_hops``).

    Brandes' recurrence with integer fixed-point dependencies::

        sigma_t(v) = sum_{u in pred(v)} sigma_{t-1}(u)
        delta(v)   = sum_{w in succ(v)}
                     (sigma(v) * (scale + delta(w))) div sigma(w)
        B(v)       = sum_{s} delta_s(v)        -- v at depth 1..h-1

    Every term is an exact integer (div before sum), so accumulation
    is order-independent and bit-exact against the oracle's unrolled
    recurrence (the operators/pagerank.py fixed-point rationale).
    Deepest-level nodes carry delta = 0 (truncation) and are not
    emitted unless they earn dependency via another source.

    Plan: forward pass is a labeled BFS whose frontier carries path
    counts (one join + one agg per level, anti-join vs visited);
    backward pass is one join per level from deepest to 1. Shuffles
    scale with |sources| x frontier width — sampling keeps that the
    pivot count, which is exactly why GDS samples too.
    """
    und = _undirected(edges).persist()
    lvl0 = (
        sources.select(F.col("node").cast("long").alias("s"))
        .distinct()
        .withColumn("v", F.col("s"))
        .withColumn("sig", F.lit(1).cast("long"))
        .localCheckpoint()
    )
    levels = [lvl0]
    counts = [lvl0.count()]
    for _t in range(1, max_hops + 1):
        prev = levels[-1]
        # BFS dedup needs only the last TWO levels, not all visited:
        # und is symmetric, so a neighbor of a depth t-1 node sits at
        # depth t-2, t-1 or t — "not in levels t-2 ∪ t-1" excludes
        # exactly the already-visited candidates (same parity argument
        # as _bounded_distances; at scale the anti-join input stays
        # the frontier band instead of the whole labeled reach)
        recent = (
            prev.select("s", "v")
            if len(levels) == 1
            else levels[-2].select("s", "v").unionByName(prev.select("s", "v"))
        )
        nxt = (
            prev.join(und, prev["v"] == und["u"])
            .select("s", und["v"].alias("nv"), "sig")
            .groupBy("s", "nv")
            .agg(F.sum("sig").alias("sig"))
            .withColumnRenamed("nv", "v")
            .join(recent, ["s", "v"], "left_anti")
            .localCheckpoint()
        )
        # count doubles as the emptiness check (cheap: nxt is already
        # materialized) and sizes the backward pass's join-order choice
        n = nxt.count()
        if n == 0:
            break
        levels.append(nxt)
        counts.append(n)
    spark = edges.sparkSession
    empty = spark.createDataFrame([], "node long, betweenness_q long")
    if len(levels) < 2:
        und.unpersist()
        return empty

    child = levels[-1].withColumn("delta", F.lit(0).cast("long"))
    delta_frames = []
    for t in range(len(levels) - 2, 0, -1):
        cur = levels[t]
        succ = child.select(
            F.col("s").alias("cs"),
            F.col("v").alias("w"),
            F.col("sig").alias("sig_w"),
            F.col("delta").alias("delta_w"),
        )
        # The dependency terms need every (pred at depth t, succ at
        # depth t+1) pair connected by an edge. The neighbor fan-out
        # can run from EITHER side — und is symmetric, so "neighbors
        # of the successors" and "neighbors of the predecessors"
        # enumerate the same edge set — and the intermediate row count
        # is |fanned side| x avg-degree, so fan out from the SMALLER
        # level frame (r11: at the deepest-to-shallowest transition the
        # successor side was 300x the predecessor side; fanning the
        # 322k-row frame toward 1,095 predecessors built a 23M-row
        # intermediate that the swap reduces to ~80k). `child` carries
        # exactly |levels[t+1]| rows (its delta join is a left join on
        # cur's rows), so the forward counts size both sides.
        if counts[t] <= counts[t + 1]:
            # fan out from the predecessor level, then fetch each
            # neighbor's successor stats
            nb = cur.join(und, cur["v"] == und["u"]).select(
                "s", cur["v"].alias("v"), "sig", und["v"].alias("_w")
            )
            d = (
                nb.join(
                    succ,
                    (nb["s"] == succ["cs"]) & (nb["_w"] == succ["w"]),
                )
                .select(
                    "s",
                    "v",
                    "sig",
                    F.expr(f"(sig * ({scale} + delta_w)) div sig_w").alias(
                        "term"
                    ),
                )
                .groupBy("s", "v", "sig")
                .agg(F.sum("term").alias("delta"))
                .localCheckpoint()
            )
        else:
            # predecessors of w are its neighbors at depth t
            cand = succ.join(und, succ["w"] == und["u"]).select(
                "cs", und["v"].alias("pv"), "sig_w", "delta_w"
            )
            d = (
                cur.join(
                    cand,
                    (cur["s"] == cand["cs"]) & (cur["v"] == cand["pv"]),
                )
                .select(
                    "s",
                    "v",
                    "sig",
                    F.expr(f"(sig * ({scale} + delta_w)) div sig_w").alias(
                        "term"
                    ),
                )
                .groupBy("s", "v", "sig")
                .agg(F.sum("term").alias("delta"))
                .localCheckpoint()
            )
        delta_frames.append(d)
        # next step's successor frame must include level-t nodes with
        # NO deeper successors (delta 0): they still hand their
        # sigma-only dependency term to their own predecessors
        child = (
            cur.join(d.select("s", "v", "delta"), ["s", "v"], "left")
            .select("s", "v", "sig", F.coalesce("delta", F.lit(0)).alias("delta"))
        )
    # every delta frame is localCheckpointed (materialized) above, so
    # the cached undirected frame has served both passes — releasing it
    # only now keeps the backward per-level joins from re-deriving the
    # union+filter scan each round
    und.unpersist()
    out = delta_frames[0]
    for d in delta_frames[1:]:
        out = out.unionByName(d)
    return (
        out.groupBy(F.col("v").alias("node"))
        .agg(F.sum("delta").alias("betweenness_q"))
    )


def _labeled_reach(e: DataFrame, nodes: DataFrame, max_hops: int) -> DataFrame:
    """All (origin, node) pairs with a DIRECTED path origin → node of
    length <= max_hops (including origin itself). ``e`` (u, v) and
    ``nodes`` (n) should already be deduplicated and persisted by the
    caller — both SCC sweeps share one cached edge frame.

    Built as deduplicated JOIN POWERS (level k = level k-1 ⋈ E,
    distinct per level, one final distinct over the union) rather than
    the anti-join frontier BFS: for the small hop bounds SCC uses, the
    per-round anti-join against the growing visited set plus its
    checkpoint materializations cost more than re-deriving the few
    overlapping pairs (measured 2.3x at sf0.1, hop 2). The frontier
    form (see harmonic_centrality) stays the right shape when hops
    grow and reach saturates.

    r12 layout (the `_bounded_distances` join-powers pattern): the
    caller hands ``e`` hash(u)-partitioned, so level 1 is born
    hash(origin)-partitioned; when the planner broadcasts the |E|-row
    step side each extension join PRESERVES that layout, and every
    level dedup on (origin, node) is satisfied by the subset key
    hash(origin) — NO exchange on the |reach|-sized level frames. Only
    the final union dedup exchanges, pinned wide explicitly (its input
    is the full multi-level pair frame; an AQE-coalesced narrow
    exchange was the r10 hazard). If step is too big to broadcast the
    joins re-key and each dedup pays its exchange — the pre-r12 plan,
    never worse."""
    par2 = e.sparkSession.sparkContext.defaultParallelism * 2
    acc = nodes.select(
        F.col("n").alias("origin"), F.col("n").alias("node")
    )
    cur = e.select(F.col("u").alias("origin"), F.col("v").alias("node"))
    acc = acc.unionAll(cur)
    step = e.select(F.col("u").alias("_su"), F.col("v").alias("_sv"))
    for _ in range(max_hops - 1):
        cur = (
            cur.join(step, cur["node"] == step["_su"])
            .select("origin", F.col("_sv").alias("node"))
            .dropDuplicates(["origin", "node"])
        )
        acc = acc.unionAll(cur)
    return acc.repartition(par2, "origin", "node").dropDuplicates(
        ["origin", "node"]
    )


def scc_bounded(edges: DataFrame, max_hops: int = 3) -> DataFrame:
    """Strongly connected components with a path-length bound (GDS
    ``gds.scc`` analogue, exact for components of diameter <=
    ``max_hops`` — unbounded SCC needs data-dependent recursion no
    bulk-synchronous engine runs in fixed rounds).

    ``scc_id(v) = min{u : u →* v and v →* u within max_hops} ∪ {v}``
    — the mutual-reachability pair set is the inner join of the
    forward and backward labeled reaches, and the component id is the
    min witness. Deterministic, engine-independent (min over a set).

    Returns ``(node long, scc_id long)`` for every endpoint node. On a
    DAG every component is a singleton (scc_id = node), which is the
    honest answer — cycles are what the bound buys. A component whose
    diameter EXCEEDS ``max_hops`` is only partially merged: each node
    takes the min witness it can mutually reach within the bound, so
    labels inside such a component need not be transitively consistent
    — raise ``max_hops`` to the component diameter for exact output.

    Plan: two labeled BFS sweeps (forward along edges, backward via
    the transposed frame) + one equi-join on the (origin, node) pair +
    one min-aggregate. Per-round shuffles are frontier-bounded exactly
    like harmonic_centrality.
    """
    # hash(u) layout on the edge frame (one exchange, same count as the
    # old distinct's): level 1 of the labeled reach is then born
    # hash(origin)-partitioned and the per-level dedups run exchange-
    # free (_labeled_reach docstring).
    par = edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(F.col("u").cast("long"), F.col("v").cast("long"))
        .repartition(par, "u")
        .dropDuplicates(["u", "v"])
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .distinct()
        .persist()
    )
    nodes.count()
    # ONE labeled reach, not two (r12, guide §1.2): the backward reach
    # over the transposed edges is the forward reach with its columns
    # swapped — bwd(o, n) ⇔ "n →* o within the bound" ⇔ fwd(n, o) — so
    # the second fan-out sweep (the same join powers over e^T, the
    # same output-sized dedups) is a projection of the first. fwd is
    # persisted (both the direct and the swapped branch read it); the
    # swap side pays one |reach| exchange at the mutual join, far
    # cheaper than re-deriving the reach.
    fwd = _labeled_reach(e, nodes, max_hops).persist()
    bwd = fwd.select(
        F.col("node").alias("origin"), F.col("origin").alias("node")
    )
    mutual = fwd.join(bwd, ["origin", "node"])
    out = mutual.groupBy("node").agg(F.min("origin").alias("scc_id"))
    from neo4j_arrow_spark.operators.dedup import _with_intermediates

    return _with_intermediates(out, [e, nodes, fwd])


def louvain_moves(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """Synchronous single-level Louvain (the GDS ``gds.louvain``
    local-moving phase with fixed rounds): every node starts as its own
    community; each round every node moves to the candidate community
    with the best modularity gain, evaluated from the SAME snapshot
    (bulk-synchronous — deterministic on any partitioning, unlike the
    sequential sweep of classic Louvain).

    All-integer gain (unweighted graph, everything scaled by 2m)::

        gain_q(v, c) = 2m·k_{v,c} − k_v·(Σ_tot(c) − k_v·[c = cur(v)])

    where ``k_{v,c}`` counts v's neighbors in c, ``Σ_tot(c)`` sums the
    degrees of c's members, and the bracket removes v's own degree when
    evaluating its current community (Brandes' remove-first
    convention). Candidates are the neighbor communities plus staying
    put; ties break to the smallest community id. Safe in int64 while
    ``2m · max_degree < 2^63``.

    Returns ``(node long, community long)``. Per round: one label join
    + three aggregations — the LPA plan with a gain formula instead of
    a frequency count. Community count only shrinks, so the Σ_tot
    frame contracts every round.
    """
    und = _undirected(edges).persist()
    deg = und.groupBy("u").agg(F.count("*").alias("k")).persist()
    m2 = und.count()  # = Σ deg = 2m
    labels = (
        deg.select(F.col("u").alias("node"))
        .withColumn("com", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        sigma = (
            labels.join(deg, labels["node"] == deg["u"])
            .groupBy("com")
            .agg(F.sum("k").alias("s"))
        )
        counts = (
            und.join(labels, und["v"] == labels["node"])
            .select(und["u"].alias("node"), "com")
            .groupBy("node", "com")
            .agg(F.count("*").alias("cnt"))
        )
        stay = labels.select("node", "com").withColumn(
            "cnt", F.lit(0).cast("long")
        )
        cand = (
            counts.unionByName(stay)
            .groupBy("node", "com")
            .agg(F.max("cnt").alias("cnt"))
        )
        cur = labels.select(
            F.col("node").alias("_n"), F.col("com").alias("_cur")
        )
        scored = (
            cand.join(deg, cand["node"] == deg["u"])
            .join(sigma, "com")
            .join(cur, cand["node"] == cur["_n"])
            .select(
                "node",
                "com",
                (
                    F.lit(m2) * F.col("cnt")
                    - F.col("k")
                    * (
                        F.col("s")
                        - F.col("k")
                        * F.when(F.col("com") == F.col("_cur"), 1).otherwise(0)
                    )
                ).alias("gain"),
            )
        )
        labels = (
            scored.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("gain"), (-F.col("com")).alias("neg"), F.col("com")
                    )
                ).alias("best")
            )
            .select("node", F.col("best.com").alias("com"))
            .localCheckpoint()
        )
    und.unpersist()
    deg.unpersist()
    return labels.select("node", F.col("com").alias("community"))


def conductance(
    edges: DataFrame, labels: DataFrame, scale: int = 1_000_000
) -> DataFrame:
    """Per-community conductance (GDS ``gds.conductance`` parity) over
    the undirected simple graph of ``edges (u, v)`` with communities
    ``labels (node, label)``::

        phi(c) = boundary(c) / min(vol(c), 2m - vol(c))

    where boundary counts canonical edges with exactly one endpoint in
    c and vol is the community's degree sum. Emitted as the integer
    fixed-point ``conductance_q = boundary * scale div min(...)`` plus
    the raw counters, so the result is order-independent and
    oracle-exact. Communities whose complement volume is 0 (the whole
    labeled graph in one community) are reported with conductance_q
    NULL — the measure is undefined there, not 0.

    Returns ``(label, boundary, volume, conductance_q)``. Same plan
    skeleton as modularity: one canonical-edge dedup shuffle, two label
    joins, two aggregations; unlabeled-endpoint edges are excluded."""
    canon = (
        edges.select(
            F.least(F.col("u"), F.col("v")).cast("long").alias("a"),
            F.greatest(F.col("u"), F.col("v")).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    lab = labels.select(F.col("node").cast("long"), F.col("label").cast("long"))
    la = lab.select(F.col("node").alias("a"), F.col("label").alias("_la"))
    lb = lab.select(F.col("node").alias("b"), F.col("label").alias("_lb"))
    tagged = canon.join(la, "a").join(lb, "b").persist()
    two_m = tagged.count() * 2
    vol = (
        tagged.select(F.col("_la").alias("label"))
        .unionAll(tagged.select(F.col("_lb").alias("label")))
        .groupBy("label")
        .agg(F.count("*").alias("volume"))
    )
    cut = tagged.filter(F.col("_la") != F.col("_lb"))
    boundary = (
        cut.select(F.col("_la").alias("label"))
        .unionAll(cut.select(F.col("_lb").alias("label")))
        .groupBy("label")
        .agg(F.count("*").alias("boundary"))
    )
    denom = F.least(F.col("volume"), F.lit(two_m) - F.col("volume"))
    out = (
        vol.join(boundary, "label", "left")
        .select(
            "label",
            F.coalesce(F.col("boundary"), F.lit(0)).cast("long").alias("boundary"),
            F.col("volume").cast("long").alias("volume"),
            F.when(
                denom > 0,
                F.expr(
                    f"(coalesce(boundary, 0) * {scale}) div "
                    f"least(volume, {two_m} - volume)"
                ),
            )
            .cast("long")
            .alias("conductance_q"),
        )
    )
    return out
