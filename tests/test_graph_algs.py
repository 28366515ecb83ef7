"""BFS hop distance, label propagation, node similarity, personalized
PageRank (operators/graph_algs.py, operators/pagerank.py sources=):
hand-computed tiny graphs and invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.graph_algs import (
    bfs_hops,
    label_propagation,
    node_similarity,
)
from neo4j_arrow_spark.operators.pagerank import pagerank_fixed


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


# ---- bfs_hops --------------------------------------------------------------

def test_bfs_path_graph(spark):
    # 1-2-3-4-5 path, source 1: hops are the positions
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r["node"]: r["hop"] for r in bfs_hops(e, _nodes(spark, [1])).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops > max_hops=3


def test_bfs_undirected_and_min_hop(spark):
    # edge direction must not matter; min over multiple routes wins
    e = _edges(spark, [(2, 1), (2, 3), (1, 3)])
    got = {r["node"]: r["hop"] for r in bfs_hops(e, _nodes(spark, [1])).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


def test_bfs_multi_source_and_early_stop(spark):
    e = _edges(spark, [(1, 2), (10, 11)])
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(e, _nodes(spark, [1, 10]), max_hops=3).collect()
    }
    assert got == {1: 0, 10: 0, 2: 1, 11: 1}


# ---- label_propagation -----------------------------------------------------

def test_lpa_triangle_converges_to_min_label(spark):
    # triangle: after one sync round every node adopts its smallest
    # neighbor label; ties broken by smallest label
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, iterations=2).collect()
    }
    # round1: n1 <- min(2,3) tie count 1 -> 2; n2 <- min(1,3) -> 1; n3 -> 1
    # round2: n1 <- labels{n2:1, n3:1} count 2 -> 1; n2 <- {2,1} -> 1
    #         (freq tie, min label); n3 <- {2,1} -> 1
    assert got == {1: 1, 2: 1, 3: 1}


def test_lpa_synchronous_not_asynchronous(spark):
    # star 1-2, 1-3: round 1 uses the SNAPSHOT labels, so leaves adopt
    # 1's label while 1 adopts the min leaf label simultaneously
    e = _edges(spark, [(1, 2), (1, 3)])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, iterations=1).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}


# ---- node_similarity -------------------------------------------------------

def test_node_similarity_jaccard_values(spark):
    # a:{x,y}, b:{x,y}, c:{x}  (targets 100=x, 101=y)
    e = _edges(
        spark, [(1, 100), (1, 101), (2, 100), (2, 101), (3, 100)]
    )
    rows = node_similarity(e).collect()
    got = {(r["node_a"], r["node_b"]): (r["intersection"], r["similarity"]) for r in rows}
    assert got[(1, 2)] == (2, 1.0)
    assert got[(1, 3)] == (1, 0.5)
    assert got[(2, 3)] == (1, 0.5)


def test_node_similarity_threshold_and_no_shared(spark):
    e = _edges(spark, [(1, 100), (2, 101), (3, 100), (3, 102)])
    rows = node_similarity(e, threshold=0.6).collect()
    # (1,3): inter 1, union 2 -> 0.5 < 0.6 filtered; (1,2) share nothing
    assert rows == []


def test_node_similarity_degree_cutoff(spark):
    e = _edges(spark, [(1, 100), (2, 100), (2, 101), (3, 100), (3, 101)])
    rows = node_similarity(e, degree_cutoff=2).collect()
    got = {(r["node_a"], r["node_b"]) for r in rows}
    assert got == {(2, 3)}  # node 1 (degree 1) dropped before pairing


# ---- personalized pagerank -------------------------------------------------

def test_ppr_mass_only_from_sources(spark):
    # 1->2, 3->2: with sources={1}, node 3 gets rank 0 and 2 only
    # receives 1's contribution
    e = _edges(spark, [(1, 2), (3, 2)])
    out = pagerank_fixed(e, iterations=1, sources=_nodes(spark, [1]))
    got = {r["node"]: r["rank"] for r in out.collect()}
    # base=150000 at source only; r0: 1->1e6, 3->0
    # iter1: r(1)=150000; r(3)=0; r(2)=0 + 85*(1e6//1 + 0//1)//100=850000
    assert got == {1: 150000, 3: 0, 2: 850000}


def test_ppr_defaults_match_global_pagerank(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    all_nodes = _nodes(spark, [1, 2, 3])
    global_ = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(e, iterations=2).collect()
    }
    personalized_all = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(e, iterations=2, sources=all_nodes).collect()
    }
    assert global_ == personalized_all


# ---- shortest_paths --------------------------------------------------------

def test_sssp_picks_cheaper_two_hop(spark):
    from neo4j_arrow_spark.operators.graph_algs import shortest_paths

    # 1->3 direct costs 10; 1->2->3 costs 3+4=7
    e = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 3), (2, 3, 4)], "u long, v long, w long"
    )
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(e, _nodes(spark, [1]), rounds=2).collect()
    }
    assert got == {1: 0, 2: 3, 3: 7}


def test_sssp_round_bound_and_parallel_edges(spark):
    from neo4j_arrow_spark.operators.graph_algs import shortest_paths

    e = spark.createDataFrame(
        [(1, 2, 5), (1, 2, 2), (2, 3, 1), (3, 4, 1)], "u long, v long, w long"
    )
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(e, _nodes(spark, [1]), rounds=2).collect()
    }
    # parallel 1->2 collapses to min (2); node 4 is 3 rounds away -> absent
    assert got == {1: 0, 2: 2, 3: 3}


# ---- random_walks ----------------------------------------------------------

def test_random_walks_deterministic_and_stop_at_sink(spark):
    from neo4j_arrow_spark.operators.graph_algs import random_walks

    # path 1->2->3, 3 is a sink: walk emits steps 0..2 then stops
    e = _edges(spark, [(1, 2), (2, 3)])
    starts = spark.createDataFrame([(7, 1)], "walk_id long, node long")
    rows = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(e, starts, walk_len=5).collect()
    )
    assert rows == [(7, 0, 1), (7, 1, 2), (7, 2, 3)]


def test_random_walks_choice_is_hash_argmin(spark):
    import hashlib

    from neo4j_arrow_spark.operators.graph_algs import random_walks

    e = _edges(spark, [(1, 10), (1, 11), (1, 12)])
    starts = spark.createDataFrame([(42, 1)], "walk_id long, node long")
    (row,) = [
        r for r in random_walks(e, starts, walk_len=1).collect() if r["step"] == 1
    ]
    expect = min(
        (int(hashlib.md5(f"0:42:1:{v}".encode()).hexdigest()[:15], 16), v)
        for v in (10, 11, 12)
    )[1]
    assert row["node"] == expect


# ---- kcore -----------------------------------------------------------------

def test_kcore_peels_tail_and_recomputes_degrees(spark):
    from neo4j_arrow_spark.operators.graph_algs import kcore

    # triangle 1-2-3 plus a pendant 3-4: 2-core drops 4, then degrees
    # inside the core are all 2
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["node"]: r["degree"] for r in kcore(e, k=2, rounds=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel_needs_rounds(spark):
    from neo4j_arrow_spark.operators.graph_algs import kcore

    # chain 1-2-3-4-5: peeling for k=2 cascades from both ends; after
    # enough rounds nothing survives
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    one = {r["node"] for r in kcore(e, k=2, rounds=1).collect()}
    assert one == {2, 3, 4}  # endpoints peeled first
    done = kcore(e, k=2, rounds=3).collect()
    assert done == []


# ---- closeness / degree / link prediction ---------------------------------

def test_closeness_path_graph(spark):
    from neo4j_arrow_spark.operators.graph_algs import closeness_centrality

    # path 1-2-3: node 2 reaches 1,3 at dist 1 each; ends reach at 1+2
    e = _edges(spark, [(1, 2), (2, 3)])
    got = {
        r["node"]: (r["reached"], r["total_hops"], r["closeness_q"])
        for r in closeness_centrality(e, max_hops=3).collect()
    }
    assert got[2] == (2, 2, 1_000_000)
    assert got[1] == (2, 3, 666_666) and got[3] == (2, 3, 666_666)


def test_closeness_matches_frontier_path(spark):
    from neo4j_arrow_spark.operators.graph_algs import closeness_centrality

    # origins subset forces the frontier-BFS strategy; results must
    # agree with the join-powers all-origins run on the same graph
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5)])
    all_rows = {
        r["node"]: (r["reached"], r["total_hops"])
        for r in closeness_centrality(e, max_hops=3).collect()
    }
    sub = closeness_centrality(e, origins=_nodes(spark, [1, 5]), max_hops=3)
    for r in sub.collect():
        assert all_rows[r["node"]] == (r["reached"], r["total_hops"])


def test_degree_centrality_orientations(spark):
    from neo4j_arrow_spark.operators.graph_algs import degree_centrality

    e = spark.createDataFrame(
        [(1, 2, 10.0), (1, 3, 5.0), (3, 1, 2.5)], "u long, v long, w double"
    )
    nat = {r["node"]: r["degree"] for r in degree_centrality(e).collect()}
    assert nat == {1: 2, 3: 1}
    rev = {r["node"]: r["degree"] for r in
           degree_centrality(e, orientation="REVERSE").collect()}
    assert rev == {2: 1, 3: 1, 1: 1}
    und = {r["node"]: r["degree"] for r in
           degree_centrality(e, orientation="UNDIRECTED").collect()}
    assert und == {1: 3, 2: 1, 3: 2}
    w = {r["node"]: r["weighted_degree"] for r in
         degree_centrality(e, weight="w").collect()}
    assert w == {1: 15.0, 3: 2.5}


def test_link_prediction_hand_computed(spark):
    from neo4j_arrow_spark.operators.graph_algs import link_prediction
    import math

    # 1 and 2 share neighbors 3 (deg 2) and 4 (deg 3); 5-4 edge makes
    # deg(4)=3 and gives (1,5),(2,5) one shared neighbor each
    e = _edges(spark, [(1, 3), (2, 3), (1, 4), (2, 4), (5, 4)])
    rows = {(r["node_a"], r["node_b"]): r for r in link_prediction(e).collect()}
    r12 = rows[(1, 2)]
    assert r12["common_neighbors"] == 2
    assert r12["ra_q"] == 1_000_000 // 2 + 1_000_000 // 3
    assert r12["aa_q"] == (
        math.floor(1_000_000 / math.log(2)) + math.floor(1_000_000 / math.log(3))
    )
    assert rows[(1, 5)]["common_neighbors"] == 1
    assert rows[(1, 5)]["ra_q"] == 1_000_000 // 3


def test_link_prediction_degree_cap_drops_hub(spark):
    from neo4j_arrow_spark.operators.graph_algs import link_prediction

    # hub 9 is adjacent to everyone; cap 2 excludes it as a shared
    # neighbor: (1,2) keep only the via-3 wedge (not via-9), and pairs
    # whose ONLY shared neighbor is the hub — (1,4),(2,5),(4,5)… —
    # vanish entirely; (3,9) via deg-2 nodes 1 and 2 survives
    e = _edges(spark, [(1, 3), (2, 3), (1, 9), (2, 9), (4, 9), (5, 9)])
    rows = {(r["node_a"], r["node_b"]): r["common_neighbors"]
            for r in link_prediction(e, max_neighbor_degree=2).collect()}
    assert rows == {(1, 2): 1, (3, 9): 2}
    uncapped = {(r["node_a"], r["node_b"]): r["common_neighbors"]
                for r in link_prediction(e).collect()}
    assert uncapped[(1, 2)] == 2 and (4, 5) in uncapped


def test_conductance_hand_computed(spark):
    from neo4j_arrow_spark.operators.graph_algs import conductance

    # two triangles bridged by one edge: each community has volume 7
    # (6 internal half-edges + 1 boundary), boundary 1, 2m = 14
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)])
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        "node long, label long",
    )
    got = {r.label: r for r in conductance(e, labels).collect()}
    assert got[10].boundary == 1 and got[10].volume == 7
    assert got[10].conductance_q == 1_000_000 // 7
    assert got[20].conductance_q == 1_000_000 // 7


def test_conductance_single_community_undefined(spark):
    from neo4j_arrow_spark.operators.graph_algs import conductance

    e = _edges(spark, [(1, 2), (2, 3)])
    labels = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "node long, label long"
    )
    rows = conductance(e, labels).collect()
    assert len(rows) == 1 and rows[0].conductance_q is None
    assert rows[0].boundary == 0


def test_scale_properties_minmax_stdscore(spark):
    from neo4j_arrow_spark.operators.profiling import scale_properties

    df = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0)], "id long, x double"
    )
    got = {r.id: r for r in scale_properties(
        df, "id", ["x"], methods=("minmax", "stdscore")
    ).collect()}
    assert got[1].x_minmax == 0.0 and got[2].x_minmax == 0.5 and got[3].x_minmax == 1.0
    assert got[2].x_stdscore == 0.0 and got[1].x_stdscore < 0 < got[3].x_stdscore


def test_scale_properties_constant_column(spark):
    from neo4j_arrow_spark.operators.profiling import scale_properties

    df = spark.createDataFrame([(1, 7.0), (2, 7.0)], "id long, x double")
    rows = scale_properties(df, "id", ["x"], methods=("minmax", "stdscore")).collect()
    assert all(r.x_minmax == 0.0 and r.x_stdscore == 0.0 for r in rows)


def test_landmark_closeness_exact_for_landmarks_bound_for_rest(spark):
    """r10: path graph 1-2-3-4-5, k=2 landmarks = the highest-degree
    nodes (deg 2: nodes 2,3,4 → tiebreak by id picks 2 and 3). Their
    rows are EXACT closeness; every other node's total_hops_q is a
    triangle-inequality upper bound (>= the true sum) computed through
    its best landmark."""
    from neo4j_arrow_spark.operators.graph_algs import (
        closeness_centrality,
        landmark_closeness,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r.node: r for r in landmark_closeness(e, k=2, max_hops=10).collect()}
    exact = {r.node: r for r in closeness_centrality(e, max_hops=10).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    lms = {n for n, r in got.items() if r.is_landmark}
    assert lms == {2, 3}
    for n in lms:
        assert got[n].total_hops_q == exact[n].total_hops
        assert got[n].closeness_q == exact[n].closeness_q
        assert got[n].reached == exact[n].reached
    for n in set(got) - lms:
        # upper bound on the distance sum → lower bound on closeness
        assert got[n].total_hops_q >= exact[n].total_hops
        assert got[n].closeness_q <= exact[n].closeness_q
        assert got[n].reached == 4


def test_landmark_closeness_unreached_nodes_omitted(spark):
    from neo4j_arrow_spark.operators.graph_algs import landmark_closeness

    # two components; landmarks (k=1) land in the triangle component
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (8, 9)])
    got = {r.node: r for r in landmark_closeness(e, k=1, max_hops=10).collect()}
    assert set(got) <= {1, 2, 3}
    assert any(r.is_landmark for r in got.values())


def test_landmark_harmonic_exact_for_landmarks_bound_for_rest(spark):
    """r11 (r10 verdict #7): path graph 1-2-3-4-5, k=2 landmarks =
    nodes 2,3 (degree tiebreak by id). Landmark rows are EXACT
    hop-bounded harmonic; every other node's harmonic_q is a
    triangle-inequality LOWER bound (each reciprocal under-counts
    through the detour over the best landmark)."""
    from neo4j_arrow_spark.operators.graph_algs import (
        harmonic_centrality,
        landmark_harmonic,
    )

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r.node: r for r in landmark_harmonic(e, k=2, max_hops=10).collect()}
    exact = {r.node: r for r in harmonic_centrality(e, max_hops=10).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    lms = {n for n, r in got.items() if r.is_landmark}
    assert lms == {2, 3}
    for n in lms:
        assert got[n].harmonic_q == exact[n].harmonic_q
        assert got[n].reached == exact[n].reached
    for n in set(got) - lms:
        assert got[n].harmonic_q <= exact[n].harmonic_q
        assert got[n].harmonic_q > 0
        assert got[n].reached == 4


def test_landmark_harmonic_unreached_nodes_omitted(spark):
    from neo4j_arrow_spark.operators.graph_algs import landmark_harmonic

    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (8, 9)])
    got = {r.node: r for r in landmark_harmonic(e, k=1, max_hops=10).collect()}
    assert set(got) <= {1, 2, 3}
    assert any(r.is_landmark for r in got.values())


# ---- frontier dedup band (r11: anti-join vs last two levels only) ---------

def test_bounded_distances_band_dedup_on_reentrant_graph(spark):
    # Cycle 1-2-3-4-5-6-1 plus chord (2,5): parent edges re-reach
    # depth h-2 nodes and the chord re-reaches depth h-1 nodes every
    # round — exactly the candidates the last-two-levels anti-join
    # must still exclude. Distances must match hand-computed BFS.
    from neo4j_arrow_spark.operators.graph_algs import _bounded_distances

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1), (2, 5)])
    got = {
        (r["origin"], r["node"]): r["hop"]
        for r in _bounded_distances(e, _nodes(spark, [1]), max_hops=4).collect()
    }
    assert got == {
        (1, 2): 1, (1, 6): 1,
        (1, 3): 2, (1, 5): 2,
        (1, 4): 3,
    }


def test_betweenness_path_counts_on_reentrant_graph(spark):
    # Diamond 1->{2,3}->4 plus tail 4-5, undirected: sigma(4) = 2 via
    # both middles, and the backward pass must not double-count after
    # the band dedup. Exact Brandes (single pivot, integer scale).
    from neo4j_arrow_spark.operators.graph_algs import betweenness_sampled

    e = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
    got = {
        r["node"]: r["betweenness_q"]
        for r in betweenness_sampled(
            e, _nodes(spark, [1]), max_hops=3, scale=1000
        ).collect()
    }
    # delta(4) = sigma(4)/sigma(5->via 4) = 2*(1000+0)/2 ... hand walk:
    # depths from 1: {2,3}@1 (sig 1 each), {4}@2 (sig 2), {5}@3 (sig 2)
    # delta(4) = (2*(1000+0)) div 2 = 1000
    # delta(2) = (1*(1000+1000)) div 2 = 1000 ; delta(3) same
    assert got == {2: 1000, 3: 1000, 4: 1000}
