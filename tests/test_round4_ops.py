"""Round-4 operators: BM25 retrieval (and siblings added this round)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.text import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple apple"),
            (2, "apple banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, "banana banana banana banana banana banana banana banana"),
        ],
        "doc_id long, text string",
    )


def test_bm25_rare_term_outranks_common(spark, corpus):
    q = spark.createDataFrame([(1, "durian")], "query_id int, term string")
    out = bm25_topk(corpus, q, "doc_id").collect()
    assert [r.doc_id for r in out] == [3]  # only doc 3 contains durian


def test_bm25_tf_and_length_normalization(spark, corpus):
    # 'apple' appears 3x in doc 1 (len 4) and 1x in doc 2 (len 3):
    # higher tf wins despite similar lengths
    q = spark.createDataFrame([(7, "apple")], "query_id int, term string")
    out = bm25_topk(corpus, q, "doc_id").orderBy("rank").collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].score > out[1].score


def test_bm25_multi_term_sums_and_k(spark, corpus):
    q = spark.createDataFrame(
        [(5, "apple"), (5, "cherry")], "query_id int, term string"
    )
    out = bm25_topk(corpus, q, "doc_id", k=2).orderBy("rank").collect()
    assert len(out) == 2 and all(r.query_id == 5 for r in out)
    # doc 2 matches both terms
    both = [r for r in out if r.doc_id == 2]
    assert both and both[0].n_terms_matched == 2


def test_bm25_deterministic_integer_scores(spark, corpus):
    q = spark.createDataFrame(
        [(9, "banana"), (9, "cherry")], "query_id int, term string"
    )
    a = {(r.doc_id, r.score) for r in bm25_topk(corpus, q, "doc_id").collect()}
    b = {
        (r.doc_id, r.score)
        for r in bm25_topk(
            corpus.repartition(7), q, "doc_id"
        ).collect()
    }
    assert a == b  # integer scoring is partitioning-invariant


# -- harmonic centrality ---------------------------------------------------

def test_harmonic_centrality_path_graph(spark):
    from neo4j_arrow_spark.operators.graph_algs import harmonic_centrality

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "u long, v long"
    )
    out = {r.node: (r.reached, r.harmonic_q)
           for r in harmonic_centrality(edges, max_hops=3).collect()}
    # path 1-2-3-4: ends see (1,2,3) hops, middles see (1,1,2)
    assert out[1] == (3, 1_000_000 + 500_000 + 333_333)
    assert out[2] == (3, 2_500_000)
    assert out[3] == (3, 2_500_000)
    assert out[4] == (3, 1_833_333)


def test_harmonic_centrality_hop_bound(spark):
    from neo4j_arrow_spark.operators.graph_algs import harmonic_centrality

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "u long, v long"
    )
    out = {r.node: r.reached
           for r in harmonic_centrality(edges, max_hops=1).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_harmonic_centrality_origin_subset(spark):
    from neo4j_arrow_spark.operators.graph_algs import harmonic_centrality

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    origins = spark.createDataFrame([(1,)], "node long")
    out = harmonic_centrality(edges, origins=origins, max_hops=2).collect()
    assert len(out) == 1 and out[0].node == 1 and out[0].reached == 2


# -- betweenness (sampled, hop-bounded Brandes) ----------------------------

def _bw(spark, edges, sources, **kw):
    from neo4j_arrow_spark.operators.graph_algs import betweenness_sampled

    e = spark.createDataFrame(edges, "u long, v long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {
        r.node: r.betweenness_q
        for r in betweenness_sampled(e, s, **kw).collect()
    }


def test_betweenness_path_middle(spark):
    # 1-2-3, source 1: all dependency flows through 2
    assert _bw(spark, [(1, 2), (2, 3)], [1]) == {2: 1_000_000}


def test_betweenness_diamond_split_paths(spark):
    # 1-2-4, 1-3-4: two shortest paths to 4, sigma(4)=2, each middle
    # node carries half the dependency
    out = _bw(spark, [(1, 2), (1, 3), (2, 4), (3, 4)], [1])
    assert out == {2: 500_000, 3: 500_000}


def test_betweenness_two_sources_accumulate(spark):
    assert _bw(spark, [(1, 2), (2, 3)], [1, 3]) == {2: 2_000_000}


def test_betweenness_zero_delta_leaf_still_contributes(spark):
    # 1-2, 2-3, 2-4, 4-5 from source 1: node 3 is a depth-2 leaf
    # (delta 0) but still hands its sigma term to node 2
    out = _bw(spark, [(1, 2), (2, 3), (2, 4), (4, 5)], [1])
    assert out == {2: 3_000_000, 4: 1_000_000}


def test_betweenness_hop_truncation(spark):
    # capping at 2 hops drops node 5 from the BFS, so 4's dependency
    # disappears and 2 sees only its two depth-2 leaves
    out = _bw(spark, [(1, 2), (2, 3), (2, 4), (4, 5)], [1], max_hops=2)
    assert out == {2: 2_000_000}


# -- funnel ----------------------------------------------------------------

def test_funnel_first_touch_and_window(spark):
    from datetime import datetime
    from neo4j_arrow_spark.operators.temporal import funnel

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    ev = spark.createDataFrame(
        [
            # user 1: full chain inside windows
            (1, ts(0), "view"), (1, ts(5), "click"), (1, ts(9), "purchase"),
            # user 2: click BEFORE the first view never counts
            (2, ts(3), "click"), (2, ts(4), "view"),
            # user 3: click outside the 10-minute step window
            (3, ts(0), "view"), (3, ts(20), "click"),
            # user 4: no view at all -> absent from output
            (4, ts(1), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    out = {
        r.user_id: (r.steps_completed, r.step2_ts)
        for r in funnel(
            ev, ["view", "click", "purchase"], step_window_minutes=10
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1][0] == 3
    assert out[2] == (1, None)
    assert out[3] == (1, None)


def test_funnel_min_ts_is_first_match(spark):
    from datetime import datetime
    from neo4j_arrow_spark.operators.temporal import funnel

    ts = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    ev = spark.createDataFrame(
        [(1, ts(0), "view"), (1, ts(2), "click"), (1, ts(7), "click")],
        "user_id long, ts timestamp, event_type string",
    )
    row = funnel(ev, ["view", "click"]).collect()[0]
    assert row.step2_ts == ts(2) and row.steps_completed == 2


# -- eigenvector centrality ------------------------------------------------

def test_eigenvector_star_center_dominates(spark):
    from neo4j_arrow_spark.operators.pagerank import eigenvector_fixed

    # undirected star: center 1 with leaves 2..5
    fwd = spark.createDataFrame(
        [(1, x) for x in (2, 3, 4, 5)], "u long, v long"
    )
    und = fwd.union(fwd.selectExpr("v as u", "u as v"))
    out = {r.node: r.centrality for r in eigenvector_fixed(und, 3).collect()}
    assert out[1] == 1_000_000  # max-normalized center
    assert all(out[x] < out[1] for x in (2, 3, 4, 5))
    assert len(set(out[x] for x in (2, 3, 4, 5))) == 1  # symmetric leaves


def test_eigenvector_partitioning_invariant(spark):
    from neo4j_arrow_spark.operators.pagerank import eigenvector_fixed

    fwd = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "u long, v long"
    )
    und = fwd.union(fwd.selectExpr("v as u", "u as v"))
    a = {(r.node, r.centrality) for r in eigenvector_fixed(und, 4).collect()}
    b = {
        (r.node, r.centrality)
        for r in eigenvector_fixed(und.repartition(13), 4).collect()
    }
    assert a == b


# -- product quantization --------------------------------------------------

def test_pq_encode_shapes_and_codebooks(spark):
    from neo4j_arrow_spark.operators.similarity import pq_train_encode

    vecs = spark.createDataFrame(
        [(i, [float(i % 2), 0.0, float(i // 4), 1.0]) for i in range(8)],
        "vid long, v array<float>",
    )
    codes, books = pq_train_encode(vecs, "vid", "v", m=2, k_codes=2)
    assert len(books) == 2 and all(len(b) <= 2 for b in books)
    assert len(books[0][0][1]) == 2  # subspace dim
    rows = codes.collect()
    # long form: one row per (vector, subspace)
    assert len(rows) == 16 and {"vid", "s", "code"} <= set(rows[0].asDict())
    assert {r.s for r in rows} == {0, 1}


def test_pq_adc_separates_clusters(spark):
    from neo4j_arrow_spark.operators.similarity import pq_topk

    # two tight clusters far apart; queries drawn from each cluster
    # must rank their own cluster's members first. Ids interleave the
    # clusters because the deterministic seeder takes the k_codes
    # LOWEST ids as initial centroids — one seed must land per cluster.
    base = [
        (0, [0.0, 0.1, 0.0, 0.1]), (2, [0.1, 0.0, 0.1, 0.0]),
        (4, [0.05, 0.05, 0.05, 0.05]),
        (1, [9.0, 9.1, 9.0, 9.1]), (3, [9.1, 9.0, 9.1, 9.0]),
        (5, [9.05, 9.05, 9.05, 9.05]),
    ]
    vecs = spark.createDataFrame(base, "vid long, v array<float>")
    qs = spark.createDataFrame(
        [(100, [0.0, 0.0, 0.0, 0.0]), (200, [9.0, 9.0, 9.0, 9.0])],
        "query_id long, v array<float>",
    )
    out = pq_topk(
        vecs, qs, "vid", "v", m=2, k_codes=2, iterations=2, k=3
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, set()).add(r.vid)
    assert got[100] == {0, 2, 4}
    assert got[200] == {1, 3, 5}


def test_pq_partitioning_invariant(spark):
    from neo4j_arrow_spark.operators.similarity import pq_topk

    vecs = spark.createDataFrame(
        [(i, [float((i * 7) % 5), float((i * 3) % 4),
              float(i % 3), float((i * 11) % 6)]) for i in range(40)],
        "vid long, v array<float>",
    )
    qs = spark.createDataFrame(
        [(1, [1.0, 2.0, 1.0, 3.0])], "query_id long, v array<float>"
    )
    a = [(r.vid, r.adc_dist, r.rank)
         for r in pq_topk(vecs, qs, "vid", "v", m=2, k_codes=4, k=5)
         .orderBy("rank").collect()]
    b = [(r.vid, r.adc_dist, r.rank)
         for r in pq_topk(vecs.repartition(9), qs, "vid", "v",
                          m=2, k_codes=4, k=5).orderBy("rank").collect()]
    assert a == b


# -- weighted pagerank -----------------------------------------------------

def test_weighted_pagerank_splits_by_weight(spark):
    from neo4j_arrow_spark.operators.pagerank import pagerank_weighted

    edges = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1)], "u long, v long, w long"
    )
    out = {r.node: r.rank for r in pagerank_weighted(edges, 1).collect()}
    # node 1 emits 1e6 split 3:1 -> 750000/250000, damped by 85/100
    assert out == {
        1: 150_000,
        2: 150_000 + (85 * 750_000) // 100,
        3: 150_000 + (85 * 250_000) // 100,
    }


def test_weighted_pagerank_aggregates_parallel_edges(spark):
    from neo4j_arrow_spark.operators.pagerank import pagerank_weighted

    # two parallel (1,2,1) edges must behave as one (1,2,2) edge
    a = pagerank_weighted(
        spark.createDataFrame(
            [(1, 2, 1), (1, 2, 1), (1, 3, 2)], "u long, v long, w long"
        ),
        2,
    )
    b = pagerank_weighted(
        spark.createDataFrame(
            [(1, 2, 2), (1, 3, 2)], "u long, v long, w long"
        ),
        2,
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


# -- plan-shape assertions for the round-4 operators -----------------------

def test_funnel_plan_pushes_step_filters(spark, sf_dir):
    from neo4j_arrow_spark.operators.temporal import funnel
    from neo4j_arrow_spark.sources.tpch import load_table

    ev = load_table(spark, sf_dir, "events")
    df = funnel(ev, ["view", "click", "purchase"], step_window_minutes=1440)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # each step's event_type equality must reach the parquet scan
    assert plan.count("PushedFilters: [IsNotNull(event_type)") >= 3, plan


def test_bm25_plan_broadcasts_query_terms(spark, sf_dir):
    from neo4j_arrow_spark.operators.text import bm25_topk
    from neo4j_arrow_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(1, "spark"), (1, "join")], "query_id int, term string"
    )
    plan = (
        bm25_topk(docs, q, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_pq_plan_broadcasts_lut(spark):
    from neo4j_arrow_spark.operators.similarity import pq_topk

    vecs = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0, 0.0]) for i in range(30)],
        "vid long, v array<float>",
    )
    qs = spark.createDataFrame(
        [(1, [0.0, 1.0, 1.0, 0.0])], "query_id long, v array<float>"
    )
    out = pq_topk(vecs, qs, "vid", "v", m=2, k_codes=2, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


# -- bounded SCC -----------------------------------------------------------

def _scc(spark, edges, **kw):
    from neo4j_arrow_spark.operators.graph_algs import scc_bounded

    e = spark.createDataFrame(edges, "u long, v long")
    return {r.node: r.scc_id for r in scc_bounded(e, **kw).collect()}


def test_scc_cycle_collapses(spark):
    # 1->2->3->1 cycle plus a tail 3->4
    out = _scc(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 4}


def test_scc_dag_is_singletons(spark):
    out = _scc(spark, [(1, 2), (2, 3), (1, 3)])
    assert out == {1: 1, 2: 2, 3: 3}


def test_scc_two_components(spark):
    # cycles {1,2} and {5,6,7}, bridge 2->5 (one-way: stays separate)
    out = _scc(spark, [(1, 2), (2, 1), (5, 6), (6, 7), (7, 5), (2, 5)])
    assert out == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5}


def test_scc_hop_bound_on_long_cycle(spark):
    # the 4-cycle's directed diameter is 3: at max_hops=3 it collapses
    # exactly; at max_hops=2 only the distance-2 pairs witness each
    # other (the documented partial merge for over-diameter components)
    cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert _scc(spark, cyc, max_hops=2) == {1: 1, 3: 1, 2: 2, 4: 2}
    assert set(_scc(spark, cyc, max_hops=3).values()) == {1}


# -- Louvain (synchronous local-moving) ------------------------------------

def _louvain(spark, edges, **kw):
    from neo4j_arrow_spark.operators.graph_algs import louvain_moves

    e = spark.createDataFrame(edges, "u long, v long")
    return {r.node: r.community for r in louvain_moves(e, **kw).collect()}


def test_louvain_triangle_collapses(spark):
    out = _louvain(spark, [(1, 2), (2, 3), (1, 3)])
    assert len(set(out.values())) == 1


def test_louvain_disjoint_triangles_stay_separate(spark):
    out = _louvain(spark, [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9)])
    coms = {}
    for n, c in out.items():
        coms.setdefault(c, set()).add(n)
    assert sorted(map(frozenset, coms.values()), key=min) == [
        frozenset({1, 2, 3}), frozenset({7, 8, 9})
    ]


def test_louvain_partitioning_invariant(spark):
    edges = [(i, (i * 3) % 10) for i in range(10) if i != (i * 3) % 10]
    e1 = _louvain(spark, edges)
    from neo4j_arrow_spark.operators.graph_algs import louvain_moves
    e_df = spark.createDataFrame(edges, "u long, v long").repartition(11)
    e2 = {r.node: r.community for r in louvain_moves(e_df).collect()}
    assert e1 == e2


# ---- unigram surprisal -----------------------------------------------------

def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_surprisal_hand_computed(spark):
    from neo4j_arrow_spark.operators.text import unigram_surprisal

    # corpus: "a a a b" -> N=4, cnt(a)=3, cnt(b)=1
    # ifq(a) = 4 div 3 = 1 (ilog2 0), ifq(b) = 4 (ilog2 2)
    docs = _docs_df(spark, [(1, "a a a"), (2, "b")])
    got = {r.doc_id: r for r in unigram_surprisal(docs, "doc_id").collect()}
    assert got[1].n_tokens == 3 and got[1].mitf_q == 1 and got[1].log2loss_q == 0
    assert got[2].n_tokens == 1 and got[2].mitf_q == 4 and got[2].log2loss_q == 2


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    from neo4j_arrow_spark.operators.text import unigram_surprisal

    common = " ".join(["the"] * 50)
    docs = _docs_df(spark, [(1, common), (2, "zyzzyva qwerty plugh")])
    got = {r.doc_id: r for r in unigram_surprisal(docs, "doc_id").collect()}
    assert got[2].mitf_q > got[1].mitf_q
    assert got[2].log2loss_q > 0


# ---- cross-doc ngram span duplication --------------------------------------

def test_dup_ngram_spans_detects_shared_span(spark):
    from neo4j_arrow_spark.operators.text import dup_ngram_spans

    span = "one two three four"
    docs = _docs_df(spark, [
        (1, span + " unique tail here"),
        (2, "different head then " + span),
        (3, "totally unrelated words only appear once"),
    ])
    got = {r.doc_id: r for r in dup_ngram_spans(docs, "doc_id", n=4).collect()}
    # the shared 4-gram "one two three four" marks docs 1 and 2
    assert got[1].dup_shingles >= 1 and got[2].dup_shingles >= 1
    assert got[3].dup_shingles == 0 and got[3].dup_frac_q == 0
    assert 0 < got[1].dup_frac_q <= 1_000_000


def test_dup_ngram_spans_within_doc_repeat_not_cross(spark):
    from neo4j_arrow_spark.operators.text import dup_ngram_spans

    # doc 1 repeats its own 2-gram; no other doc shares it
    docs = _docs_df(spark, [(1, "x y x y"), (2, "a b c d")])
    got = {r.doc_id: r for r in dup_ngram_spans(docs, "doc_id", n=2).collect()}
    assert got[1].dup_shingles == 0


# ---- temperature sampling weights ------------------------------------------

def test_temperature_weights_rebalance(spark):
    from neo4j_arrow_spark.operators.sampling import temperature_weights
    import math

    rows = [(i, "en") for i in range(90)] + [(90 + i, "sw") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.group: r for r in temperature_weights(docs, "lang").collect()}
    z = math.sqrt(90) + math.sqrt(10)
    assert got["en"].p_raw == 0.9 and got["sw"].p_raw == 0.1
    assert abs(got["sw"].p_temp - math.sqrt(10) / z) < 1e-6
    # tail language is up-weighted, head down-weighted; probs sum to 1
    assert got["sw"].boost > 1 > got["en"].boost
    assert abs(got["en"].p_temp + got["sw"].p_temp - 1.0) < 1e-5


# ---- exact quantized-L2 brute (PQ ground truth) ----------------------------

def test_l2q_topk_exact_ordering(spark):
    from neo4j_arrow_spark.operators.similarity import l2q_topk

    rows = [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [1.0, 1.0]), (4, [0.0, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = l2q_topk(df, df.filter(F.col("vec_id") == 1), "vec_id", "embedding", k=3)
    ranked = [r.neighbor_id for r in got.orderBy("rank").collect()]
    # self first (dist 0), then 2 (0.1), then 4 (0.2)
    assert ranked == [1, 2, 4]


def test_l2q_topk_integer_distances(spark):
    from neo4j_arrow_spark.operators.dedup import QUANT_SCALE
    from neo4j_arrow_spark.operators.similarity import l2q_topk

    rows = [(1, [0.0]), (2, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.neighbor_id: r.l2q for r in l2q_topk(
        df, df.filter(F.col("vec_id") == 1), "vec_id", "embedding", k=2
    ).collect()}
    assert got[1] == 0 and got[2] == QUANT_SCALE * QUANT_SCALE


# ---- PSI drift -------------------------------------------------------------

def test_drift_psi_identical_distributions_near_zero(spark):
    from neo4j_arrow_spark.operators.profiling import drift_psi

    df = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    out = drift_psi(df, df, "x", n_buckets=5).collect()
    assert len(out) == 5
    assert all(r.term_q == 0 for r in out)  # same counts -> ppm equal


def test_drift_psi_detects_shift(spark):
    from neo4j_arrow_spark.operators.profiling import drift_psi

    ref = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    cur = spark.createDataFrame([(9.0,)] * 100, "x double")  # mass collapsed
    rows = drift_psi(ref, cur, "x", n_buckets=5).collect()
    psi = sum(r.term_q for r in rows) / 1e12
    assert psi > 0.25  # 'significant shift' on the standard scale
    top = max(rows, key=lambda r: r.cur_n)
    assert top.bucket == 4 and top.cur_n == 100


def test_drift_psi_out_of_range_clamps(spark):
    from neo4j_arrow_spark.operators.profiling import drift_psi

    ref = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    cur = spark.createDataFrame([(-5.0,), (99.0,)], "x double")
    rows = {r.bucket: r for r in drift_psi(ref, cur, "x", n_buckets=4).collect()}
    assert rows[0].cur_n == 1 and rows[3].cur_n == 1
