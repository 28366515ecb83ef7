"""Round-3 operators: contamination overlap, boilerplate fraction, and
the narrowed repetition_scores plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # eval doc (id 0): shares the 5-gram "a b c d e" with doc 2
        (0, "a b c d e f"),
        (1, "completely different words here now truly"),
        (2, "a b c d e zz"),
        (3, "x y"),  # too short for 5-grams
        (4, "p p p p p p"),  # degenerate repetition
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_overlap(docs):
    out = {
        r.doc_id: r
        for r in text.contamination_overlap(
            docs, "doc_id", F.col("doc_id") == 0, n=5
        ).collect()
    }
    assert 0 not in out  # eval docs excluded
    # doc 2 has 5-grams {"a b c d e", "b c d e zz"}; the first appears
    # in the eval doc
    assert out[2].n_shingles == 2 and out[2].n_contaminated == 1
    assert out[2].contamination_frac == pytest.approx(0.5)
    assert out[1].n_contaminated == 0
    # short doc: no shingles, zero frac (still present)
    assert out[3].n_shingles == 0 and out[3].contamination_frac == 0.0
    # degenerate doc: one distinct 5-gram "p p p p p", not in eval
    assert out[4].n_shingles == 1 and out[4].n_contaminated == 0


def test_boilerplate_fraction(docs):
    # threshold = max(2, floor(5 * 0.4)) = 2 docs
    out = {
        r.doc_id: r
        for r in text.boilerplate_fraction(
            docs, "doc_id", n=3, min_doc_frac=0.4
        ).collect()
    }
    # 3-grams shared by docs 0 and 2: "a b c", "b c d", "c d e"
    assert out[0].n_boilerplate == 3
    assert out[2].n_boilerplate == 3
    assert out[0].boilerplate_frac == pytest.approx(3 / 4)  # 4 distinct 3-grams
    assert out[1].n_boilerplate == 0
    assert out[3].n_shingles == 0 and out[3].boilerplate_frac == 0.0


def test_repetition_scores_values(spark):
    rows = [
        (1, "spam spam spam ham"),   # top word 3/4; bigrams: s-s ×2, s-h → dup 1/3
        (2, "all words differ here"),
        (3, ""),                     # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.repetition_scores(df, "doc_id").collect()}
    assert out[1].n_words == 4
    assert out[1].top_word_frac == pytest.approx(3 / 4)
    assert out[1].dup_bigram_frac == pytest.approx(1 - 2 / 3)
    assert out[2].top_word_frac == pytest.approx(1 / 4)
    assert out[2].dup_bigram_frac == 0.0
    assert out[3].n_words == 0 and out[3].top_word_frac == 0.0


def test_neighbor_sample_fanout_and_determinism(spark):
    from neo4j_arrow_spark.operators.graph_algs import neighbor_sample

    # star: hub 0 with 8 spokes; spokes 1..8 also chained 1-2, 3-4
    edges = [(0, i) for i in range(1, 9)] + [(1, 2), (3, 4)]
    e = spark.createDataFrame(edges, "u long, v long")
    seeds = spark.createDataFrame([(0,)], "node long")
    out = neighbor_sample(e, seeds, fanouts=(3, 2)).collect()
    hop1 = [r for r in out if r.hop == 1]
    hop2 = [r for r in out if r.hop == 2]
    # fanout caps respected per frontier node
    assert len(hop1) == 3 and all(r.u == 0 for r in hop1)
    from collections import Counter

    per_u = Counter(r.u for r in hop2)
    assert all(c <= 2 for c in per_u.values())
    # hop-2 frontier is exactly the hop-1 sampled neighbors
    assert {r.u for r in hop2} <= {r.v for r in hop1}
    # deterministic: rerun gives the identical edge multiset
    again = neighbor_sample(e, seeds, fanouts=(3, 2)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a caller-supplied undirected frame (the r11 shared-derivation
    # path) samples the identical edge multiset and leaves the
    # caller's persist in place
    from neo4j_arrow_spark.operators.graph_algs import _undirected

    und = _undirected(e).persist()
    shared = neighbor_sample(e, seeds, fanouts=(3, 2), und=und).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, shared))
    assert und.storageLevel.useMemory  # lifecycle stays with the caller
    und.unpersist()


def test_hits_fixed_star(spark):
    from neo4j_arrow_spark.operators.graph_algs import hits_fixed

    # two hubs point at shared authority 10; hub 1 also points at 11
    e = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11)], "u long, v long"
    )
    out = {r.node: r for r in hits_fixed(e, iterations=2).collect()}
    S = 1_000_000
    # node 10 (in-deg 2) is the top authority, node 1 the top hub
    assert out[10].auth == S and out[1].hub == S
    assert out[11].auth < S and out[2].hub < S
    # pure sources have auth 0; pure sinks have hub 0
    assert out[1].auth == 0 and out[10].hub == 0
    # deterministic across reruns
    again = {r.node: r for r in hits_fixed(e, iterations=2).collect()}
    assert {k: (v.hub, v.auth) for k, v in out.items()} == {
        k: (v.hub, v.auth) for k, v in again.items()
    }


def test_modularity_two_cliques(spark):
    from neo4j_arrow_spark.operators.graph_algs import modularity

    # two triangles joined by one bridge edge: strong community split
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "u long, v long",
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)], "node long, label long"
    )
    row = modularity(e, labels).collect()[0]
    assert row.m == 7
    # e_c = 3 each, d_0 = d_1 = 7: numerator = 2*(4*7*3 - 49) = 70
    assert row.q_numerator == 70
    assert row.modularity == 70 / (4 * 49)
    # the all-in-one partition scores 0
    one = spark.createDataFrame(
        [(i, 0) for i in range(1, 7)], "node long, label long"
    )
    assert modularity(e, one).collect()[0].modularity == 0.0


def test_pack_sequences_offsets(spark):
    from neo4j_arrow_spark.operators.text import pack_sequences

    rows = [
        (1, "s1", "aaa bbb"),            # 2 tokens
        (2, "s1", "c d e f"),            # 4 tokens
        (3, "s1", "gg hh"),              # 2 tokens
        (4, "s2", "x y z"),              # other shard restarts at 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in pack_sequences(df, "doc_id", "source", seq_len=4).collect()}
    assert out[1].start_offset == 0 and out[1].pack_id == 0
    assert out[2].start_offset == 2 and out[2].pack_id == 0
    assert out[3].start_offset == 6 and out[3].pack_id == 1
    assert out[4].start_offset == 0 and out[4].pack_id == 0
    assert out[2].n_tokens == 4
