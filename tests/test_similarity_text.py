from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators import similarity, text


@pytest.fixture(scope="module")
def emb(spark):
    # 3 tight clusters around the axes
    rows = []
    for i, base in enumerate([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]):
        for j in range(4):
            v = [c + (0.01 * j if c == 0 else 0.0) for c in base]
            rows.append((i * 4 + j, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(emb):
    queries = emb.filter(F.col("vec_id") == 0)
    out = similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    assert all(r.query_id == 0 for r in out)
    assert out[0].cos <= 1.0


def test_cosine_topk_excludes_self(emb):
    out = similarity.cosine_topk(emb, emb, "vec_id", "embedding", k=2)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
    assert out.groupBy("query_id").count().filter("count != 2").count() == 0


def test_ivf_routes_to_right_cluster(emb):
    centroids = emb.filter(F.col("vec_id").isin(0, 4, 8))
    queries = emb.filter(F.col("vec_id") == 1)
    out = similarity.ivf_topk(emb, queries, centroids, "vec_id", "embedding", k=3).collect()
    # neighbors must come from cluster {0,1,2,3}
    assert {r.neighbor_id for r in out} <= {0, 2, 3}


def test_ivf_assign_buckets(emb):
    centroids = emb.filter(F.col("vec_id").isin(0, 4, 8))
    got = {r.item_id: r.bucket for r in
           similarity.ivf_assign(emb, centroids, "vec_id", "embedding").collect()}
    assert got[1] == 0 and got[5] == 4 and got[9] == 8


def test_ivf_assign_2level_matches_flat_when_coarse_is_fine(emb):
    """coarse == fine degenerates to flat assignment: the nearest
    coarse cell is the nearest centroid, and the cell holds exactly
    that centroid (each coarse vector assigns to itself at cos=1)."""
    centroids = emb.filter(F.col("vec_id").isin(0, 4, 8))
    flat = {(r.item_id, r.bucket) for r in
            similarity.ivf_assign(emb, centroids, "vec_id", "embedding").collect()}
    two = {(r.item_id, r.bucket) for r in
           similarity.ivf_assign_2level(
               emb, centroids, centroids, "vec_id", "embedding"
           ).collect()}
    assert two == flat


def test_ivf_assign_2level_bucket_in_cell(emb):
    """Every item's fine bucket must live in the item's coarse cell —
    the membership invariant the two-level router guarantees."""
    fine = emb.filter(F.col("vec_id").isin(0, 1, 4, 5, 8, 9))
    coarse = emb.filter(F.col("vec_id").isin(0, 4, 8))
    fine_cell = {r.item_id: r.bucket for r in
                 similarity.ivf_assign(fine, coarse, "vec_id", "embedding").collect()}
    item_cell = {r.item_id: r.bucket for r in
                 similarity.ivf_assign(emb, coarse, "vec_id", "embedding").collect()}
    out = similarity.ivf_assign_2level(
        emb, fine, coarse, "vec_id", "embedding"
    ).collect()
    assert len(out) == emb.count()
    for r in out:
        assert fine_cell[r.bucket] == item_cell[r.item_id]


def test_ivf_topk_2level_routes_to_right_cluster(emb):
    centroids = emb.filter(F.col("vec_id").isin(0, 4, 8))
    coarse = emb.filter(F.col("vec_id").isin(0, 4))
    queries = emb.filter(F.col("vec_id") == 1)
    out = similarity.ivf_topk(
        emb, queries, centroids, "vec_id", "embedding", k=3,
        coarse=coarse,
    ).collect()
    assert {r.neighbor_id for r in out} <= {0, 2, 3}


def test_bucket_self_topk_skewed_bucket_chunked(spark, monkeypatch):
    """Deliberately skewed bucket: ONE centroid, so every vector lands
    in the same bucket and the self-search Arrow kernel sees the whole
    set in one group. The chunk budget is shrunk so the kernel must
    split the 60 query rows across many chunks (the O(chunk·m) path
    that keeps peak memory bounded at scale) — the output must equal
    the brute-force exact top-k, since with a single bucket the
    per-bucket search IS the global search."""
    from neo4j_arrow_spark.operators import similarity as sim

    rows = [
        (i, [((i * 37 + j * 11) % 97) / 97.0 + 0.01 for j in range(8)])
        for i in range(60)
    ]
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one_centroid = emb2.filter(F.col("vec_id") == 0)
    # 240 // 60 = 4 query rows per chunk -> 15 chunks over one bucket
    monkeypatch.setattr(sim, "_SELF_TOPK_CHUNK_ELEMS", 240)
    got = sim.ivf_topk(
        emb2, emb2, one_centroid, "vec_id", "embedding", k=3
    ).collect()
    want = sim.cosine_topk(emb2, emb2, "vec_id", "embedding", k=3).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert [tuple(r) for r in sorted(got, key=key)] == [
        tuple(r) for r in sorted(want, key=key)
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat and the dog went to the house in a hurry"),
            (1, "el perro y el gato de la casa que es grande y los arboles"),
            (2, "der hund und die katze das ist nicht ein haus"),
            (3, "xyzzy plugh qwerty"),
            (4, "你好 世界 this has cjk"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_lang_id(docs):
    got = {r.doc_id: r.pred for r in
           docs.select("doc_id", text.lang_id(docs).alias("pred")).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"
    assert got[3] == "und"
    assert got[4] == "zh"
    assert got[5] == "und"


def test_lang_id_table_matches_column_form(docs):
    # the bulk (explode+agg) form must agree with the Column form on
    # every row, including empty text and CJK short-circuit
    col_form = {
        r.doc_id: r.pred
        for r in docs.select("doc_id", text.lang_id(docs).alias("pred")).collect()
    }
    table_form = {
        r.doc_id: r.lang_pred
        for r in text.lang_id_table(docs, "doc_id").collect()
    }
    assert table_form == col_form


def test_token_stats(docs):
    got = {r.doc_id: r for r in text.token_stats(docs, "doc_id").collect()}
    assert got[0].n_tokens == 12
    assert got[5].n_tokens == 0
    assert got[0].n_chars_measured == len("the cat and the dog went to the house in a hurry")


def test_quality_scores_bounded(docs):
    for r in text.quality_score(docs, "doc_id").collect():
        assert 0.0 <= r.quality <= 1.0


def test_fingerprint_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.fingerprint(df, "doc_id").collect()}
    assert got[0].fp_exact == got[2].fp_exact
    assert got[0].fp_exact != got[1].fp_exact
    assert got[0].fp_sorted == got[1].fp_sorted  # order-insensitive hash


def test_collocations_lift(spark):
    from neo4j_arrow_spark.operators.text import collocations

    # "new york" always adjacent; extra bare "the"s dilute the-pairs
    docs = spark.createDataFrame(
        [(i, "the cat saw new york and the dog in new york") for i in range(5)]
        + [(99, "the the the the the")],
        "doc_id long, text string",
    )
    rows = collocations(docs, "doc_id", min_count=5).collect()
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["lift_q"]) for r in rows}
    assert got[("new", "york")][0] == 10
    # N = 5*11 + 5 = 60 tokens; c(new)=c(york)=10
    assert got[("new", "york")][1] == 10 * 60 * 1000 // (10 * 10)
    # c(the)=15 now, so "the cat" (5 pairs) scores below "new york"
    assert got[("the", "cat")][1] == 5 * 60 * 1000 // (15 * 5)
    assert got[("the", "cat")][1] < got[("new", "york")][1]
