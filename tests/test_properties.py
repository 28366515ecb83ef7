"""Property-based tests (hypothesis) — semantics the operators must
hold for arbitrary inputs, each checked as one Spark job over a
generated batch (examples kept small: every example is a Spark job).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neo4j_arrow_spark.functions import edge
from neo4j_arrow_spark.functions.textfns import tokens
from neo4j_arrow_spark.operators import dedup

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ids = st.integers(min_value=0, max_value=(1 << 30) - 1)
texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
    max_size=200,
)


@given(st.lists(st.tuples(ids, ids), min_size=1, max_size=50), st.booleans())
@settings(**SETTINGS)
def test_edge_pack_roundtrip(spark, pairs, natural):
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = df.select(
        "src",
        "dst",
        edge.pack_edge(F.col("src"), F.col("dst"), natural).alias("p"),
    ).select(
        "src",
        "dst",
        edge.unpack_source(F.col("p")).alias("s"),
        edge.unpack_target(F.col("p")).alias("t"),
        edge.is_natural(F.col("p")).alias("n"),
    )
    for r in out.collect():
        assert (r.s, r.t, r.n) == (r.src, r.dst, natural)


@given(st.lists(texts, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_tokens_match_python_reference(spark, docs):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i long, t string")
    got = {r.i: r.toks for r in df.select("i", tokens("t").alias("toks")).collect()}
    for i, t in enumerate(docs):
        want = [x for x in re.sub("[^a-zA-Z0-9]+", " ", t).lower().split(" ") if x]
        assert got[i] == want, f"text {t!r}"


@given(st.lists(texts, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_shingle_count_law(spark, docs):
    """|shingles(d, n)| == max(0, tokens - n + 1) after dedup <= that."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i long, t string")
    sh = dedup.shingle_table(df, "i", "t", 3)
    counts = {r.doc: r.n for r in sh.groupBy("doc").agg(F.count("*").alias("n")).collect()}
    toks = {r.i: len(r.toks) for r in df.select("i", tokens("t").alias("toks")).collect()}
    for i in toks:
        expected_max = max(0, toks[i] - 2)
        assert counts.get(i, 0) <= expected_max
        if expected_max == 0:
            assert i not in counts


@given(st.lists(st.tuples(st.integers(0, 1 << 40), texts), min_size=1, max_size=40, unique_by=lambda x: x[0]))
@settings(**SETTINGS)
def test_exact_dedup_partition_laws(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_dedup(df, ["text"], "doc_id").collect()
    assert len(out) == len(rows)  # one row in, one row out
    by_id = {r.doc_id: r for r in out}
    texts_by_id = dict(rows)
    for r in out:
        assert r.canonical_id <= r.doc_id
        assert r.is_duplicate == (r.doc_id != r.canonical_id)
        # canonical shares the text and is its own canonical
        assert texts_by_id[r.canonical_id] == texts_by_id[r.doc_id]
        assert by_id[r.canonical_id].canonical_id == r.canonical_id


@given(
    st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=120), min_size=1, max_size=8
    ),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=6),
)
@settings(**SETTINGS)
def test_chunk_documents_window_law(spark, texts_, chunk, overlap):
    """Every chunk is exactly tokens[i*stride : i*stride+chunk]; the
    windows cover every token position."""
    from neo4j_arrow_spark.operators.text import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    docs = spark.createDataFrame(
        list(enumerate(texts_)), "doc_id long, text string"
    )
    rows = chunk_documents(docs, "doc_id", "text", chunk, overlap).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (r["n_tokens"], r["chunk_text"])
    for i, t in enumerate(texts_):
        toks = [w for w in re.split(r"[^0-9A-Za-z]+", t.lower()) if w]
        n = len(toks)
        if n <= chunk:
            n_chunks = 1
        else:
            n_chunks = 1 + -(-(n - chunk) // stride)
        chunks = got[i]
        assert sorted(chunks) == list(range(n_chunks))
        covered = set()
        for cid, (ntok, ctext) in chunks.items():
            expect = toks[cid * stride : cid * stride + chunk]
            assert ctext == " ".join(expect) and ntok == len(expect)
            covered.update(range(cid * stride, min(cid * stride + chunk, n)))
        assert covered == set(range(n))


@given(
    st.lists(st.tuples(ids, st.integers(0, 1000)), min_size=1, max_size=60, unique_by=lambda t: t[0])
)
@settings(**SETTINGS)
def test_weighted_sample_matches_hash_formula(spark, rows):
    """The keep set is exactly the md5-threshold formula, independent of
    partitioning."""
    import hashlib

    from neo4j_arrow_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, k / 1000.0) for i, k in rows], "doc_id long, w double"
    )
    kept = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w").collect()}
    kept_repart = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(7), "doc_id", "w").collect()
    }
    expect = {
        i
        for i, k in rows
        if int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        < k * 1000
    }
    assert kept == expect == kept_repart
