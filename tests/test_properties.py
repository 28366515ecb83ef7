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
