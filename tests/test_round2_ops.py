"""Round-2 operators: repetition filters, canonical dedup, int8
quantization, Cypher CASE/IN/SKIP, hopping windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.cypher import CypherSyntaxError, cypher_to_sql
from neo4j_arrow_spark.operators.dedup import QUANT_SCALE, normalized_dedup
from neo4j_arrow_spark.operators.similarity import quantize_int8
from neo4j_arrow_spark.operators.text import repetition_scores


def test_repetition_scores_handmade(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),        # one word repeated 4x
            (2, "a b a b a b"),                # bigram loop
            (3, "all distinct words here"),    # clean
            (4, ""),                           # empty
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in repetition_scores(df, "id").collect()}
    assert rows[1]["n_words"] == 4
    assert rows[1]["top_word_frac"] == 1.0
    # "spam spam" x3 bigrams, 1 distinct -> dup frac 2/3
    assert rows[1]["dup_bigram_frac"] == pytest.approx(2 / 3)
    # a-b bigrams: [ab, ba, ab, ba, ab] -> 5 total, 2 distinct
    assert rows[2]["dup_bigram_frac"] == pytest.approx(3 / 5)
    assert rows[3]["top_word_frac"] == pytest.approx(1 / 4)
    assert rows[3]["dup_bigram_frac"] == 0.0
    assert rows[4]["n_words"] == 0 and rows[4]["top_word_frac"] == 0.0


def test_normalized_dedup_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,   World!"),
            (2, "hello world"),      # same canonical form as 1
            (3, "HELLO-WORLD"),      # and again
            (4, "something else"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in normalized_dedup(df, "id").collect()}
    assert out[1]["keeper"] == 1 and out[1]["group_size"] == 3
    assert out[2]["keeper"] == 1 and out[3]["keeper"] == 1
    assert out[4]["keeper"] == 4 and out[4]["group_size"] == 1


def test_quantize_int8_exact(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "id long, embedding array<float>",
    )
    out = {r["id"]: r for r in quantize_int8(df, "id").collect()}
    # max|.| = 1.0 -> components scale to round(x*127)
    assert out[1]["qmax"] == QUANT_SCALE
    assert out[1]["q8"] == "127,-64,32,0"  # round(63.5)=64, round(31.75)=32
    # zero vector: qmax 0, all-zero components (no div-by-zero)
    assert out[2]["qmax"] == 0 and out[2]["q8"] == "0,0,0,0"


def test_cypher_case_and_in(spark):
    sql = cypher_to_sql(
        "MATCH (c:Customer) RETURN CASE WHEN c.acctbal > 0.0 THEN 'p' "
        "ELSE 'n' END AS sign, count(*) AS n",
        "gnodes",
        "grels",
        dialect="spark",
    )
    assert "CASE WHEN" in sql and "GROUP BY" in sql
    dsql = cypher_to_sql(
        "MATCH (c:Customer) WHERE c.name IN ['a', 'b'] "
        "RETURN c.ID AS id ORDER BY id SKIP 2 LIMIT 3",
        "gnodes",
        "grels",
        dialect="duckdb",
    )
    assert "IN ('a', 'b')" in dsql and "LIMIT 3" in dsql and "OFFSET 2" in dsql
    with pytest.raises(CypherSyntaxError):
        cypher_to_sql(
            "MATCH (c:Customer) RETURN CASE END AS x", "gnodes", "grels"
        )


def test_hopping_window_two_windows_per_event(spark):
    from neo4j_arrow_spark.streaming.events import hopping_event_agg

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:07:30", "click", 2.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = hopping_event_agg(ev).collect()
    starts = sorted(str(r["window_start"]) for r in rows)
    # 00:07:30 falls in [00:00, 00:10) and [00:05, 00:15)
    assert starts == ["2024-01-01 00:00:00", "2024-01-01 00:05:00"]
    assert all(r["n_events"] == 1 and r["total_value"] == 2.0 for r in rows)
