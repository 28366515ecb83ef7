"""Temporal join operators (operators/temporal.py): as-of join
semantics (backward, inclusive, tie-deduped, tolerance) and the
bucketed range pair join (boundary exactness, no duplicates)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators.temporal import asof_join, range_pair_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [(1, 100, _ts(10), 1.0), (2, 100, _ts(20), 2.0), (3, 200, _ts(5), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )


def test_asof_backward_inclusive(spark, left):
    right = spark.createDataFrame(
        [(100, _ts(10), 9.0), (100, _ts(15), 8.0), (200, _ts(6), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, on="user_id", payload=("value",)).collect()
    }
    assert got[1] == (_ts(10), 9.0)  # inclusive: r.ts == l.ts matches
    assert got[2] == (_ts(15), 8.0)  # most recent prior, not first
    assert got[3] == (None, None)  # right row is in the future -> null


def test_asof_tie_dedup_deterministic(spark, left):
    # two right rows at the same (key, ts): greatest payload wins
    right = spark.createDataFrame(
        [(100, _ts(10), 1.0), (100, _ts(10), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, on="user_id", payload=("value",)).collect()
    }
    assert got[1] == 5.0 and got[2] == 5.0


def test_asof_tolerance(spark, left):
    right = spark.createDataFrame(
        [(100, _ts(0), 9.0)], "user_id long, ts timestamp, value double"
    )
    out = asof_join(
        left, right, on="user_id", payload=("value",), tolerance_us=15_000_000
    )
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}
    assert got[1] == 9.0  # 10s gap <= 15s
    assert got[2] is None  # 20s gap > 15s -> nulled
    # schema keeps left columns intact
    assert set(out.columns) == {
        "event_id",
        "user_id",
        "ts",
        "value",
        "asof_ts",
        "asof_value",
    }


def test_range_pairs_boundaries_and_uniqueness(spark):
    # gaps: 60s exactly (in), 61s (out), 0s (out: strict >), crossing a
    # bucket boundary (in)
    events = spark.createDataFrame(
        [
            (1, 100, _ts(0)),
            (2, 100, _ts(60)),  # gap 60 from 1 -> in (inclusive upper)
            (3, 100, _ts(121)),  # gap 61 from 2 -> out
            (4, 200, _ts(59)),
            (5, 200, _ts(61)),  # gap 2, crosses bucket edge -> in
            (6, 200, _ts(61)),  # gap 0 vs 5 -> out
        ],
        "event_id long, user_id long, ts timestamp",
    )
    rows = range_pair_join(events, on="user_id", window_us=60_000_000).collect()
    pairs = {(r["a_id"], r["b_id"]): r["gap_us"] for r in rows}
    assert pairs == {
        (1, 2): 60_000_000,
        (4, 5): 2_000_000,
        (4, 6): 2_000_000,
    }
    # exactly once each
    assert len(rows) == len(pairs)
