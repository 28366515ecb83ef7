from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.sources.tpch import load_table
from neo4j_arrow_spark.streaming import events as ev


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


def test_stream_equals_batch_windowed_agg(spark, sf_dir, batch_events):
    """The streaming plan over the same bounded data must agree with
    the batch twin (the oracle-checked query)."""
    stream = ev.read_event_stream(spark, sf_dir)
    assert stream.isStreaming
    agg = ev.windowed_event_agg(stream)
    ev.run_to_memory(agg, "win_agg_test", output_mode="complete")
    got = spark.sql("SELECT * FROM win_agg_test")
    want = ev.windowed_event_agg(batch_events)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sessionize_batch_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10, 1.0),
        (2, "2024-01-01 00:10:00", 10, 2.0),   # same session (10 min gap)
        (3, "2024-01-01 01:00:00", 10, 3.0),   # new session (50 min gap)
        (4, "2024-01-01 00:00:00", 20, 4.0),   # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(r.user_id, r.session_id): r for r in ev.sessionize_batch(df, 30).collect()}
    assert out[(10, 1)].n_events == 2 and out[(10, 1)].total_value == 3.0
    assert out[(10, 2)].n_events == 1
    assert out[(20, 1)].n_events == 1


def test_sessionize_stream_runs(spark, sf_dir, batch_events):
    stream = ev.read_event_stream(spark, sf_dir)
    sess = ev.sessionize_stream(stream, gap_minutes=30)
    ev.run_to_memory(sess, "sess_stream_test", output_mode="complete")
    got = spark.sql("SELECT * FROM sess_stream_test")
    assert got.count() > 0
    # session bounds must be ordered and value sums finite
    assert got.filter("session_end < session_start").count() == 0


def test_stateful_user_counts(spark, sf_dir, batch_events):
    stream = ev.read_event_stream(spark, sf_dir)
    counts = ev.stateful_user_counts(stream)
    ev.run_to_memory(counts, "stateful_test", output_mode="update")
    got = spark.sql(
        "SELECT user_id, max_by(n_events, n_events) AS n FROM stateful_test GROUP BY user_id"
    )
    want = batch_events.groupBy("user_id").count()
    joined = got.join(want, "user_id").filter("n != count")
    assert joined.count() == 0
    assert got.count() == want.count()


def test_continuous_rel_ingest(spark, sf_dir, tmp_path_factory):
    """Streaming edges land in a parquet-backed graph; refresh makes
    them catalog-visible; a second run of the same source is a no-op
    (checkpointed exactly-once)."""
    import pyspark.sql.functions as F

    from neo4j_arrow_spark.catalog import GraphCatalog
    from neo4j_arrow_spark.streaming.ingest import refresh_graph, start_rel_ingest

    db = str(tmp_path_factory.mktemp("streamdb"))
    cat = GraphCatalog(spark)

    # nodes: the distinct users + event types of the fixture
    batch = load_table(spark, sf_dir, "events")
    users = batch.select(F.col("user_id").alias("ID")).distinct()
    types = batch.select(
        (F.abs(F.xxhash64("event_type")) % 1000 + 1_000_000).alias("ID")
    ).distinct()
    nodes = users.unionByName(types).distinct().withColumn(
        "LABELS", F.array(F.lit("N"))
    )
    nodes.write.mode("overwrite").parquet(f"{db}/nodes")

    edges = lambda df: df.select(
        F.col("user_id").alias("START_ID"),
        (F.abs(F.xxhash64("event_type")) % 1000 + 1_000_000).alias("END_ID"),
        F.lit("DID").alias("TYPE"),
        F.col("value").alias("weight"),
    )
    stream = edges(ev.read_event_stream(spark, sf_dir))
    q = start_rel_ingest(stream, db)
    q.processAllAvailable(); q.stop()

    g = refresh_graph(spark, cat, "streamg", db)
    n_events = batch.count()
    assert g.rel_count() == n_events

    # restart on the same checkpoint: no duplication
    q2 = start_rel_ingest(edges(ev.read_event_stream(spark, sf_dir)), db)
    q2.processAllAvailable(); q2.stop()
    g = refresh_graph(spark, cat, "streamg", db)
    assert g.rel_count() == n_events


def test_stream_stream_attribution_equals_batch(spark, sf_dir, batch_events):
    """Watermarked stream-stream join over the bounded fixture must
    produce exactly the batch twin's pairs."""
    stream = ev.read_event_stream(spark, sf_dir)
    joined = ev.attribution_join_stream(stream, window_minutes=60)
    assert joined.isStreaming
    ev.run_to_memory(joined, "attr_test", output_mode="append")
    got = spark.sql("SELECT * FROM attr_test")
    want = ev.attribution_join_batch(batch_events, window_minutes=60)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_dedup_within_watermark(spark, sf_dir, batch_events):
    """A doubled stream deduped by event_id must reproduce the distinct
    batch events exactly."""
    s1 = ev.read_event_stream(spark, sf_dir)
    s2 = ev.read_event_stream(spark, sf_dir)
    doubled = s1.unionByName(s2)
    deduped = ev.dedup_events_stream(doubled)
    assert deduped.isStreaming
    ev.run_to_memory(deduped, "dedup_test", output_mode="append")
    got = spark.sql("SELECT * FROM dedup_test")
    assert got.count() == batch_events.count()
    assert got.select("event_id").distinct().count() == batch_events.count()


def test_trending_topk_stream_counts_match_batch(spark, sf_dir, batch_events):
    """The streaming face of trending_topk emits per-window counts;
    ranking happens consumer-side. Counts must equal the batch twin's
    pre-rank aggregation."""
    stream = ev.read_event_stream(spark, sf_dir)
    agg = ev.trending_topk(stream)
    ev.run_to_memory(agg, "trend_stream_test", output_mode="complete")
    got = spark.sql(
        "SELECT window_start, event_type, n_events FROM trend_stream_test"
    )
    want = (
        batch_events.groupBy(
            F.window("ts", "15 minutes").alias("w"), "event_type"
        )
        .count()
        .select(
            F.col("w").start.alias("window_start"),
            "event_type",
            F.col("count").alias("n_events"),
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
