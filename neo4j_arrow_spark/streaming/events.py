"""Event-stream operators over the driver's ``events`` table.

Design: every streaming computation has a batch twin with identical
semantics — the twin is what the DuckDB oracle checks
(``events_window_agg``, ``event_sessions``), and tests additionally pin
stream-result == batch-result on the same data. At scale the stream
source is Kafka/files; here the parquet fixture drives it through the
same code path (``readStream`` + watermark + windowed agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet file with the SAME ts
    normalization as the batch loader (sources.tpch.load_table).

    readStream needs an explicit schema; take it from the parquet
    footer (one driver-side metadata read) rather than hardcoding —
    the fixture's ts physical type has changed across driver versions
    (TIMESTAMP(NANOS) read as long vs native TIMESTAMP(MICROS)), and
    the batch/stream twins must stay in lockstep under both."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # FileStreamSource wants a directory; point it at the sf dir and
    # glob-filter to the events table.
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # nanos-as-long fixture: integer `div` to µs (double division
        # loses µs past the 53-bit mantissa) — see tpch.load_table
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # TIMESTAMP_NTZ can't carry a watermark; UTC session tz makes
        # this cast the identity (same normalization as load_table)
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def windowed_event_agg(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window count/sum per event type. Works on both batch
    and streaming frames; the watermark is applied only when streaming
    (late data beyond it is dropped — semantics the batch twin trivially
    satisfies because batch data is complete)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hopping_event_agg(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Hopping (sliding) window count/sum per event type — each event
    lands in ``width/slide`` overlapping windows. Same stream/batch
    duality as :func:`windowed_event_agg`; Spark's ``window(ts, width,
    slide)`` generates the per-event window copies natively (no
    self-join)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(
    agg: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming frame to completion synchronously against the
    bounded fixture (memory sink + processAllAvailable) — the local
    test harness for what would be a continuous query in production."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization (batch): a session breaks when the gap
    from the previous event exceeds ``gap_minutes``. Classic
    lag + cumulative-sum-of-breaks window plan — one shuffle on
    user_id.

    Output: (user_id, session_id, session_start, session_end, n_events,
    total_value) with session_id dense per user starting at 1."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    # µs-exact gap arithmetic (unix_timestamp would truncate to seconds
    # and disagree with the oracle's epoch_us at boundary gaps)
    is_break = (
        gap.isNull()
        | (F.unix_micros("ts") - F.unix_micros(gap) > gap_minutes * 60 * 1_000_000)
    ).cast("long")
    sessions = events.withColumn(
        "session_id", F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via the native session_window (gap-based
    merging, watermark-managed state)."""
    return (
        events.withWatermark("ts", f"{gap_minutes * 2} minutes")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw").start.alias("session_start"),
            F.col("sw").end.alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stateful_user_counts(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    per-user event count + running value sum across micro-batches —
    the arbitrary-state extension point the reference has no analogue
    for (its jobs are bounded)."""
    from pyspark.sql.streaming.state import GroupState

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, v double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def attribution_join_batch(events: DataFrame, window_minutes: int = 60) -> DataFrame:
    """Click→purchase attribution pairs: every (click, purchase) by the
    same user with the purchase at or within ``window_minutes`` after
    the click. The batch twin of :func:`attribution_join_stream` (the
    oracle-checked side)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    gap = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return (
        clicks.join(purchases, "user_id")
        .filter((gap >= 0) & (gap <= window_minutes * 60 * 1_000_000))
        .select(
            "user_id", "click_id", "purchase_id",
            gap.alias("gap_us"), "purchase_value",
        )
    )


def attribution_join_stream(
    events: DataFrame, window_minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join (the §2.8 capability the reference's
    bounded streams cannot express): both sides watermarked, join
    condition = equi-key + event-time range, so state for a click can
    be dropped once the watermark passes click_ts + window. Same
    output schema/semantics as :func:`attribution_join_batch`."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (clicks["user_id"] == purchases["p_user_id"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            <= clicks["click_ts"] + F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    gap = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return (
        clicks.join(purchases, cond)
        .select(
            "user_id", "click_id", "purchase_id",
            gap.alias("gap_us"), "purchase_value",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once event stream by id: duplicates arriving within the
    watermark window are dropped and the dedup state is pruned as the
    watermark advances (unbounded-state-safe, unlike a plain streaming
    dropDuplicates without an event-time bound). The streaming face of
    operators/dedup.exact_dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def trending_topk(
    events: DataFrame,
    window: str = "15 minutes",
    k: int = 3,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Top-k event types per tumbling window by count (the "trending
    topics" pattern): windowed count + per-window dense ranking with a
    deterministic (count desc, event_type asc) order. Batch and
    streaming share the aggregation; in streaming mode the rank is
    applied by the consumer per emitted window (rank-over-window isn't
    incrementally maintainable, so the streaming face stops at the
    counts — documented divergence).

    Output: (window_start, event_type, n_events, rnk) with rnk <= k.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    counts = src.groupBy(F.window("ts", window).alias("w"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    if events.isStreaming:
        return counts.select(
            F.col("w").start.alias("window_start"), "event_type", "n_events"
        )
    rw = Window.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("w").start.alias("window_start"),
            "event_type",
            "n_events",
            "rnk",
        )
    )
