"""Temporal joins: as-of join and bounded range join.

The reference has no temporal operators at all (SURVEY.md §2.4: "Absent
entirely: ... range/as-of/interval joins"); these are the training-data
-pipeline extensions for aligning event streams (feature attribution,
label propagation, leakage-free point-in-time joins).

Scale design
------------
Spark has no native ASOF JOIN (DuckDB/pandas do). The naive formulation
is an inequality join (``r.ts <= l.ts``) — a broadcast-nested-loop or
range-explosion disaster at 100 TB. Both operators here reduce to
**single equi-shuffle plans**:

- :func:`asof_join` — union the two sides, one shuffle on the join key,
  then a running ``last(ignorenulls=True)`` window carries the most
  recent right-side payload forward onto left rows. O(n log n) per key
  partition, no pair explosion, AQE-skew-splittable.
- :func:`range_pair_join` — quantize time into buckets of the window
  width; each left row joins only its own and the next bucket (every
  qualifying pair spans at most one bucket boundary). The inequality
  becomes an equi-join on (key, bucket) + a residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_pair_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    payload: tuple[str, ...] = (),
    prefix: str = "asof_",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the most recent right
    row with ``right.ts <= left.ts`` and the same ``on`` key (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, backward
    direction). Unmatched left rows keep nulls.

    Ties: right rows are deduplicated to one per (key, ts) — the row
    with the greatest first payload column wins — so the result is
    deterministic regardless of partitioning.

    Returns ``left.* + {prefix}{ts} + {prefix}{payload...}``.
    """
    payload = tuple(payload)
    # Deduplicate right to one row per (key, ts): deterministic winner.
    # With no payload columns the rows are identical per (key, ts), so a
    # plain dropDuplicates suffices (an empty window ORDER BY is a Spark
    # analysis error).
    if payload:
        dedup_w = Window.partitionBy(on, ts).orderBy(
            *[F.col(c).desc() for c in payload]
        )
        r = (
            right.select(on, ts, *payload)
            .withColumn("_rn", F.row_number().over(dedup_w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        r = right.select(on, ts).dropDuplicates([on, ts])

    # Union-marker: right rows sort strictly before left rows at equal
    # ts (_side 0 < 1) so the inclusive `r.ts <= l.ts` match holds.
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(left.schema[ts].dataType).alias(f"{prefix}{ts}"),
        *[
            F.lit(None).cast(r.schema[c].dataType).alias(f"{prefix}{c}")
            for c in payload
        ],
    )
    r_tagged = r.select(
        *[
            (
                F.col(c)
                if c in (on, ts)
                else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # One shuffle on the key; running last-non-null carries the payload.
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in (ts, *payload)
    ]
    out = unioned.select(*lcols, "_side", *carried).filter(F.col("_side") == 1).drop(
        "_side"
    )

    if tolerance_us is not None:
        # Null-out matches older than the tolerance (pandas merge_asof
        # `tolerance=`). Done post-match: the carry is already correct.
        too_old = (
            F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"{prefix}{ts}"))
            > tolerance_us
        )
        out = out.select(
            *lcols,
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(f"{prefix}{c}")).alias(
                    f"{prefix}{c}"
                )
                for c in (ts, *payload)
            ],
        )
    return out


def range_pair_join(
    events: DataFrame,
    on: str,
    ts: str = "ts",
    window_us: int = 60_000_000,
) -> DataFrame:
    """All pairs (a, b) with the same key and ``a.ts < b.ts <=
    a.ts + window`` — the bounded self-range-join (co-occurrence mining,
    near-duplicate event detection).

    Bucketing: ``bucket = ts_us div window_us``; a qualifying pair has
    ``b.bucket ∈ {a.bucket, a.bucket+1}``, so exploding each left row to
    its two candidate buckets turns the inequality join into an
    equi-join on (key, bucket) with a residual range filter. Each pair
    is produced exactly once (b's bucket is fixed; a's two candidate
    buckets are distinct).

    Returns one row per pair: ``(on, a_id, b_id, gap_us)`` where *_id
    are the input's ``event_id`` values.
    """
    us = F.unix_micros(F.col(ts))
    # integer `div`, never double division: µs past 2^53 lose exactness
    base = events.select(
        F.col(on), F.col("event_id"), us.alias("_us")
    ).withColumn("_b", F.expr(f"_us div {window_us}"))
    a = base.select(
        F.col(on),
        F.col("event_id").alias("a_id"),
        F.col("_us").alias("_a_us"),
        F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_b"),
    )
    b = base.select(
        F.col(on), F.col("event_id").alias("b_id"), F.col("_us").alias("_b_us"), "_b"
    )
    gap = F.col("_b_us") - F.col("_a_us")
    return (
        a.join(b, [on, "_b"])
        .filter((gap > 0) & (gap <= window_us))
        .select(on, "a_id", "b_id", gap.alias("gap_us"))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_window_minutes: int | None = None,
) -> DataFrame:
    """First-touch funnel analysis: for each user, the earliest
    completion of the ordered ``steps`` sequence — step i+1 must occur
    strictly after the user's matched step-i event (and within
    ``step_window_minutes`` of it, when set).

    Returns one row per user who completed step 1:
    ``(user, step1_ts..stepN_ts, steps_completed)`` — later steps NULL
    once the chain breaks.

    Plan (100 TB shape): one min-aggregate per step, each joined back
    on the user key — every groupBy/join clusters on ``user_col``, so
    after the first exchange the rest reuse the same hash partitioning
    (no per-user windows, no Python). The step filter prunes each scan
    to one event type before it ever shuffles.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    win_us = (
        step_window_minutes * 60 * 1_000_000
        if step_window_minutes is not None
        else None
    )
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_t")
        )
        prev_ts = f"step{i - 1}_ts"
        cond = F.unix_micros(F.col("_t")) > us(prev_ts)
        if win_us is not None:
            cond = cond & (
                F.unix_micros(F.col("_t")) <= us(prev_ts) + F.lit(win_us)
            )
        matched = (
            cur.join(nxt, user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("_t").alias(f"step{i}_ts"))
        )
        cur = cur.join(matched, user_col, "left")
    completed = sum(
        F.when(F.col(f"step{i}_ts").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return cur.withColumn("steps_completed", completed.cast("int"))
