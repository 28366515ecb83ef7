"""Table profiling — the data-quality audit pass of an ingest
pipeline: per-column null counts, exact distinct counts, and min/max.

A 100 TB ingest job runs this before anything else (catch schema rot,
null floods, and key-cardinality surprises early). The plan matters:
one aggregation branch per column, unioned. With columnar storage each
branch's scan is pruned to exactly its one column, so the union reads
the same total bytes as a single all-column pass — but each branch has
a single COUNT(DISTINCT), which Spark plans as a plain two-phase
distinct aggregate. The alternative (all columns in one aggregate)
triggers the multi-distinct Expand rewrite: input rows are duplicated
once per distinct column before the partial agg — a (1 + n_cols)×
row blowup that the union form never pays.

Exact distinct counts are the verifiable default here; at extreme
scale swap in ``approx_count_distinct`` (HLL) — estimates are
implementation-defined, so the oracle covers the exact path.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "scale_properties"]


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile ``cols`` of ``df``: returns one row per column —
    ``(column, n_rows, n_nulls, n_distinct, min_s, max_s)`` with
    min/max rendered as strings so heterogeneous column types share
    one schema (the cross-engine caveat: keep profiled numerics small
    enough to avoid scientific-notation rendering divergence)."""
    branches = []
    for c in cols:
        v = F.col("v")
        branches.append(
            df.select(F.col(c).alias("v")).agg(
                F.lit(c).alias("column"),
                F.count("*").alias("n_rows"),
                F.count_if(v.isNull()).alias("n_nulls"),
                F.count_distinct(v).alias("n_distinct"),
                F.min(v).cast("string").alias("min_s"),
                F.max(v).cast("string").alias("max_s"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), branches)


def scale_properties(
    df: DataFrame,
    id_col: str,
    cols: Sequence[str],
    methods: Sequence[str] = ("minmax",),
    round_to: int = 6,
) -> DataFrame:
    """Feature scaling (GDS ``gds.scaleProperties`` parity) — the
    standard pre-ML normalization pass: per column,

    - ``minmax``:   (x - min) / (max - min)
    - ``center``:   x - mean
    - ``stdscore``: (x - mean) / stddev_pop

    Output keeps ``id_col`` and the raw columns, adding
    ``<col>_<method>`` for every (col, method) pair, rounded to
    ``round_to`` decimals (the final division/subtraction is a single
    IEEE op on deterministic aggregates, so rounding only absorbs
    aggregate sum-order ulps). A constant column scales to 0.0 under
    minmax/stdscore (GDS's convention) rather than NULL.

    Plan: ONE scalar aggregate row computes every statistic (map-side
    combinable), broadcast-crossJoined back — the 1-row scalar join
    pattern, no window, no second scan shape."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
            F.avg(c).alias(f"_avg_{c}"),
            F.stddev_pop(c).alias(f"_std_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.select(id_col, *cols).crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        for m in methods:
            if m == "minmax":
                v = F.when(rng != 0, (F.col(c) - F.col(f"_min_{c}")) / rng).otherwise(0.0)
            elif m == "center":
                v = F.col(c) - F.col(f"_avg_{c}")
            elif m == "stdscore":
                std = F.col(f"_std_{c}")
                v = F.when(std != 0, (F.col(c) - F.col(f"_avg_{c}")) / std).otherwise(0.0)
            else:
                raise ValueError(f"unknown scaling method {m!r}")
            out = out.withColumn(f"{c}_{m}", F.round(v, round_to))
    drop = [f"_{s}_{c}" for c in cols for s in ("min", "max", "avg", "std")]
    return out.drop(*drop)
