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

__all__ = ["profile_table"]


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
