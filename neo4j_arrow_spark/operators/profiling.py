"""Table profiling — the data-quality audit pass of an ingest
pipeline: per-column null counts, exact distinct counts, and min/max,
in ONE scan.

A 100 TB ingest job runs this before anything else (catch schema rot,
null floods, and key-cardinality surprises early). The plan matters:
all columns profile in a single aggregation over one pass of the data
— not one scan per column — then the wide result row pivots to long
form driver-free with a literal-array explode.

Exact ``count(distinct)`` per column makes the single aggregate expand
to one Expand-based pass per distinct column (Spark plans multi-
distinct aggregates via Expand). That is the verifiable default here;
at extreme scale swap in ``approx_count_distinct`` (HLL) — estimates
are implementation-defined, so the oracle covers the exact path.
"""

from __future__ import annotations

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
    aggs = [F.count("*").alias("_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count_if(col.isNull()).alias(f"_nn_{c}"),
            F.count_distinct(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_mi_{c}"),
            F.max(col).cast("string").alias(f"_ma_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mi_{c}").alias("min_s"),
                F.col(f"_ma_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
