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


def drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_buckets: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Population Stability Index between two dataset snapshots — the
    standard drift monitor a production training pipeline runs between
    yesterday's and today's corpus (PSI < 0.1 stable, > 0.25 shifted).

    Equal-width buckets over the REFERENCE min/max (out-of-range
    current values clamp into the edge buckets), Laplace +1 smoothing
    so empty buckets stay defined, and the per-bucket term emitted as
    the integer ``term_q = (p_ppm - q_ppm) * floor(scale * ln(p/q))``
    (scale² fixed-point) — each factor is a pure function of integer
    counts, so the sum is order-independent; the only float op is one
    ln() under floor() (the link_prediction aa_q precedent). PSI =
    sum(term_q) / scale².

    Returns one row per bucket: ``(bucket, ref_n, cur_n, ref_ppm,
    cur_ppm, term_q)``.

    Plan: one scalar min/max aggregate broadcast to both sides, one
    map-side-combinable count per side, a broadcast bucket-spine join
    (n_buckets rows) — no shuffle wider than the bucket count."""
    spark = ref.sparkSession
    stats = ref.agg(F.min(col).alias("_mn"), F.max(col).alias("_mx"))

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(stats))
            .select(
                F.least(
                    F.lit(n_buckets - 1),
                    F.greatest(
                        F.lit(0),
                        # constant reference column → zero range; guard the
                        # divide (ANSI mode errors on /0) and land every
                        # value in bucket 0, like scale_properties does
                        F.when(
                            F.col("_mx") != F.col("_mn"),
                            F.floor(
                                (F.col(col) - F.col("_mn"))
                                * n_buckets
                                / (F.col("_mx") - F.col("_mn"))
                            ).cast("int"),
                        ).otherwise(F.lit(0)),
                    ),
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    n_ref, n_cur = ref.count(), cur.count()
    dr, dc = n_ref + n_buckets, n_cur + n_buckets
    out = (
        spine.join(F.broadcast(counts(ref, "_rn")), "bucket", "left")
        .join(F.broadcast(counts(cur, "_cn")), "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("_rn"), F.lit(0)).cast("long").alias("ref_n"),
            F.coalesce(F.col("_cn"), F.lit(0)).cast("long").alias("cur_n"),
        )
        .select(
            "bucket",
            "ref_n",
            "cur_n",
            F.expr(f"(ref_n + 1) * {scale} div {dr}").alias("ref_ppm"),
            F.expr(f"(cur_n + 1) * {scale} div {dc}").alias("cur_ppm"),
        )
    )
    return out.select(
        "bucket",
        "ref_n",
        "cur_n",
        "ref_ppm",
        "cur_ppm",
        F.expr(
            f"(ref_ppm - cur_ppm) * CAST(floor({scale} * "
            "ln(CAST(ref_ppm AS DOUBLE) / CAST(cur_ppm AS DOUBLE))) AS LONG)"
        ).alias("term_q"),
    )
