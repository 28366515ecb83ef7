"""Cardinality sketches: K-Minimum-Values (KMV) distinct counting.

Spark's ``approx_count_distinct`` (HyperLogLog++) is
implementation-defined — no other engine reproduces its estimates, so
it can never pass an exact oracle. KMV (Bar-Yossef et al. 2002) has
the same mergeable-sketch shape but is a pure function of the data
given a fixed hash: the estimate depends only on the k-th smallest
hash VALUE of the distinct elements. With the repo's md5-derived
60-bit hash (functions/hashing.py) both engines compute identical
estimates — a verifiable approximate-distinct.

Estimator: ``floor((k - 1) * 2^60 / h_k)`` where ``h_k`` is the k-th
smallest distinct hash. Computed in IEEE doubles — (k-1)·2^60 is
exactly representable (small mantissa × power of two), the int→double
cast of ``h_k`` rounds nearest-even identically on both engines, and
one division is exactly specified — so the floored estimate is still
deterministic cross-engine ((k-1)·2^60 overflows int64, hence not
integer arithmetic this time). Groups with fewer than k distinct
values report their exact count.

Scale shape: one shuffle (groupBy key), state per group bounded at k
hashes — the same reason HLL is the 100 TB tool; this is the
deterministic variant for when estimates must be reproducible
(regression-tested pipeline stats, billing-grade counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_arrow_spark.functions.hashing import MASK_BITS, hash64

__all__ = ["kmv_distinct"]


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``:
    ``(group_cols..., n_kmv)``. Deterministic: same data → same
    estimate, on any engine with the shared md5 hash."""
    hashed = df.select(
        *group_cols, hash64(F.col(value_col).cast("string")).alias("_h")
    ).dropDuplicates([*group_cols, "_h"])
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return ranked.groupBy(*group_cols).agg(
        F.expr(
            f"CASE WHEN count(*) < {k} THEN count(*) "
            f"ELSE CAST(floor(({k} - 1) * CAST({1 << MASK_BITS} AS DOUBLE)"
            f" / CAST(max(_h) AS DOUBLE)) AS BIGINT) END"
        ).alias("n_kmv")
    )
