"""Data sketches: KMV distinct counting and Count-Min frequency
estimation — deterministic, oracle-verifiable variants.

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

__all__ = ["kmv_distinct", "cms_estimates"]


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


def cms_estimates(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-Min sketch frequency estimates (Cormode & Muthukrishnan
    2005): ``depth`` hash rows × ``width`` buckets; a key's estimate is
    the minimum of its bucket counts — an overestimate bounded by
    collision mass, never an undercount.

    Returns ``(key_col, true_cnt, cms_est)`` per distinct key so
    callers (and the oracle) can see the guaranteed ``cms_est >=
    true_cnt`` relationship and the collision error. Deterministic: the
    bucket assignment is the shared md5 hash family, so DuckDB builds
    the identical sketch.

    Scale shape: the sketch itself is ``depth × width`` cells built by
    one groupBy over exploded (row, bucket) pairs — constant size
    regardless of input (the whole point at 100 TB) — then broadcast
    back onto the distinct keys. The ``true_cnt`` column is for
    verification; a production sketch-only pass skips it and the key
    dedup entirely.
    """
    key_s = F.col(key_col).cast("string")
    arms = F.array(
        *[F.pmod(hash64(key_s, seed=r), F.lit(width)) for r in range(depth)]
    )
    cells = (
        df.select(F.posexplode(arms).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cell_cnt"))
    )
    keys = df.groupBy(key_col).agg(F.count("*").alias("true_cnt"))
    key_arms = keys.select(
        key_col, "true_cnt", F.posexplode(arms).alias("row", "bucket")
    )
    return (
        key_arms.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy(key_col, "true_cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )
