"""Bucketed table sink — the shuffle-elimination storage layout.

The reference's K2 write stage builds sorted per-source adjacency
lists so later reads never re-sort (GdsWriteJob.java:498-537). The
Spark-native equivalent of "pay once at write time, skip the shuffle
forever after" is BUCKETING: ``bucketBy(n, key)`` hash-partitions
rows into a fixed number of files per partition and records the
layout in the catalog, so a join or aggregation on the bucket key
reads co-located data and Catalyst drops the Exchange entirely.

At 100 TB this is the difference between re-shuffling the fact table
on every query and never shuffling it: land `lineitem`/`orders`
bucketed by orderkey once, and every orderkey join across the whole
workload becomes a zero-exchange sort-merge join. Both sides must
use the same bucket count (or a divisor) and the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "colocated_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog table bucketed (and by default
    sorted) by ``key``. Sorting within buckets lets the sort-merge
    join skip its per-task sort too — the full "pay at write time"
    layout."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. With
    matching bucket layouts Catalyst plans this WITHOUT any Exchange
    (verified in tests/test_bucketing.py by asserting the physical
    plan) — the join reads bucket i of each side in the same task."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
