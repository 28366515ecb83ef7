"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`neo4j_arrow_spark.queries` — the engine's query
registry. The driver's verify runs ``entry(spark)`` as a smoke check,
runs each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import neo4j_arrow_spark.queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: stream the embedding
    property for all labeled nodes — the reference's headline benchmark
    workload (speed/26-aug-2021/README.md:73-88) as a GDS node scan."""
    from pyspark.sql import functions as F

    from neo4j_arrow_spark.operators.node_scan import gds_nodes
    from neo4j_arrow_spark.sources.tpch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    nodes = emb.select(
        F.col("vec_id").cast("long").alias("ID"),
        F.array(F.lit("Embedding")).alias("LABELS"),
        F.col("embedding"),
    )
    return gds_nodes(nodes, properties=["embedding"], filters=["Embedding"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
