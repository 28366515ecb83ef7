"""Continuous graph ingest — the streaming twin of the bounded write
path (K1/K2).

The reference ingests bounded Arrow streams only (``GdsWriteJob``); a
100 TB deployment needs edges arriving continuously. Here a
relationship stream lands in the graph's parquet-backed rels table via
``foreachBatch`` (append mode, exactly-once per micro-batch through the
checkpoint), and :func:`refresh_graph` re-registers the catalog entry
so readers pick up new files — the Spark-native version of the
reference's "write then re-project" cycle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from neo4j_arrow_spark.catalog import GraphCatalog
from neo4j_arrow_spark.graph import Graph


def start_rel_ingest(
    rel_stream: DataFrame,
    database_path: str,
    checkpoint_path: str | None = None,
):
    """Start appending a streaming relationship frame (reserved columns
    already in place) to ``<database_path>/rels``. Returns the
    StreamingQuery; callers stop it or let it run."""
    rels_path = os.path.join(database_path, "rels")
    checkpoint_path = checkpoint_path or os.path.join(database_path, "_checkpoints", "rels")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(rels_path)

    return (
        rel_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def refresh_graph(
    spark: SparkSession,
    catalog: GraphCatalog,
    name: str,
    database_path: str,
    *,
    database: str | None = None,
) -> Graph:
    """Re-register the parquet-backed graph so the catalog entry sees
    files appended since the last registration (a DataFrame's file
    index is snapshotted at creation — refresh is explicit, and
    synchronous like every catalog write here)."""
    nodes = spark.read.parquet(os.path.join(database_path, "nodes"))
    rels = spark.read.parquet(os.path.join(database_path, "rels"))
    return catalog.register(
        name, nodes, rels, database=database or name, overwrite=True
    )
