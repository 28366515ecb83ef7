"""Sources: parquet-table loaders, graph derivations, CSV dialects.

The reference's sources are Cypher scans and GDS projections
(SURVEY.md §2.1); here sources produce DataFrames for the catalog.
"""

from neo4j_arrow_spark.sources.bucketed import colocated_join, write_bucketed
from neo4j_arrow_spark.sources.jsonl import read_documents_jsonl, split_corrupt
from neo4j_arrow_spark.sources.tpch import TPCH_TABLES, load_tables
from neo4j_arrow_spark.sources.tpch_graph import graph_frames_from_tpch

__all__ = [
    "TPCH_TABLES",
    "load_tables",
    "graph_frames_from_tpch",
    "write_bucketed",
    "colocated_join",
    "read_documents_jsonl",
    "split_corrupt",
]
