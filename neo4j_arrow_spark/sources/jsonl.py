"""JSONL corpus source — the interchange format of large text-corpus
pipelines (one JSON document per line).

Thin by design: ``spark.read.json`` already gives a distributed,
schema-projected, predicate-pushdown-friendly scan. What this wrapper
pins down is the part ingest jobs get wrong at scale:

- an EXPLICIT schema (never schema inference — inference runs an extra
  full pass over 100 TB and silently unions drifting shapes);
- malformed-line capture: PERMISSIVE mode routes unparseable lines
  into ``_corrupt_record`` instead of killing the job, so the pipeline
  can count/quarantine them (a dropped-lines metric is an ingest
  requirement, not a nicety).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["DOCUMENTS_JSONL_SCHEMA", "read_documents_jsonl", "split_corrupt"]

#: the documents-table shape (TESTDATA.md) plus the corrupt-line sink
DOCUMENTS_JSONL_SCHEMA = (
    StructType()
    .add("doc_id", "long")
    .add("lang", "string")
    .add("source", "string")
    .add("text", "string")
    .add("_corrupt_record", "string")
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_JSONL_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus with a pinned schema; malformed lines land
    in ``_corrupt_record`` with every data column null."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_sink_column, corrupt_lines) — quarantine
    split. Spark refuses corrupt-column-only queries over a raw JSON
    scan (column pruning would skip the very parse that fills the
    column — UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    the parsed frame is cached first, exactly as the Spark docs
    prescribe; both halves then read the cached parse. The caller
    unpersists after writing out the quarantine."""
    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, bad
