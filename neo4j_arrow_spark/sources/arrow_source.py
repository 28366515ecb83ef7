"""`spark.read.format("neo4j_arrow")` — the Arrow-based DataFrame
reader, as a Spark 4 Python DataSource.

The reference's entire transport is "stream graph tables as Arrow
record batches, N partitions in parallel" (``Producer.java:140-186``:
partitioned WorkBuffers; client ``neo4j_arrow.py:313-323``: consume
FlightStreams). The idiomatic Spark 4 shape of that contract is the
Python DataSource API: the driver plans schema + one InputPartition
per parquet file of a :func:`~neo4j_arrow_spark.operators.ingest.
bulk_import` database directory, and each executor task streams
``pyarrow.RecordBatch``es straight out of its file — Arrow end to
end, no row materialization in Python.

Filter pushdown (``pushFilters``) understands equality/IN on the
directory-partition column (``TYPE`` for rels, ``_primary_label`` for
label-partitioned nodes) and prunes whole directories before any I/O —
the reader-side twin of the partition-pruning write layout. All other
filters are left for Catalyst to apply on top.

Usage::

    spark.dataSource.register(GraphArrowDataSource)
    rels = (spark.read.format("neo4j_arrow")
            .option("path", f"{db_dir}/rels")
            .load())
    rels.filter(rels.TYPE == "BUYS_FROM")   # pruned at planning time

Scale shape: one partition per file means parallelism tracks the
writer's layout (files per TYPE dir ∝ upstream shuffle partitions);
``batch_size`` bounds per-batch memory exactly like the reference's
``ARROW_BATCH_SIZE`` (Config.java:58-61).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = ["GraphArrowDataSource", "register"]

DEFAULT_BATCH_SIZE = 1024  # ARROW_BATCH_SIZE default, Config.java:58-61


def _partition_dirs(path: str) -> list[tuple[str | None, str]]:
    """(partition_value, dir) pairs: `key=value` subdirectories of a
    partitioned dataset, or [(None, path)] for a flat one."""
    subs = [
        d
        for d in sorted(os.listdir(path))
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    if not subs:
        return [(None, path)]
    return [(d.split("=", 1)[1], os.path.join(path, d)) for d in subs]


def _partition_col(path: str) -> str | None:
    subs = [d for d in sorted(os.listdir(path)) if "=" in d]
    return subs[0].split("=", 1)[0] if subs else None


def _data_files(d: str) -> list[str]:
    return [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.endswith((".parquet", ".arrows"))
    ]


class _FilePartition(InputPartition):
    def __init__(self, file: str, part_value: str | None):
        self.file = file
        self.part_value = part_value


class _GraphArrowReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType, batch_size: int):
        self.path = path
        self.spark_schema = schema
        self.batch_size = batch_size
        self.part_col = _partition_col(path)
        self.dirs = _partition_dirs(path)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune `key=value` directories for equality/IN filters on the
        partition column; everything else is returned for Spark to
        evaluate."""
        for f in filters:
            if (
                self.part_col is not None
                and isinstance(f, (EqualTo, In))
                and f.attribute == (self.part_col,)
            ):
                wanted = (
                    {str(f.value)}
                    if isinstance(f, EqualTo)
                    else {str(v) for v in f.value}
                )
                self.dirs = [
                    (val, d) for val, d in self.dirs if val in wanted
                ]
            else:
                yield f  # not ours — Spark applies it post-scan

    def partitions(self) -> list[InputPartition]:
        return [
            _FilePartition(f, val)
            for val, d in self.dirs
            for f in _data_files(d)
        ]

    def _file_batches(self, file: str, file_cols: list[str]):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if file.endswith(".arrows"):
            # Arrow IPC stream written by the neo4j_arrow writer: the
            # batch layout on disk IS the transport batching (the
            # reference's ARROW_BATCH_SIZE contract), so batches pass
            # through as stored; column-prune per batch.
            with pa.OSFile(file, "rb") as f, pa.ipc.open_stream(f) as rd:
                for batch in rd:
                    yield batch.select(file_cols)
            return
        pf = pq.ParquetFile(file)
        yield from pf.iter_batches(
            batch_size=self.batch_size, columns=file_cols
        )

    def read(self, partition: _FilePartition):  # executor side
        import pyarrow as pa

        names = [f.name for f in self.spark_schema.fields]
        file_cols = [c for c in names if c != self.part_col]
        for batch in self._file_batches(partition.file, file_cols):
            if self.part_col is not None:
                # re-inject the directory-encoded partition value as a
                # constant column, preserving schema() column order
                const = pa.array([partition.part_value] * batch.num_rows)
                arrays = [
                    const
                    if name == self.part_col
                    else batch.column(file_cols.index(name))
                    for name in names
                ]
                batch = pa.RecordBatch.from_arrays(arrays, names=names)
            yield batch


class _ArrowIPCWriter(DataSourceArrowWriter):
    """Per-task Arrow IPC stream writer: each partition lands as one
    ``part-<uuid>.arrows`` file of RecordBatches — the write-side twin
    of the reference's partitioned WorkBuffer transport (one buffer
    stream per partition, ``Producer.java:140-186``). Batches flow
    from the executor straight into the IPC stream; no row
    materialization in Python. The driver stamps ``_SUCCESS`` on
    commit; an aborted task's file is removed by name."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> WriterCommitMessage:
        import uuid

        import pyarrow as pa

        it = iter(iterator)
        try:
            first = next(it)
        except StopIteration:
            return WriterCommitMessage()  # empty partition -> no file
        name = f"part-{uuid.uuid4().hex}.arrows"
        full = os.path.join(self.path, name)
        with pa.OSFile(full, "wb") as sink:
            with pa.ipc.new_stream(sink, first.schema) as w:
                w.write_batch(first)
                for batch in it:
                    w.write_batch(batch)
        return WriterCommitMessage()

    def commit(self, messages) -> None:
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        pass


class GraphArrowDataSource(DataSource):
    """``format("neo4j_arrow")``: read a bulk_import table directory
    (``<db>/nodes`` or ``<db>/rels``) or an Arrow IPC dataset as Arrow
    batches with partition-directory pruning, and write DataFrames as
    Arrow IPC stream files (``df.write.format("neo4j_arrow")``)."""

    @classmethod
    def name(cls) -> str:
        return "neo4j_arrow"

    def schema(self) -> StructType:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options["path"]
        part_col = _partition_col(path)
        _, first_dir = _partition_dirs(path)[0]
        files = _data_files(first_dir)
        if not files:
            raise FileNotFoundError(f"no data files under {path}")
        if files[0].endswith(".arrows"):
            with pa.OSFile(files[0], "rb") as f, pa.ipc.open_stream(f) as rd:
                arrow_schema = rd.schema
        else:
            arrow_schema = pq.read_schema(files[0])
        spark_schema = from_arrow_schema(arrow_schema)
        if part_col is not None:
            spark_schema = spark_schema.add(part_col, "string", False)
        return spark_schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return _GraphArrowReader(
            self.options["path"],
            schema,
            int(self.options.get("batch_size", DEFAULT_BATCH_SIZE)),
        )

    def writer(self, schema: StructType, overwrite: bool):
        path = self.options["path"]
        os.makedirs(path, exist_ok=True)
        if overwrite:
            # driver-side, before any task runs — the writer's contract
            # mirrors df.write.mode("overwrite")
            for f in os.listdir(path):
                if f.endswith(".arrows") or f == "_SUCCESS":
                    os.remove(os.path.join(path, f))
        return _ArrowIPCWriter(path)


def register(spark) -> None:
    """Register the format with a session: ``register(spark)`` then
    ``spark.read.format("neo4j_arrow")``."""
    spark.dataSource.register(GraphArrowDataSource)
