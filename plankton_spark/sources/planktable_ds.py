"""`spark.read.format("planktable")` — Python DataSource wrapper over
the planktable transactional log (plankton_spark/table_format.py), so
the table format is reachable through the standard reader API
(options: `path`, optional `versionAsOf`).

Read path: the driver replays the commit log to a file list (tiny
JSON work), then each data file becomes one InputPartition and is
read executor-side as Arrow RecordBatches — the same
file-per-partition fan-out a native scan has, with Arrow keeping the
transfer columnar. Schema evolution is honored by aligning every
file's batches to the unified snapshot schema (missing columns →
nulls), mirroring parquet mergeSchema.

NOTE the 100 TB hot path remains `PlankTable.read()` (native JVM
vectorized parquet over the explicit file list); this wrapper exists
for API parity and for consumers that only speak `spark.read.format`.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from plankton_spark.table_format import PlankTable


def _snapshot_files(path: str, version: int | None) -> list[str]:
    # log replay needs no SparkSession — only the _log directory
    return PlankTable(None, path).files(version)


def _unified_schema(files: list[str]):
    import pyarrow as pa
    import pyarrow.parquet as pq

    unified = pa.unify_schemas([pq.read_schema(f) for f in files])
    # force nullable: a column added by schema evolution is non-null
    # in ITS files but null for every older file's rows (and parquet
    # marks Spark non-null columns `required`, which would make the
    # aligned null-fill batches violate the declared schema)
    return pa.schema(
        [pa.field(f.name, f.type, nullable=True) for f in unified]
    )


class PlankTableDataSource(DataSource):
    """Options: path (table root), versionAsOf (optional int)."""

    @classmethod
    def name(cls) -> str:
        return "planktable"

    def _resolved(self) -> tuple[str, int | None]:
        path = self.options.get("path")
        if not path:
            raise ValueError("planktable: 'path' option is required")
        v = self.options.get("versionAsOf")
        return path, (int(v) if v is not None else None)

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        path, version = self._resolved()
        files = _snapshot_files(path, version)
        if not files:
            raise FileNotFoundError(f"{path}: empty snapshot")
        return from_arrow_schema(_unified_schema(files))

    def reader(self, schema) -> "PlankTableReader":
        path, version = self._resolved()
        return PlankTableReader(_snapshot_files(path, version))


class _File(InputPartition):
    def __init__(self, file: str):
        self.file = file


class PlankTableReader(DataSourceReader):
    def __init__(self, files: list[str]):
        self.files = files
        # computed once on the driver; shipped to executors with the
        # partition-plan closure so every file aligns to ONE schema
        self.schema_files = list(files)

    def partitions(self):
        return [_File(f) for f in self.files]

    def read(self, partition: _File):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = _unified_schema(self.schema_files)
        table = pq.read_table(partition.file)
        # align to the snapshot schema: add missing columns as nulls,
        # order columns identically (schema-evolution reads)
        arrays = []
        for field in target:
            if field.name in table.column_names:
                arrays.append(table.column(field.name).cast(field.type))
            else:
                arrays.append(pa.nulls(table.num_rows, field.type))
        aligned = pa.table(arrays, schema=target)
        yield from aligned.to_batches()


def register(spark) -> None:
    """Idempotent registration of the planktable format."""
    spark.dataSource.register(PlankTableDataSource)
