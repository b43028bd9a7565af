"""Read-only Delta Lake log interop (`spark.read.format("deltalog")`).

Parses `_delta_log/*.json` commit files with pure Python — the same
no-JVM-dependency approach as planktable (table_format.py) — so Delta
tables written elsewhere are readable here without the delta-spark
jar. Supported actions: `metaData` (schemaString, partitionColumns),
`add` (path, partitionValues), `remove`, `protocol`, `commitInfo`.
Parquet checkpoints (`*.checkpoint.parquet`) are parsed with pyarrow
when present, so long tables don't require every JSON commit to
exist. Options: `path`, optional `versionAsOf`.

Scale posture: log replay is metadata work (KBs of JSON per commit,
driver-side, same as delta-spark's own snapshot construction). The
hot path `read_delta()` hands the resolved file list to Spark's
NATIVE vectorized parquet reader — one scan per distinct partition
tuple, partition columns re-attached as cast literals exactly like
Hive-style partition discovery, then a union (Catalyst collapses the
per-partition scans into a single multi-path FileScan per schema).
The Python DataSource wrapper exists for `spark.read.format`
API parity; consumers at 100 TB should use `read_delta`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _commit_versions(log_dir: str) -> list[int]:
    out = []
    for f in os.listdir(log_dir):
        stem, ext = os.path.splitext(f)
        if ext == ".json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


class DeltaLog:
    """Replays a `_delta_log` to (schema, partition columns, active
    files) at a requested version."""

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.log_dir = os.path.join(table_path, "_delta_log")
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"not a Delta table (no _delta_log): {table_path}")

    def latest_version(self) -> int:
        versions = _commit_versions(self.log_dir)
        if not versions:
            raise FileNotFoundError(f"empty _delta_log in {self.table_path}")
        return versions[-1]

    def _checkpoint_at_or_before(self, version: int) -> tuple[int, list[dict]] | None:
        """Newest `<v>.checkpoint.parquet` with v <= version, decoded
        to a list of action dicts (pyarrow; no Spark needed)."""
        best = None
        for f in os.listdir(self.log_dir):
            if f.endswith(".checkpoint.parquet"):
                stem = f.split(".", 1)[0]
                if stem.isdigit() and int(stem) <= version:
                    best = int(stem) if best is None else max(best, int(stem))
        if best is None:
            return None
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(self.log_dir, f"{best:020d}.checkpoint.parquet")
        )
        actions = []
        for row in tbl.to_pylist():
            for kind in ("metaData", "add", "remove", "protocol"):
                if row.get(kind) is not None:
                    actions.append({kind: row[kind]})
        return best, actions

    def snapshot(self, version: int | None = None):
        """Returns (schema: StructType, partition_cols: list[str],
        files: list[(abs_path, partition_values: dict)])."""
        if version is None:
            version = self.latest_version()
        start = 0
        actions: list[dict] = []
        cp = self._checkpoint_at_or_before(version)
        if cp is not None:
            start = cp[0] + 1
            actions.extend(cp[1])
        for v in _commit_versions(self.log_dir):
            if start <= v <= version:
                with open(os.path.join(self.log_dir, f"{v:020d}.json")) as fh:
                    for line in fh:
                        line = line.strip()
                        if line:
                            actions.append(json.loads(line))
        schema: T.StructType | None = None
        part_cols: list[str] = []
        active: dict[str, dict] = {}
        for a in actions:
            if "metaData" in a:
                md = a["metaData"]
                schema = T.StructType.fromJson(json.loads(md["schemaString"]))
                part_cols = list(md.get("partitionColumns") or [])
            elif "add" in a:
                add = a["add"]
                active[add["path"]] = add.get("partitionValues") or {}
            elif "remove" in a:
                active.pop(a["remove"]["path"], None)
        if schema is None:
            raise ValueError(f"no metaData action found in {self.log_dir}")
        files = [
            (os.path.join(self.table_path, rel), pv) for rel, pv in active.items()
        ]
        return schema, part_cols, files


def _cast_partition_value(raw: str | None, dtype: T.DataType):
    """Delta serializes partitionValues as strings (null → JSON null);
    re-cast to the declared column type."""
    if raw is None:
        return F.lit(None).cast(dtype)
    return F.lit(raw).cast(dtype)


def read_delta(spark, table_path: str, version: int | None = None):
    """Native-parquet read of a Delta table at `version` (default:
    latest). Files sharing a partition tuple are read as ONE multi-
    path scan; partition columns come back as cast literals."""
    schema, part_cols, files = DeltaLog(table_path).snapshot(version)
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_schema = T.StructType(data_fields)
    if not files:
        return spark.createDataFrame([], schema)
    by_pv: dict[tuple, list[str]] = {}
    for path, pv in files:
        key = tuple(pv.get(c) for c in part_cols)
        by_pv.setdefault(key, []).append(path)
    pieces = []
    for key, paths in sorted(by_pv.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(data_schema).parquet(*paths)
        for c, raw in zip(part_cols, key):
            df = df.withColumn(c, _cast_partition_value(raw, schema[c].dataType))
        pieces.append(df.select([f.name for f in schema.fields]))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


class DeltaLogDataSource(DataSource):
    """`spark.read.format("deltalog")` — options: path, versionAsOf."""

    @classmethod
    def name(cls) -> str:
        return "deltalog"

    def _resolved(self) -> tuple[str, int | None]:
        path = self.options.get("path")
        if not path:
            raise ValueError("deltalog: 'path' option is required")
        v = self.options.get("versionAsOf")
        return path, (int(v) if v is not None else None)

    def schema(self):
        path, version = self._resolved()
        schema, _, _ = DeltaLog(path).snapshot(version)
        return schema

    def reader(self, schema) -> "DeltaLogReader":
        path, version = self._resolved()
        full_schema, part_cols, files = DeltaLog(path).snapshot(version)
        return DeltaLogReader(full_schema, part_cols, files)


class _DeltaFilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict):
        self.path = path
        self.partition_values = partition_values


class DeltaLogReader(DataSourceReader):
    """One InputPartition per data file (same fan-out as a native
    scan); emits Arrow batches with partition columns re-attached."""

    def __init__(self, schema: T.StructType, part_cols: list[str], files):
        self._schema = schema
        self._part_cols = part_cols
        self._files = files

    def partitions(self):
        return [_DeltaFilePartition(p, pv) for p, pv in self._files]

    def read(self, partition: _DeltaFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches():
            n = batch.num_rows
            cols = []
            for field in target:
                if field.name in self._part_cols:
                    raw = partition.partition_values.get(field.name)
                    arr = pa.array([raw] * n, type=pa.string()).cast(field.type)
                else:
                    arr = batch.column(batch.schema.get_field_index(field.name)).cast(
                        field.type
                    )
                cols.append(arr)
            yield pa.RecordBatch.from_arrays(cols, schema=target)


def register(spark) -> None:
    spark.dataSource.register(DeltaLogDataSource)
