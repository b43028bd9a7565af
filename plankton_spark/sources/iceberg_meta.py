"""Read-only Apache Iceberg table interop (`read_iceberg` +
`spark.read.format("iceberglog")`).

Pure-Python parse of the published Iceberg table spec's metadata
chain — no iceberg-spark jar required:

    metadata/vN.metadata.json   table metadata: schemas, snapshots
      └─ snapshot.manifest-list (Avro)  one row per live manifest
           └─ manifest file    (Avro)  entries: status + data_file

The nested-Avro manifests are decoded with the engine's own
spec-complete datum codec (sources/avro_ocf.py, read_ocf_generic).
Entry semantics per the spec: status 0=EXISTING, 1=ADDED, 2=DELETED;
a snapshot's live file set is every non-DELETED entry across the
manifests its manifest-list names. Iceberg parquet data files carry
all columns (identity partition values included), so the hot read
path is a single native multi-path parquet scan — no partition-value
re-attachment needed, unlike Delta.

Scale posture: metadata work is proportional to manifest count (KBs
of Avro per manifest, same work iceberg-spark's own planning does
driver-side); data reading stays native vectorized parquet. The
Python DataSource wrapper exists for reader-API parity; `read_iceberg`
is the 100 TB path. snapshotId option gives time travel.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from plankton_spark.sources.avro_ocf import read_ocf_generic


def _iceberg_type_to_spark(t) -> T.DataType:
    if isinstance(t, dict):
        raise ValueError(f"nested iceberg types not supported yet: {t!r}")
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "date": T.DateType(),
        "timestamp": T.TimestampNTZType(),
        "timestamptz": T.TimestampType(),
        "binary": T.BinaryType(),
        "uuid": T.StringType(),
    }
    if t in prim:
        return prim[t]
    if t.startswith("decimal("):
        p, s = t[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s))
    raise ValueError(f"unsupported iceberg type: {t!r}")


class IcebergTable:
    """Metadata-chain reader for one Iceberg table directory."""

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.meta_dir = os.path.join(table_path, "metadata")
        if not os.path.isdir(self.meta_dir):
            raise FileNotFoundError(f"not an Iceberg table (no metadata/): {table_path}")
        self.metadata = self._load_current_metadata()

    def _load_current_metadata(self) -> dict:
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as f:
                v = int(f.read().strip())
            path = os.path.join(self.meta_dir, f"v{v}.metadata.json")
        else:
            versions = sorted(
                int(f[1:].split(".")[0])
                for f in os.listdir(self.meta_dir)
                if f.startswith("v") and f.endswith(".metadata.json")
            )
            if not versions:
                raise FileNotFoundError(f"no vN.metadata.json in {self.meta_dir}")
            path = os.path.join(self.meta_dir, f"v{versions[-1]}.metadata.json")
        with open(path) as f:
            return json.load(f)

    def schema(self) -> T.StructType:
        md = self.metadata
        schemas = md.get("schemas")
        if schemas:
            current = md.get("current-schema-id", 0)
            ice = next(s for s in schemas if s.get("schema-id") == current)
        else:  # format v1 single-schema layout
            ice = md["schema"]
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _iceberg_type_to_spark(f["type"]),
                    not f.get("required", False),
                )
                for f in ice["fields"]
            ]
        )

    def snapshots(self) -> list[dict]:
        return self.metadata.get("snapshots", [])

    def _snapshot(self, snapshot_id: int | None) -> dict:
        snaps = self.snapshots()
        if not snaps:
            raise ValueError(f"{self.table_path}: no snapshots")
        if snapshot_id is None:
            current = self.metadata.get("current-snapshot-id")
            sel = [s for s in snaps if s["snapshot-id"] == current]
            return sel[0] if sel else snaps[-1]
        sel = [s for s in snaps if s["snapshot-id"] == snapshot_id]
        if not sel:
            raise ValueError(f"{self.table_path}: unknown snapshot {snapshot_id}")
        return sel[0]

    def _resolve(self, path: str) -> str:
        """Manifest/data paths in metadata may be absolute URIs from the
        writing engine; re-root them under this table directory."""
        if os.path.isabs(path) and os.path.exists(path):
            return path
        for marker in ("/metadata/", "/data/"):
            if marker in path:
                rel = path.split(marker, 1)[1]
                return os.path.join(self.table_path, marker.strip("/"), rel)
        return os.path.join(self.table_path, path.lstrip("/"))

    def data_files(self, snapshot_id: int | None = None) -> list[str]:
        """Live data files at a snapshot: every non-DELETED manifest
        entry across the snapshot's manifest list."""
        snap = self._snapshot(snapshot_id)
        manifest_list = self._resolve(snap["manifest-list"])
        files: list[str] = []
        for m in read_ocf_generic(manifest_list):
            manifest = self._resolve(m["manifest_path"])
            for entry in read_ocf_generic(manifest):
                if entry["status"] == 2:  # DELETED
                    continue
                df = entry["data_file"]
                if df.get("content", 0) != 0:  # delete files not supported
                    raise ValueError("iceberg delete files (v2 row deletes) unsupported")
                files.append(self._resolve(df["file_path"]))
        return sorted(set(files))


def read_iceberg(spark, table_path: str, snapshot_id: int | None = None):
    """Native-parquet read of an Iceberg table at a snapshot (default:
    current). One multi-path vectorized scan over the live file set."""
    t = IcebergTable(table_path)
    schema = t.schema()
    files = t.data_files(snapshot_id)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


class IcebergDataSource(DataSource):
    """`spark.read.format("iceberglog")` — options: path, snapshotId."""

    @classmethod
    def name(cls) -> str:
        return "iceberglog"

    def _resolved(self) -> tuple[str, int | None]:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberglog: 'path' option is required")
        sid = self.options.get("snapshotId")
        return path, (int(sid) if sid is not None else None)

    def schema(self):
        path, _ = self._resolved()
        return IcebergTable(path).schema()

    def reader(self, schema) -> "IcebergReader":
        path, sid = self._resolved()
        t = IcebergTable(path)
        return IcebergReader(t.schema(), t.data_files(sid))


class _IceFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class IcebergReader(DataSourceReader):
    """One InputPartition per data file, Arrow batches out."""

    def __init__(self, schema: T.StructType, files: list[str]):
        self._schema = schema
        self._files = files

    def partitions(self):
        return [_IceFilePartition(p) for p in self._files]

    def read(self, partition: _IceFilePartition):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches():
            cols = [
                batch.column(batch.schema.get_field_index(f.name)).cast(f.type)
                for f in target
            ]
            import pyarrow as pa

            yield pa.RecordBatch.from_arrays(cols, schema=target)


def register(spark) -> None:
    spark.dataSource.register(IcebergDataSource)
