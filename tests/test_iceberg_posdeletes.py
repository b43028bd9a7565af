"""Iceberg format-v2 POSITION delete support: delete manifests
(content=1) whose parquet files mark (file_path, pos) rows are
honored by read_iceberg via a `_metadata.row_index` anti-join —
closing the r5-era refusal (iceberg v2 row deletes). Equality
deletes still refuse, and every whole-file access path (data_entries
→ DSv2 wrapper, writer rewrites, streaming) refuses position-deleted
snapshots instead of resurrecting rows — mirroring the Delta DV
posture in tests/test_deletion_vectors.py."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from plankton_spark.sources.avro_ocf import write_ocf_generic
from plankton_spark.sources.iceberg_meta import (
    IcebergTable,
    _entry_schema,
    read_iceberg,
)

_LIST_SCHEMA_V2 = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_ICE_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "string"},
    ],
}


def _author_v2_table(
    tmp_path,
    name: str,
    deleted_pos: list[int],
    delete_path_style: str = "relative",
    delete_content: int = 1,
):
    """v2 table: one 20-row data file + one delete manifest whose
    parquet marks `deleted_pos` of that file. Returns (root, ks)."""
    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    ks = list(range(20))
    pq.write_table(
        pa.table(
            {"k": pa.array(ks, pa.int64()), "grp": pa.array(["g"] * 20)}
        ),
        os.path.join(root, "data", "d0.parquet"),
    )
    if delete_path_style == "relative":
        ref = "data/d0.parquet"
    else:  # absolute URI from a foreign engine
        ref = "s3://bucket/warehouse/tbl/data/d0.parquet"
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([ref] * len(deleted_pos)),
                "pos": pa.array(deleted_pos, pa.int64()),
            }
        ),
        os.path.join(root, "data", "del0.parquet"),
    )

    def entry(df_dict):
        return {"status": 1, "snapshot_id": 1, "data_file": df_dict}

    es = _entry_schema([])
    m_data = os.path.join(root, "metadata", "m-data.avro")
    write_ocf_generic(
        m_data,
        es,
        [
            entry(
                {
                    "content": 0,
                    "file_path": "data/d0.parquet",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 20,
                    "file_size_in_bytes": 1,
                }
            )
        ],
    )
    m_del = os.path.join(root, "metadata", "m-del.avro")
    write_ocf_generic(
        m_del,
        es,
        [
            entry(
                {
                    "content": delete_content,
                    "file_path": "data/del0.parquet",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": len(deleted_pos),
                    "file_size_in_bytes": 1,
                }
            )
        ],
    )
    ml = os.path.join(root, "metadata", "snap-1.avro")
    write_ocf_generic(
        ml,
        _LIST_SCHEMA_V2,
        [
            {
                "manifest_path": "metadata/m-data.avro",
                "manifest_length": os.path.getsize(m_data),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": 1,
            },
            {
                "manifest_path": "metadata/m-del.avro",
                "manifest_length": os.path.getsize(m_del),
                "partition_spec_id": 0,
                "content": 1,
                "added_snapshot_id": 1,
            },
        ],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": name,
        "location": root,
        "last-updated-ms": 1,
        "last-column-id": 2,
        "schema": _ICE_SCHEMA,
        "schemas": [_ICE_SCHEMA],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1,
                "manifest-list": "metadata/snap-1.avro",
            }
        ],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(metadata, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    return root, ks


def test_position_deletes_applied(spark, tmp_path):
    root, ks = _author_v2_table(tmp_path, "v2pd", [0, 5, 19])
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [k for k in ks if k not in (0, 5, 19)]


def test_position_deletes_with_foreign_absolute_paths(spark, tmp_path):
    """Foreign engines reference absolute URIs; the /data/-suffix
    normalization must still match the locally-resolved data file."""
    root, ks = _author_v2_table(
        tmp_path, "v2pd_abs", [1, 2], delete_path_style="absolute"
    )
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [k for k in ks if k not in (1, 2)]


def test_equality_deletes_refused(spark, tmp_path):
    root, _ = _author_v2_table(
        tmp_path, "v2eq", [0], delete_content=2
    )
    with pytest.raises(ValueError, match="equality delete"):
        read_iceberg(spark, root).count()


def test_whole_file_paths_refuse_posdeleted_snapshots(spark, tmp_path):
    root, _ = _author_v2_table(tmp_path, "v2pd_refuse", [0])
    t = IcebergTable(root)
    with pytest.raises(ValueError, match="position-delete"):
        t.data_entries(None)
    with pytest.raises(ValueError, match="position-delete"):
        t.data_files(None)


def test_posdelete_scan_stays_distributed(spark, tmp_path, monkeypatch):
    import pyspark.sql.classic.dataframe as cdf

    root, ks = _author_v2_table(tmp_path, "v2pd_nocollect", [3, 4])

    def boom(self, *a, **k):
        raise AssertionError("driver-side collect() in posdelete read")

    monkeypatch.setattr(cdf.DataFrame, "collect", boom)
    assert read_iceberg(spark, root).count() == len(ks) - 2


def test_aggregate_correctness_after_deletes(spark, tmp_path):
    root, ks = _author_v2_table(tmp_path, "v2pd_agg", [2, 7, 11])
    got = read_iceberg(spark, root).agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")
    ).collect()[0]
    keep = [k for k in ks if k not in (2, 7, 11)]
    assert (got.n, got.s) == (len(keep), sum(keep))


# ---------------------------------------------------------------------
# POSITION-DELETE WRITING (round 7): the engine's own v2 delete path.
# ---------------------------------------------------------------------

from plankton_spark.sources.iceberg_meta import IcebergWriter  # noqa: E402


def _data_parquets(root):
    d = os.path.join(root, "data")
    out = []
    for dirpath, _, files in os.walk(d):
        out += [
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        ]
    return sorted(out)


def test_delete_where_pos_marks_without_rewrite(spark, tmp_path):
    root = str(tmp_path / "ipd_w")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 10).coalesce(1).select(F.col("id").alias("k")))
    w.append(spark.range(10, 20).coalesce(1).select(F.col("id").alias("k")))
    before = _data_parquets(root)
    s = w.delete_where_pos(F.col("k") % 3 == 0)
    assert s is not None
    # no pre-existing data file rewritten; exactly ONE new file (the
    # position-delete parquet)
    after = _data_parquets(root)
    assert set(before) <= set(after) and len(after) == len(before) + 1
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [k for k in range(20) if k % 3 != 0]
    # metadata is format-version 2 now
    assert IcebergTable(root).metadata["format-version"] == 2
    # deletes ACCUMULATE across commits
    w.delete_where_pos(F.col("k") % 5 == 0)
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [k for k in range(20) if k % 3 != 0 and k % 5 != 0]
    # time travel: first delete's snapshot sees only its deletes
    v1 = sorted(r.k for r in read_iceberg(spark, root, snapshot_id=s).collect())
    assert v1 == [k for k in range(20) if k % 3 != 0]
    # whole-file paths refuse now
    with pytest.raises(ValueError, match="position-delete"):
        IcebergTable(root).data_entries(None)


def test_delete_where_pos_null_predicate_retained(spark, tmp_path):
    root = str(tmp_path / "ipd_null")
    w = IcebergWriter(spark, root)
    w.create(
        spark.createDataFrame([(1, 10), (2, None), (3, 5)], "k long, v long")
    )
    w.delete_where_pos(F.col("v") == 5)
    got = sorted((r.k, r.v) for r in read_iceberg(spark, root).collect())
    assert got == [(1, 10), (2, None)]


def test_delete_where_pos_then_append_keeps_content_kinds(spark, tmp_path):
    """An append AFTER a position delete carries the delete manifest
    forward with its content kind intact (manifest-list v2 shape)."""
    root = str(tmp_path / "ipd_app")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 6).coalesce(1).select(F.col("id").alias("k")))
    w.delete_where_pos(F.col("k") < 2)
    w.append(spark.range(100, 103).coalesce(1).select(F.col("id").alias("k")))
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [2, 3, 4, 5, 100, 101, 102]


def test_optimize_purges_position_deletes(spark, tmp_path):
    root = str(tmp_path / "ipd_opt")
    w = IcebergWriter(spark, root)
    w.create(spark.range(0, 12).coalesce(2).select(F.col("id").alias("k")))
    w.delete_where_pos(F.col("k") % 4 == 0)
    want = sorted(k for k in range(12) if k % 4 != 0)
    w.optimize(num_files=1)
    t = IcebergTable(root)
    # clean again: data_entries works (no live delete files)
    entries = t.data_entries(None)
    assert len(entries) == 1
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == want
    # vacuum keeps the historic delete file (time travel) — nothing
    # referenced is removed
    removed = w.vacuum(grace_seconds=0.0)
    assert all("posdel" not in r for r in removed)
    assert sorted(r.k for r in read_iceberg(spark, root).collect()) == want


def test_delete_where_pos_partitioned(spark, tmp_path):
    root = str(tmp_path / "ipd_part")
    w = IcebergWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(10)], "k long, st string"
    )
    w.create(df, partition_by=["st"])
    w.delete_where_pos((F.col("st") == "A") & (F.col("k") < 5))
    got = sorted((r.k, r.st) for r in read_iceberg(spark, root).collect())
    want = sorted(
        (i, "A" if i % 2 else "B")
        for i in range(10)
        if not (i % 2 and i < 5)
    )
    assert got == want
    # purge on the partitioned table too
    w.optimize(num_files=1)
    got2 = sorted((r.k, r.st) for r in read_iceberg(spark, root).collect())
    assert got2 == want
