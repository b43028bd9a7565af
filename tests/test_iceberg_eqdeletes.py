"""Iceberg format-v2 EQUALITY delete reads (closing the r7 verdict's
top interop gap): delete manifests whose content=2 parquet files hold
key rows are applied by read_iceberg as a null-safe anti-join on the
equality_ids columns, honoring sequence numbers — a delete applies
only to data files with STRICTLY SMALLER data sequence numbers, so a
row re-inserted after the delete survives (the Flink upsert pattern).
Whole-file access paths (scan_entries → data_entries, DSv2, writer
rewrites, streaming) still refuse equality-deleted snapshots.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from plankton_spark.sources.avro_ocf import write_ocf_generic
from plankton_spark.sources.iceberg_meta import IcebergTable, read_iceberg

_LIST_SCHEMA_V2SEQ = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_ENTRY_SCHEMA_V2SEQ = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                ],
            },
        },
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


def _author_eq_table(tmp_path, name, *, entry_seq=True):
    """Foreign-written v2 table with sequence numbers:

    - seq 1: data file d0 (k=0..9, grp='old')
    - seq 2: EQUALITY delete on k ∈ {1, 3, 5, None-free} (ids=[1])
    - seq 3: data file d1 (k=3,5,100, grp='new')  ← re-insert after
      the delete; must SURVIVE (delete seq 2 is not > data seq 3)

    With entry_seq=False the per-entry sequence_number is null and
    must inherit from the manifest-list entry (spec inheritance).
    Expected live keys: 0,2,4,6,7,8,9 (from d0) + 3,5,100 (from d1).
    """
    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    pq.write_table(
        pa.table(
            {
                "k": pa.array(list(range(10)), pa.int64()),
                "grp": pa.array(["old"] * 10),
            }
        ),
        os.path.join(root, "data", "d0.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([3, 5, 100], pa.int64()),
                "grp": pa.array(["new"] * 3),
            }
        ),
        os.path.join(root, "data", "d1.parquet"),
    )
    pq.write_table(
        pa.table({"k": pa.array([1, 3, 5], pa.int64())}),
        os.path.join(root, "data", "eqdel0.parquet"),
    )

    def df_dict(content, path, nrec, eq_ids=None):
        return {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": nrec,
            "file_size_in_bytes": 1,
            "equality_ids": eq_ids,
        }

    manifests = []
    for mname, seq, content, dfd in [
        ("m-d0.avro", 1, 0, df_dict(0, "data/d0.parquet", 10)),
        ("m-eq.avro", 2, 1, df_dict(2, "data/eqdel0.parquet", 3, [1])),
        ("m-d1.avro", 3, 0, df_dict(0, "data/d1.parquet", 3)),
    ]:
        mp = os.path.join(root, "metadata", mname)
        write_ocf_generic(
            mp,
            _ENTRY_SCHEMA_V2SEQ,
            [
                {
                    "status": 1,
                    "snapshot_id": 1,
                    "sequence_number": seq if entry_seq else None,
                    "data_file": dfd,
                }
            ],
        )
        manifests.append(
            {
                "manifest_path": f"metadata/{mname}",
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": seq,
                "added_snapshot_id": 1,
            }
        )
    ml = os.path.join(root, "metadata", "snap-1.avro")
    write_ocf_generic(ml, _LIST_SCHEMA_V2SEQ, manifests)
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
    return root


_EXPECT = sorted([0, 2, 4, 6, 7, 8, 9] + [3, 5, 100])


def test_equality_deletes_applied_with_sequence_ordering(spark, tmp_path):
    root = _author_eq_table(tmp_path, "eq1")
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == _EXPECT  # 3 and 5 from the NEWER file survive


def test_sequence_number_inheritance_from_manifest(spark, tmp_path):
    """Null per-entry sequence numbers inherit the manifest's (spec
    inheritance rule) — same answer as explicit entry seqs."""
    root = _author_eq_table(tmp_path, "eq_inherit", entry_seq=False)
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == _EXPECT


def test_equality_delete_null_matches_null(spark, tmp_path):
    """Spec: equality matching treats null as equal to null."""
    root = _author_eq_table(tmp_path, "eq_null")
    # rewrite the delete + d0 to carry a NULL key each
    pq.write_table(
        pa.table(
            {
                "k": pa.array([0, None, 7], pa.int64()),
                "grp": pa.array(["old"] * 3),
            }
        ),
        os.path.join(root, "data", "d0.parquet"),
    )
    pq.write_table(
        pa.table({"k": pa.array([None], pa.int64())}),
        os.path.join(root, "data", "eqdel0.parquet"),
    )
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [0, 3, 5, 7, 100]  # the NULL-k row in d0 is deleted


def test_multi_column_equality_ids(spark, tmp_path):
    """Composite key (k, grp): only the exact pair is deleted."""
    root = _author_eq_table(tmp_path, "eq_multi")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([3], pa.int64()),
                "grp": pa.array(["old"]),
            }
        ),
        os.path.join(root, "data", "eqdel0.parquet"),
    )
    # repoint the delete manifest at ids [1, 2]
    mp = os.path.join(root, "metadata", "m-eq.avro")
    write_ocf_generic(
        mp,
        _ENTRY_SCHEMA_V2SEQ,
        [
            {
                "status": 1,
                "snapshot_id": 1,
                "sequence_number": 2,
                "data_file": {
                    "content": 2,
                    "file_path": "data/eqdel0.parquet",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 1,
                    "file_size_in_bytes": 1,
                    "equality_ids": [1, 2],
                },
            }
        ],
    )
    df = read_iceberg(spark, root)
    rows = sorted((r.k, r.grp) for r in df.collect())
    assert (3, "old") not in rows
    assert (3, "new") in rows  # newer file's (3,'new') untouched
    assert (5, "old") in rows  # k alone is not the key


def test_whole_file_paths_refuse_eq_deleted_snapshots(spark, tmp_path):
    root = _author_eq_table(tmp_path, "eq_refuse")
    t = IcebergTable(root)
    with pytest.raises(ValueError, match="equality delete"):
        t.data_entries(None)
    with pytest.raises(ValueError, match="equality delete"):
        t.scan_entries(None)


def test_eq_delete_without_ids_refuses(spark, tmp_path):
    root = _author_eq_table(tmp_path, "eq_noids")
    mp = os.path.join(root, "metadata", "m-eq.avro")
    write_ocf_generic(
        mp,
        _ENTRY_SCHEMA_V2SEQ,
        [
            {
                "status": 1,
                "snapshot_id": 1,
                "sequence_number": 2,
                "data_file": {
                    "content": 2,
                    "file_path": "data/eqdel0.parquet",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 3,
                    "file_size_in_bytes": 1,
                    "equality_ids": None,
                },
            }
        ],
    )
    with pytest.raises(ValueError, match="equality_ids"):
        read_iceberg(spark, root).count()


def test_eq_deletes_compose_with_position_deletes(spark, tmp_path):
    """A snapshot carrying BOTH delete kinds applies both: position
    deletes by exact (file, pos) identity, equality deletes by keyed
    anti-join with sequence ordering."""
    root = _author_eq_table(tmp_path, "eq_plus_pos")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(["data/d0.parquet"]),
                "pos": pa.array([0], pa.int64()),
            }
        ),
        os.path.join(root, "data", "posdel0.parquet"),
    )
    mp = os.path.join(root, "metadata", "m-pos.avro")
    write_ocf_generic(
        mp,
        _ENTRY_SCHEMA_V2SEQ,
        [
            {
                "status": 1,
                "snapshot_id": 1,
                "sequence_number": 2,
                "data_file": {
                    "content": 1,
                    "file_path": "data/posdel0.parquet",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 1,
                    "file_size_in_bytes": 1,
                    "equality_ids": None,
                },
            }
        ],
    )
    ml = os.path.join(root, "metadata", "snap-1.avro")
    manifests = [
        {
            "manifest_path": f"metadata/{m}",
            "manifest_length": os.path.getsize(
                os.path.join(root, "metadata", m)
            ),
            "partition_spec_id": 0,
            "content": c,
            "sequence_number": s,
            "added_snapshot_id": 1,
        }
        for m, c, s in [
            ("m-d0.avro", 0, 1),
            ("m-eq.avro", 1, 2),
            ("m-pos.avro", 1, 2),
            ("m-d1.avro", 0, 3),
        ]
    ]
    write_ocf_generic(ml, _LIST_SCHEMA_V2SEQ, manifests)
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    # pos delete removes d0 row 0 (k=0) on top of eq deletes
    assert got == [x for x in _EXPECT if x != 0]


# ---- writer side: delete_where_eq -----------------------------------


def _mk_table(spark, tmp_path, name):
    from plankton_spark.sources.iceberg_meta import IcebergWriter

    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(k, "old") for k in range(10)], "k long, grp string"
    )
    w = IcebergWriter(spark, root)
    w.create(df)
    return root, w


def test_delete_where_eq_removes_matching_rows(spark, tmp_path):
    root, w = _mk_table(spark, tmp_path, "weq1")
    keys = spark.createDataFrame([(1,), (3,), (5,)], "k long")
    assert w.delete_where_eq(keys) is not None
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [0, 2, 4, 6, 7, 8, 9]
    # no data file was rewritten: O(delete keys), not O(data bytes)
    import glob

    data = glob.glob(os.path.join(root, "data", "*.parquet"))
    assert any("eqdel-" in p for p in data)


def test_append_after_eq_delete_reinserts_keys(spark, tmp_path):
    """The sequencing contract: rows appended AFTER the delete keep
    their keys (new manifests get a larger data sequence number)."""
    root, w = _mk_table(spark, tmp_path, "weq2")
    w.delete_where_eq(spark.createDataFrame([(3,), (5,)], "k long"))
    w.append(
        spark.createDataFrame([(3, "new"), (99, "new")], "k long, grp string")
    )
    rows = sorted((r.k, r.grp) for r in read_iceberg(spark, root).collect())
    assert (3, "new") in rows and (99, "new") in rows
    assert (3, "old") not in rows and (5, "old") not in rows


def test_second_eq_delete_hits_reinserted_rows(spark, tmp_path):
    """A LATER delete (higher seq) removes the re-inserted key too."""
    root, w = _mk_table(spark, tmp_path, "weq3")
    w.delete_where_eq(spark.createDataFrame([(3,)], "k long"))
    w.append(spark.createDataFrame([(3, "new")], "k long, grp string"))
    w.delete_where_eq(spark.createDataFrame([(3,)], "k long"))
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert 3 not in got
    assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9]


def test_eq_delete_composite_key_and_type_cast(spark, tmp_path):
    """Multi-column keys; key frame types are cast to the table's
    declared types (an int-vs-long mismatch must still match)."""
    root, w = _mk_table(spark, tmp_path, "weq4")
    keys = spark.createDataFrame([(2, "old"), (4, "zzz")], "k int, grp string")
    w.delete_where_eq(keys)
    got = sorted(r.k for r in read_iceberg(spark, root).collect())
    assert got == [0, 1, 3, 4, 5, 6, 7, 8, 9]  # (4,'zzz') matched nothing


def test_eq_delete_unknown_column_refuses(spark, tmp_path):
    root, w = _mk_table(spark, tmp_path, "weq5")
    with pytest.raises(ValueError, match="not\\b.*in the table schema"):
        w.delete_where_eq(spark.createDataFrame([(1,)], "nope long"))


def test_rewrite_ops_refuse_eq_deleted_tables(spark, tmp_path):
    root, w = _mk_table(spark, tmp_path, "weq6")
    w.delete_where_eq(spark.createDataFrame([(1,)], "k long"))
    with pytest.raises(ValueError, match="equality delete"):
        w.delete_where(F.col("k") == 2)
    with pytest.raises(ValueError, match="equality delete"):
        w.optimize()


def test_eq_delete_empty_keys_is_noop(spark, tmp_path):
    root, w = _mk_table(spark, tmp_path, "weq7")
    before = IcebergTable(root).metadata_version
    assert w.delete_where_eq(
        spark.createDataFrame([], "k long")
    ) is None
    assert IcebergTable(root).metadata_version == before
