"""Delta `typeWidening` reader feature: a widening commit rewrites
only the schemaString (old files keep their narrow physical types);
reads scan everything under the CURRENT schema, and Spark's parquet
schema reconciliation performs every widening the feature's spec
allows. Out-of-spec recorded changes (narrowings) refuse up front.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from plankton_spark.sources.delta_log import (
    DeltaProtocolError,
    _widening_ok,
    read_delta,
)


def _schema_string(fields):
    return json.dumps({"type": "struct", "fields": fields})


def _field(name, typ, type_changes=None):
    md = {}
    if type_changes:
        md["delta.typeChanges"] = type_changes
    return {"name": name, "type": typ, "nullable": True, "metadata": md}


def _author_widened_table(tmp_path, name, *, bad_change=False):
    """v0: int k / float v (narrow file). v1: widening commit — schema
    becomes long k / double v with delta.typeChanges recorded, plus a
    wide-typed file."""
    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int32()),
                "v": pa.array([1.5, 2.5, 3.5], pa.float32()),
            }
        ),
        os.path.join(root, "narrow.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([10], pa.int64()),
                "v": pa.array([10.5], pa.float64()),
            }
        ),
        os.path.join(root, "wide.parquet"),
    )

    def add(p):
        return {
            "add": {
                "path": p,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, p)),
                "modificationTime": 1,
                "dataChange": True,
            }
        }

    protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["typeWidening"],
        "writerFeatures": ["typeWidening"],
    }
    v0_schema = _schema_string(
        [_field("k", "integer"), _field("v", "float")]
    )
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": protocol}) + "\n")
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": name,
                        "schemaString": v0_schema,
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
        fh.write(json.dumps(add("narrow.parquet")) + "\n")
    changes_k = [{"fromType": "integer", "toType": "long"}]
    changes_v = [{"fromType": "float", "toType": "double"}]
    if bad_change:
        changes_k = [{"fromType": "long", "toType": "integer"}]
    v1_schema = _schema_string(
        [
            _field("k", "long", changes_k),
            _field("v", "double", changes_v),
        ]
    )
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": name,
                        "schemaString": v1_schema,
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
        fh.write(json.dumps(add("wide.parquet")) + "\n")
    return root


def test_widened_table_reads_both_generations(spark, tmp_path):
    root = _author_widened_table(tmp_path, "tw_ok")
    df = read_delta(spark, root)
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}
    got = sorted((r.k, r.v) for r in df.collect())
    assert got == [(1, 1.5), (2, 2.5), (3, 3.5), (10, 10.5)]


def test_time_travel_reads_narrow_schema(spark, tmp_path):
    root = _author_widened_table(tmp_path, "tw_tt")
    df = read_delta(spark, root, version=0)
    assert dict(df.dtypes) == {"k": "int", "v": "float"}
    assert sorted(r.k for r in df.collect()) == [1, 2, 3]


def test_out_of_spec_change_refuses(spark, tmp_path):
    root = _author_widened_table(tmp_path, "tw_bad", bad_change=True)
    with pytest.raises(DeltaProtocolError, match="not an allowed"):
        read_delta(spark, root).count()


def test_widening_matrix():
    ok = [
        ("byte", "short"), ("byte", "integer"), ("short", "long"),
        ("integer", "long"), ("integer", "double"), ("float", "double"),
        ("date", "timestampNtz"), ("integer", "decimal(10,0)"),
        ("long", "decimal(20,0)"), ("decimal(5,2)", "decimal(10,2)"),
        ("decimal(5,2)", "decimal(10,4)"),
    ]
    bad = [
        ("long", "integer"), ("double", "float"), ("integer", "short"),
        ("decimal(10,2)", "decimal(5,2)"),
        ("decimal(10,2)", "decimal(10,4)"),  # scale grows, no headroom
        ("string", "long"), ("timestamp", "date"),
    ]
    for f, t in ok:
        assert _widening_ok(f, t), (f, t)
    for f, t in bad:
        assert not _widening_ok(f, t), (f, t)
