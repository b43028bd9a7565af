"""Delta V2 checkpoint reads (r7 verdict #7): checkpoints named
`<v>.checkpoint.<uniqueId>.parquet|json` whose file actions may live
in `_delta_log/_sidecars/` parquet files. A foreign table whose
protocol lists the v2Checkpoint reader feature now opens (the gate
previously refused it), and replay from a hand-authored v2 checkpoint
— sidecar-resident adds, inline adds, and the JSON variant — must
reproduce exactly the state the JSON log described before cleanup.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from plankton_spark.sources.delta_log import (
    DeltaLog,
    DeltaProtocolError,
    read_delta,
)

_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "s", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)

_ADD_STRUCT = pa.struct(
    [
        pa.field("path", pa.string()),
        pa.field("partitionValues", pa.map_(pa.string(), pa.string())),
        pa.field("size", pa.int64()),
        pa.field("modificationTime", pa.int64()),
        pa.field("dataChange", pa.bool_()),
    ]
)


def _write_data(root, name, ks):
    pq.write_table(
        pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "s": pa.array([f"s{k}" for k in ks]),
            }
        ),
        os.path.join(root, name),
    )


def _add(path, root):
    return {
        "path": path,
        "partitionValues": [],
        "size": os.path.getsize(os.path.join(root, path)),
        "modificationTime": 1,
        "dataChange": True,
    }


def _author_v2cp_table(tmp_path, name, *, layout="sidecar", json_cp=False):
    """v2-checkpointed table at version 1 with NO JSON commits left
    (fully compacted): two data files, adds in a sidecar / inline,
    protocol demanding the v2Checkpoint reader feature."""
    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    _write_data(root, "f0.parquet", [1, 2, 3])
    _write_data(root, "f1.parquet", [10, 11])
    adds = [_add("f0.parquet", root), _add("f1.parquet", root)]
    protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    meta = {
        "id": name,
        "schemaString": _SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": [],
    }
    uid = uuid.uuid4().hex
    sidecar_rows = []
    inline_adds = []
    if layout == "sidecar":
        os.makedirs(os.path.join(log, "_sidecars"))
        side = f"{uid}-0.parquet"
        pq.write_table(
            pa.Table.from_pylist(
                [{"add": a} for a in adds],
                schema=pa.schema([pa.field("add", _ADD_STRUCT)]),
            ),
            os.path.join(log, "_sidecars", side),
        )
        sidecar_rows = [
            {
                "sidecar": {
                    "path": side,
                    "sizeInBytes": os.path.getsize(
                        os.path.join(log, "_sidecars", side)
                    ),
                    "modificationTime": 1,
                }
            }
        ]
    else:
        inline_adds = [{"add": a} for a in adds]
    cp_rows = (
        [{"checkpointMetadata": {"version": 1}}]
        + [{"protocol": protocol}, {"metaData": meta}]
        + sidecar_rows
        + inline_adds
    )
    if json_cp:
        cp_name = f"{1:020d}.checkpoint.{uid}.json"
        with open(os.path.join(log, cp_name), "w") as fh:
            for r in cp_rows:
                fh.write(json.dumps(r) + "\n")
    else:
        cp_name = f"{1:020d}.checkpoint.{uid}.parquet"
        fields = [
            pa.field(
                "checkpointMetadata",
                pa.struct([pa.field("version", pa.int64())]),
            ),
            pa.field(
                "protocol",
                pa.struct(
                    [
                        pa.field("minReaderVersion", pa.int32()),
                        pa.field("minWriterVersion", pa.int32()),
                        pa.field("readerFeatures", pa.list_(pa.string())),
                        pa.field("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        pa.field("id", pa.string()),
                        pa.field("schemaString", pa.string()),
                        pa.field("partitionColumns", pa.list_(pa.string())),
                        pa.field(
                            "configuration", pa.map_(pa.string(), pa.string())
                        ),
                    ]
                ),
            ),
            pa.field(
                "sidecar",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field("sizeInBytes", pa.int64()),
                        pa.field("modificationTime", pa.int64()),
                    ]
                ),
            ),
            pa.field("add", _ADD_STRUCT),
        ]
        pq.write_table(
            pa.Table.from_pylist(cp_rows, schema=pa.schema(fields)),
            os.path.join(log, cp_name),
        )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "sizeInBytes": 1}, fh)
    return root


_EXPECT = [1, 2, 3, 10, 11]


def test_v2_checkpoint_with_sidecars_replays(spark, tmp_path):
    root = _author_v2cp_table(tmp_path, "v2cp_side")
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == _EXPECT


def test_v2_checkpoint_inline_actions_replays(spark, tmp_path):
    root = _author_v2cp_table(tmp_path, "v2cp_inline", layout="inline")
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == _EXPECT


def test_v2_checkpoint_json_variant_replays(spark, tmp_path):
    root = _author_v2cp_table(tmp_path, "v2cp_json", json_cp=True)
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == _EXPECT


def test_v2_checkpoint_matches_json_log_state(spark, tmp_path):
    """The verdict's 'done' bar: a v2 checkpoint replayed to the SAME
    state as the JSON log it compacted — author both, compare."""
    root = _author_v2cp_table(tmp_path, "v2cp_equiv")
    # reconstruct the JSON log the checkpoint stands for
    log = os.path.join(root, "_delta_log")
    protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": protocol}) + "\n")
        fh.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "v2cp_equiv",
                        "schemaString": _SCHEMA_STRING,
                        "partitionColumns": [],
                        "configuration": {},
                    }
                }
            )
            + "\n"
        )
        fh.write(json.dumps({"add": {**_add("f0.parquet", root),
                                     "partitionValues": {}}}) + "\n")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": {**_add("f1.parquet", root),
                                     "partitionValues": {}}}) + "\n")
    from_json = sorted(
        r.k for r in read_delta(spark, root, version=1).collect()
    )
    # drop the JSON commits — replay must now come from the v2 cp
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    from_cp = sorted(r.k for r in read_delta(spark, root).collect())
    assert from_cp == from_json == _EXPECT


def test_v2_checkpoint_plus_json_tail(spark, tmp_path):
    """Commits AFTER the v2 checkpoint replay on top of it."""
    root = _author_v2cp_table(tmp_path, "v2cp_tail")
    _write_data(root, "f2.parquet", [100])
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"add": {**_add("f2.parquet", root), "partitionValues": {}}}
            )
            + "\n"
        )
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == _EXPECT + [100]


def test_missing_sidecar_refuses(spark, tmp_path):
    root = _author_v2cp_table(tmp_path, "v2cp_miss")
    log = os.path.join(root, "_delta_log")
    side = os.listdir(os.path.join(log, "_sidecars"))[0]
    os.remove(os.path.join(log, "_sidecars", side))
    with pytest.raises(FileNotFoundError, match="sidecar"):
        read_delta(spark, root).count()


def test_unknown_reader_feature_still_refuses(spark, tmp_path):
    root = _author_v2cp_table(tmp_path, "v2cp_unknown", layout="inline")
    # rewrite the checkpoint's protocol with an unimplemented feature
    log = os.path.join(root, "_delta_log")
    cp = next(f for f in os.listdir(log) if ".checkpoint." in f)
    t = pq.read_table(os.path.join(log, cp)).to_pylist()
    for row in t:
        if row.get("protocol"):
            row["protocol"]["readerFeatures"] = ["v2Checkpoint", "futureThing"]
    # easiest rewrite: JSON variant under a fresh uuid, remove parquet
    os.remove(os.path.join(log, cp))
    with open(
        os.path.join(log, f"{1:020d}.checkpoint.{uuid.uuid4().hex}.json"),
        "w",
    ) as fh:
        for row in t:
            fh.write(
                json.dumps({k: v for k, v in row.items() if v is not None})
                + "\n"
            )
    with pytest.raises(DeltaProtocolError, match="futureThing"):
        read_delta(spark, root).count()


def test_vacuum_honors_sidecar_references(spark, tmp_path):
    """Files referenced only through a v2 checkpoint's sidecars must
    survive vacuum (the shared decoder feeds the referenced set)."""
    from plankton_spark.sources.delta_log import DeltaLogWriter

    root = _author_v2cp_table(tmp_path, "v2cp_vacuum")
    # an orphan data file nothing references
    _write_data(root, "orphan.parquet", [999])
    w = DeltaLogWriter(spark, root)
    removed = w.vacuum(grace_seconds=0)
    assert "orphan.parquet" in removed
    assert sorted(r.k for r in read_delta(spark, root).collect()) == _EXPECT


def _author_multipart_table(tmp_path, name, *, drop_part=None):
    """Classic MULTI-PART checkpoint `<v>.checkpoint.<n>.<m>.parquet`
    at version 1 with no JSON commits: protocol+meta in part 1, one
    add per part. `drop_part` removes that part after authoring
    (simulating an interrupted writer / partial copy)."""
    root = str(tmp_path / name)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    _write_data(root, "f0.parquet", [1, 2, 3])
    _write_data(root, "f1.parquet", [10, 11])
    protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = {
        "id": name,
        "schemaString": _SCHEMA_STRING,
        "partitionColumns": [],
        "configuration": [],
    }
    part_rows = [
        [{"protocol": protocol}, {"metaData": meta},
         {"add": _add("f0.parquet", root)}],
        [{"add": _add("f1.parquet", root)}],
    ]
    fields = [
        pa.field(
            "protocol",
            pa.struct(
                [
                    pa.field("minReaderVersion", pa.int32()),
                    pa.field("minWriterVersion", pa.int32()),
                ]
            ),
        ),
        pa.field(
            "metaData",
            pa.struct(
                [
                    pa.field("id", pa.string()),
                    pa.field("schemaString", pa.string()),
                    pa.field("partitionColumns", pa.list_(pa.string())),
                    pa.field(
                        "configuration", pa.map_(pa.string(), pa.string())
                    ),
                ]
            ),
        ),
        pa.field("add", _ADD_STRUCT),
    ]
    for n, rows in enumerate(part_rows, start=1):
        pq.write_table(
            pa.Table.from_pylist(rows, schema=pa.schema(fields)),
            os.path.join(log, f"{1:020d}.checkpoint.{n}.{2}.parquet"),
        )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "parts": 2}, fh)
    if drop_part is not None:
        os.remove(
            os.path.join(
                log, f"{1:020d}.checkpoint.{drop_part}.{2}.parquet"
            )
        )
    return root


def test_multipart_checkpoint_replays(spark, tmp_path):
    root = _author_multipart_table(tmp_path, "mp_ok")
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == _EXPECT


def test_multipart_checkpoint_incomplete_refuses(spark, tmp_path):
    """A partial multi-part set must refuse loudly, not silently
    drop the missing part's adds (wrong rows)."""
    root = _author_multipart_table(tmp_path, "mp_partial", drop_part=2)
    with pytest.raises(ValueError, match="incomplete"):
        read_delta(spark, root).count()


def test_multipart_incomplete_shadowed_by_classic_reads(spark, tmp_path):
    """An incomplete multi-part set is harmless when a CLASSIC
    checkpoint for the same version shadows it — the usable layout
    wins and no completeness error fires."""
    root = _author_multipart_table(tmp_path, "mp_shadow", drop_part=2)
    log = os.path.join(root, "_delta_log")
    # author the classic single-file checkpoint for the same version
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "mp_shadow",
                "schemaString": _SCHEMA_STRING,
                "partitionColumns": [],
                "configuration": [],
            }
        },
        {"add": _add("f0.parquet", root)},
        {"add": _add("f1.parquet", root)},
    ]
    fields = [
        pa.field(
            "protocol",
            pa.struct(
                [
                    pa.field("minReaderVersion", pa.int32()),
                    pa.field("minWriterVersion", pa.int32()),
                ]
            ),
        ),
        pa.field(
            "metaData",
            pa.struct(
                [
                    pa.field("id", pa.string()),
                    pa.field("schemaString", pa.string()),
                    pa.field("partitionColumns", pa.list_(pa.string())),
                    pa.field(
                        "configuration", pa.map_(pa.string(), pa.string())
                    ),
                ]
            ),
        ),
        pa.field("add", _ADD_STRUCT),
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa.schema(fields)),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == _EXPECT


# ---------------------------------------------------------------------
# WRITE side: our writer emits multipart and v2 layouts our reader
# (and the spec) accept
# ---------------------------------------------------------------------

def _own_table(spark, tmp_path, name):
    from plankton_spark.sources.delta_log import DeltaLogWriter

    root = str(tmp_path / name)
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"))
    w.append(spark.range(10, 15).selectExpr("id AS k", "id * 2 AS v"))
    return root


def _drop_json_commits(root):
    log = os.path.join(root, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and f.split(".")[0].isdigit():
            os.remove(os.path.join(log, f))


def test_write_multipart_checkpoint_roundtrip(spark, tmp_path):
    from plankton_spark.sources.delta_log import write_delta_checkpoint

    root = _own_table(spark, tmp_path, "mp_write")
    before = sorted(r.k for r in read_delta(spark, root).collect())
    write_delta_checkpoint(root, style="multipart", parts=2)
    log = os.path.join(root, "_delta_log")
    mp = [f for f in os.listdir(log) if ".checkpoint." in f]
    assert len(mp) == 2 and all(f.split(".")[3] == f"{2:010d}" for f in mp), mp
    _drop_json_commits(root)
    assert sorted(r.k for r in read_delta(spark, root).collect()) == before


def test_write_v2_checkpoint_requires_protocol_feature(spark, tmp_path):
    from plankton_spark.sources.delta_log import write_delta_checkpoint

    root = _own_table(spark, tmp_path, "v2w_refuse")
    with pytest.raises(ValueError, match="v2Checkpoint"):
        write_delta_checkpoint(root, style="v2")


def test_write_v2_checkpoint_roundtrip(spark, tmp_path):
    """Protocol upgraded by a JSON commit → v2 checkpoint written with
    sidecar-resident adds → JSON commits dropped → same rows back."""
    from plankton_spark.sources.delta_log import (
        DeltaLog,
        write_delta_checkpoint,
    )

    root = _own_table(spark, tmp_path, "v2w_ok")
    log = os.path.join(root, "_delta_log")
    v = DeltaLog(root).latest_version() + 1
    with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint"],
                        "writerFeatures": ["v2Checkpoint"],
                    }
                }
            )
            + "\n"
        )
    before = sorted(r.k for r in read_delta(spark, root).collect())
    out = write_delta_checkpoint(root, style="v2")
    assert ".checkpoint." in os.path.basename(out)
    assert len(os.path.basename(out).split(".")) == 4
    side = os.listdir(os.path.join(log, "_sidecars"))
    assert len(side) == 1, side
    _drop_json_commits(root)
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == before
    # appends after the v2 checkpoint still replay on top
    from plankton_spark.sources.delta_log import DeltaLogWriter

    DeltaLogWriter(spark, root).append(
        spark.range(100, 103).selectExpr("id AS k", "id * 2 AS v")
    )
    got2 = sorted(r.k for r in read_delta(spark, root).collect())
    assert got2 == before + [100, 101, 102]
