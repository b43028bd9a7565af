"""Regression tests for the round-5 ADVICE.md findings:

1. (high) delete_where must RETAIN rows whose predicate evaluates to
   NULL — Delta DELETE semantics — in both DeltaLogWriter and
   PlankTable.
2. (medium) commit publication is atomic: a version/metadata file,
   once visible, is always complete (published via os.link of a
   fully-written temp file).
3. (medium) txn idempotence survives concurrent replays of the same
   micro-batch — the duplicate guard is re-checked after a commit
   conflict.
4. (low) Delta checkpoints carry txn actions, so exactly-once dedup
   survives cleanup of pre-checkpoint JSON commits.
5. (low) _zvalue never overflows a long: bits shrink with column
   count, and wide-span columns rank via double math.
"""

from __future__ import annotations

import glob
import json
import os
import threading

from pyspark.sql import Row
from pyspark.sql import functions as F

from plankton_spark.sources.delta_log import (
    DeltaLog,
    DeltaLogWriter,
    read_delta,
    write_delta_checkpoint,
)
from plankton_spark.table_format import PlankTable


def _docs(spark, rows):
    return spark.createDataFrame(rows)


# -- 1. NULL-evaluating predicate rows are retained ---------------------


def test_delta_delete_retains_null_predicate_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    w = DeltaLogWriter(spark, t)
    w.create(
        _docs(
            spark,
            [
                Row(id=1, score=10),
                Row(id=2, score=None),  # predicate → NULL: must survive
                Row(id=3, score=99),
            ],
        )
    )
    w.delete_where(F.col("score") > 50)
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [1, 2], f"NULL-predicate row was dropped: {got}"


def test_planktable_delete_retains_null_predicate_rows(spark, tmp_path):
    t = str(tmp_path / "pt")
    pt = PlankTable(spark, t)
    pt.create(
        _docs(
            spark,
            [
                Row(id=1, score=10),
                Row(id=2, score=None),
                Row(id=3, score=99),
            ],
        )
    )
    pt.delete_where(F.col("score") > 50)
    got = sorted(r.id for r in pt.read().collect())
    assert got == [1, 2], f"NULL-predicate row was dropped: {got}"


# -- 2. atomic commit publication --------------------------------------


def test_delta_commit_files_never_partial(spark, tmp_path):
    """Every visible commit file parses fully as JSON lines (no empty
    or truncated publications), and no temp residue remains."""
    t = str(tmp_path / "tbl")
    w = DeltaLogWriter(spark, t)
    w.create(_docs(spark, [Row(id=1)]))
    for i in range(3):
        w.append(_docs(spark, [Row(id=10 + i)]))
    log_dir = os.path.join(t, "_delta_log")
    commits = [f for f in os.listdir(log_dir) if f.endswith(".json")]
    assert len(commits) == 4
    for f in commits:
        with open(os.path.join(log_dir, f)) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln.strip()]
        assert lines, f"empty commit file {f}"
        for ln in lines:
            json.loads(ln)
    assert not glob.glob(os.path.join(log_dir, "*.tmp-*"))


def test_iceberg_metadata_never_partial(spark, tmp_path):
    from plankton_spark.sources.iceberg_meta import IcebergWriter

    t = str(tmp_path / "ice")
    w = IcebergWriter(spark, t)
    w.create(_docs(spark, [Row(id=1, v="a")]))
    w.append(_docs(spark, [Row(id=2, v="b")]))
    meta = os.path.join(t, "metadata")
    for f in os.listdir(meta):
        if f.endswith(".metadata.json"):
            with open(os.path.join(meta, f)) as fh:
                json.load(fh)
    assert not glob.glob(os.path.join(meta, "*.tmp-*"))


# -- 3. concurrent same-batch replays stay exactly-once -----------------


def test_delta_txn_concurrent_replays_exactly_once(spark, tmp_path):
    """Two writers replaying the SAME (appId, version) micro-batch race
    on the version file; exactly one batch's rows may land. Mirrors
    test_table_format.py's OCC race tests."""
    t = str(tmp_path / "tbl")
    DeltaLogWriter(spark, t).create(_docs(spark, [Row(id=0)]))
    batch = _docs(spark, [Row(id=777)])
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def replay():
        try:
            w = DeltaLogWriter(spark, t)
            barrier.wait()
            w.append(batch, txn=("job-x", 5))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=replay) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    rows = read_delta(spark, t).where(F.col("id") == 777).count()
    assert rows == 1, f"micro-batch applied {rows} times (want exactly 1)"
    assert DeltaLogWriter(spark, t).last_txn_version("job-x") == 5


# -- 4. checkpoints are txn-self-contained ------------------------------


def test_delta_checkpoint_carries_txn_actions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    w = DeltaLogWriter(spark, t)
    w.create(_docs(spark, [Row(id=0)]))
    w.append(_docs(spark, [Row(id=1)]), txn=("app-a", 3))
    w.append(_docs(spark, [Row(id=2)]), txn=("app-b", 9))
    v = DeltaLog(t).latest_version()
    write_delta_checkpoint(t, version=v)
    # simulate log cleanup: delete every JSON commit ≤ checkpoint
    log_dir = os.path.join(t, "_delta_log")
    for f in os.listdir(log_dir):
        stem, ext = os.path.splitext(f)
        if ext == ".json" and stem.isdigit() and int(stem) <= v:
            os.remove(os.path.join(log_dir, f))
    # txn dedup must still work from the checkpoint alone
    assert w.last_txn_version("app-a") == 3
    assert w.last_txn_version("app-b") == 9
    assert w.append(_docs(spark, [Row(id=99)]), txn=("app-b", 9)) is None
    assert read_delta(spark, t).count() == 3  # replay was dropped


# -- 5. z-value overflow guards -----------------------------------------


def test_zvalue_many_columns_and_wide_spans_fit_long(spark, tmp_path):
    t = str(tmp_path / "pt")
    pt = PlankTable(spark, t)
    wide = 1 << 50  # spans > 2^42 used to overflow the long rank math
    df = spark.createDataFrame(
        [
            Row(a=i, b=i * 7 % 100, c=i * 13 % 100, d=i * wide)
            for i in range(100)
        ]
    )
    pt.create(df)
    pt.optimize(zorder_by=["a", "b", "c", "d"], num_files=4)
    # content unchanged and, with 4 cols, bits shrink to 15 → 60 < 63:
    # max z must be non-negative (a wrapped long would go negative)
    zcol = pt._zvalue(pt.read(), ["a", "b", "c", "d"])
    mn, mx = pt.read().select(
        F.min(zcol).alias("mn"), F.max(zcol).alias("mx")
    ).first()
    assert mn >= 0 and mx >= 0
    assert pt.read().count() == 100
    assert sorted(r.a for r in pt.read().collect()) == list(range(100))


def test_iceberg_partition_spec_falls_back_to_partition_specs(tmp_path):
    """ADVICE r6 #2 regression pin: v2 metadata carrying ONLY
    'partition-specs' + 'default-spec-id' (no legacy top-level
    'partition-spec') must resolve the default spec — treating it as
    spec-less would stage unpartitioned files into a partitioned
    external table. Also pins the loud error for a dangling
    default-spec-id."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from plankton_spark.sources.iceberg_meta import IcebergTable

    root = str(tmp_path / "ice_specs_only")
    _os.makedirs(_os.path.join(root, "metadata"))
    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "grp", "required": False, "type": "string"},
    ]
    md = {
        "format-version": 2,
        "table-uuid": "specs-only",
        "location": root,
        "last-updated-ms": 1,
        "last-column-id": 2,
        "schema": {"type": "struct", "schema-id": 0, "fields": fields},
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "current-schema-id": 0,
        # NO legacy "partition-spec" key — v2-style metadata
        "partition-specs": [
            {
                "spec-id": 7,
                "fields": [
                    {
                        "name": "grp",
                        "transform": "identity",
                        "source-id": 2,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "default-spec-id": 7,
        "current-snapshot-id": -1,
        "snapshots": [],
    }
    with open(_os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        _json.dump(md, f)
    with open(_os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    t = IcebergTable(root)
    assert [f["name"] for f in t.partition_spec()] == ["grp"]
    assert t.partition_fields() == ["grp"]
    # dangling default-spec-id errors loudly instead of staging
    # spec-less
    md["default-spec-id"] = 99
    with open(_os.path.join(root, "metadata", "v2.metadata.json"), "w") as f:
        _json.dump(md, f)
    with open(_os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("2")
    with _pytest.raises(ValueError, match="default-spec-id 99"):
        IcebergTable(root).partition_spec()


def test_assemble_table_root_terminates_without_data_segment(spark, tmp_path):
    """ADVICE r6 #3 regression pin: _assemble_iceberg's table_root
    discovery walks parent dirs looking for a 'data' segment; a layout
    WITHOUT one must terminate (the loop stops when dirname stops
    shrinking) and still assemble the partition column."""
    import os as _os

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from pyspark.sql import types as T

    from plankton_spark.sources.iceberg_meta import _assemble_iceberg

    root = str(tmp_path / "nodata" / "files")
    _os.makedirs(root)
    p = _os.path.join(root, "f0.parquet")
    _pq.write_table(_pa.table({"k": _pa.array([1, 2], _pa.int64())}), p)
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("grp", T.StringType())]
    )
    df = _assemble_iceberg(spark, schema, ["grp"], [(p, {"grp": "a"})])
    rows = sorted((r.k, r.grp) for r in df.collect())
    assert rows == [(1, "a"), (2, "a")]
