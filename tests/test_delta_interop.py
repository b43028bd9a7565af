"""Delta-log interop reader tests (VERDICT r2 #5): author a Delta
table by hand (no delta jar in this environment), then verify log
replay, versionAsOf, partition-value re-attachment, the
`spark.read.format("deltalog")` wrapper, and checkpoint-parquet
handling."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from plankton_spark.io import read_table
from plankton_spark.queries.delta_interop import author_delta_orders
from plankton_spark.sources.delta_log import DeltaLog, read_delta, register
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def delta_root(spark):
    return author_delta_orders(spark, SF0001, name="delta_orders_test")


def _expected(spark, lo, hi, drop_f=False):
    o = read_table(spark, SF0001, "orders").where(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
    )
    if drop_f:
        o = o.where(F.col("o_orderstatus") != "F")
    return o


def test_versioned_reads_match_source(spark, delta_root):
    for v, hi, drop_f in ((0, 1000, False), (1, 2000, False), (2, 2000, True)):
        got = read_delta(spark, delta_root, version=v)
        exp = _expected(spark, 0, hi, drop_f)
        assert got.count() == exp.count(), f"version {v}"
        g = got.agg(F.sum("o_orderkey")).collect()[0][0]
        e = exp.agg(F.sum("o_orderkey")).collect()[0][0]
        assert g == e, f"version {v} key sum"


def test_partition_column_reattached(spark, delta_root):
    got = read_delta(spark, delta_root, version=2)
    statuses = {r[0] for r in got.select("o_orderstatus").distinct().collect()}
    assert "F" not in statuses and statuses, statuses
    # partition col is string-typed per the declared schema
    assert dict(got.dtypes)["o_orderstatus"] == "string"


def test_default_version_is_latest(spark, delta_root):
    assert read_delta(spark, delta_root).count() == read_delta(
        spark, delta_root, version=2
    ).count()


def test_format_deltalog_wrapper(spark, delta_root):
    register(spark)
    df = (
        spark.read.format("deltalog")
        .option("path", delta_root)
        .option("versionAsOf", 1)
        .load()
    )
    exp = _expected(spark, 0, 2000)
    assert df.count() == exp.count()
    assert sorted(df.columns) == ["o_orderkey", "o_orderstatus", "o_totalprice"]
    got_sum = df.agg(F.sum("o_orderkey")).collect()[0][0]
    assert got_sum == exp.agg(F.sum("o_orderkey")).collect()[0][0]


def test_checkpoint_replay(spark, delta_root, tmp_path):
    """A table whose early JSON commits were compacted into a
    checkpoint parquet must replay from the checkpoint."""
    root = str(tmp_path / "ckpt_table")
    shutil.copytree(delta_root, root)
    log = os.path.join(root, "_delta_log")
    # build a v1 checkpoint holding the net state of commits 0..1
    schema, part_cols, files = DeltaLog(root).snapshot(1)
    rows = []
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "metaData" in a:
                md = {
                    k: v
                    for k, v in a["metaData"].items()
                    # empty dicts (configuration/format.options) can't
                    # round-trip pa.Table.from_pylist → parquet; the
                    # reader only needs schemaString + partitionColumns
                    if k in ("id", "schemaString", "partitionColumns")
                }
                rows.append({"metaData": md, "add": None})
    for path, pv in files:
        rel = os.path.relpath(path, root)
        rows.append(
            {"metaData": None, "add": {"path": rel, "partitionValues": pv}}
        )
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    # drop the JSON commits the checkpoint supersedes
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    got = read_delta(spark, root)  # latest = v2 (checkpoint + 2.json)
    exp = _expected(spark, 0, 2000, drop_f=True)
    assert got.count() == exp.count()


def test_missing_log_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        DeltaLog(str(tmp_path / "nope"))


# ---------------------------------------------------------------------
# Write support
# ---------------------------------------------------------------------

from pyspark.sql import functions as _F

from plankton_spark.sources.delta_log import (
    ConcurrentDeltaModification,
    DeltaLogWriter,
)


def test_writer_create_append_roundtrip(spark, tmp_path):
    root = str(tmp_path / "dw")
    w = DeltaLogWriter(spark, root)
    v0 = w.create(spark.range(0, 10).select(_F.col("id").alias("k")))
    v1 = w.append(spark.range(10, 15).select(_F.col("id").alias("k")))
    assert (v0, v1) == (0, 1)
    assert sorted(r.k for r in read_delta(spark, root).collect()) == list(range(15))
    assert sorted(r.k for r in read_delta(spark, root, version=0).collect()) == list(
        range(10)
    )
    with pytest.raises(FileExistsError):
        w.create(spark.range(1).select(_F.col("id").alias("k")))


def test_writer_txn_idempotent_append(spark, tmp_path):
    root = str(tmp_path / "dw_txn")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(3).select(_F.col("id").alias("k")))
    b = spark.range(10, 13).select(_F.col("id").alias("k"))
    assert w.append(b, txn=("jobA", 0)) is not None
    # replayed micro-batch: dropped
    assert w.append(b, txn=("jobA", 0)) is None
    assert w.append(b, txn=("jobA", 1)) is not None
    assert read_delta(spark, root).count() == 9
    assert w.last_txn_version("jobA") == 1
    assert w.last_txn_version("jobB") is None


def test_writer_delete_rewrites_only_hit_files(spark, tmp_path):
    root = str(tmp_path / "dw_del")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 10).coalesce(1).select(_F.col("id").alias("k")))
    w.append(spark.range(100, 110).coalesce(1).select(_F.col("id").alias("k")))
    from plankton_spark.sources.delta_log import DeltaLog

    before = {p for p, _ in DeltaLog(root).snapshot(None)[2]}
    w.delete_where(_F.col("k") == 105)
    after = {p for p, _ in DeltaLog(root).snapshot(None)[2]}
    assert len(before & after) == 1  # low file untouched
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == list(range(10)) + [100, 101, 102, 103, 104, 106, 107, 108, 109]


def test_writer_foreachbatch_exactly_once(spark, tmp_path):
    """The txn-guarded append is the Delta exactly-once sink contract:
    replays of a committed (appId, batchId) must be no-ops."""
    root = str(tmp_path / "dw_stream")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 1).select(_F.col("id").alias("k")))

    def sink(batch_df, batch_id):
        DeltaLogWriter(spark, root).append(batch_df, txn=("stream1", batch_id))

    b0 = spark.range(10, 12).select(_F.col("id").alias("k"))
    sink(b0, 0)
    sink(b0, 0)  # crash-replay of the same micro-batch
    sink(spark.range(20, 21).select(_F.col("id").alias("k")), 1)
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [0, 10, 11, 20]


def test_delta_streaming_source(spark, tmp_path):
    """spark.readStream.format("deltalog"): commits stream as
    micro-batches from a checkpointed {"version": N} offset; a
    rewrite commit raises without ignoreChanges."""
    root = str(tmp_path / "dstream")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 3).select(_F.col("id").alias("k")))
    w.append(spark.range(10, 13).select(_F.col("id").alias("k")))
    register(spark)
    seen: dict[int, list[int]] = {}

    def grab(bdf, bid):
        seen.setdefault(bid, []).extend(r.k for r in bdf.collect())

    ckpt = str(tmp_path / "dstream_ckpt")

    def run_once():
        q = (
            spark.readStream.format("deltalog")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(grab)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(v for vs in seen.values() for v in vs) == [0, 1, 2, 10, 11, 12]
    # incremental restart: only the new commit streams
    seen.clear()
    w.append(spark.range(100, 102).select(_F.col("id").alias("k")))
    run_once()
    assert sorted(v for vs in seen.values() for v in vs) == [100, 101]
    # a delete (rewrite) must refuse to stream without ignoreChanges
    w.delete_where(_F.col("k") == 0)
    with pytest.raises(Exception):
        run_once()


def test_write_delta_checkpoint_roundtrip(spark, tmp_path):
    """Engine-written checkpoint parquet + _last_checkpoint: replay
    from the checkpoint (JSON commits it supersedes deleted) must
    reproduce the snapshot, including partitioned tables whose
    partitionValues ride the checkpoint's map column."""
    from plankton_spark.sources.delta_log import write_delta_checkpoint

    root = str(tmp_path / "cp_w")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 10).select(_F.col("id").alias("k")))
    w.append(spark.range(10, 15).select(_F.col("id").alias("k")))
    w.append(spark.range(15, 18).select(_F.col("id").alias("k")))
    out = write_delta_checkpoint(root, version=1)
    assert os.path.exists(out)
    # drop the superseded JSON commits — replay must come from parquet
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    got = sorted(r.k for r in read_delta(spark, root).collect())
    assert got == list(range(18))
    # version pinned at the checkpoint exactly
    got1 = sorted(r.k for r in read_delta(spark, root, version=1).collect())
    assert got1 == list(range(15))


def test_checkpoint_on_partitioned_table(spark, delta_root, tmp_path):
    """Checkpoint a hand-authored PARTITIONED delta table: the
    partitionValues map must survive the parquet roundtrip."""
    from plankton_spark.sources.delta_log import write_delta_checkpoint

    root = str(tmp_path / "cp_part")
    shutil.copytree(delta_root, root)
    write_delta_checkpoint(root, version=2)
    for v in (0, 1, 2):
        os.remove(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    got = read_delta(spark, root)
    exp = _expected(spark, 0, 2000, drop_f=True)
    assert got.count() == exp.count()
    statuses = {r[0] for r in got.select("o_orderstatus").distinct().collect()}
    assert statuses and "F" not in statuses


def test_writer_auto_checkpoints_every_k_commits(spark, tmp_path):
    from plankton_spark.sources.delta_log import DELTA_CHECKPOINT_EVERY

    root = str(tmp_path / "cp_auto")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(1).select(_F.col("id").alias("k")))
    for i in range(1, DELTA_CHECKPOINT_EVERY + 2):
        w.append(spark.range(i * 10, i * 10 + 1).select(_F.col("id").alias("k")))
    cp = os.path.join(
        root, "_delta_log", f"{DELTA_CHECKPOINT_EVERY:020d}.checkpoint.parquet"
    )
    assert os.path.exists(cp)
    assert os.path.exists(os.path.join(root, "_delta_log", "_last_checkpoint"))
    assert read_delta(spark, root).count() == DELTA_CHECKPOINT_EVERY + 2


# -- OPTIMIZE + schema evolution (round 6) ----------------------------


def test_writer_optimize_compacts_preserving_content(spark, tmp_path):
    """Mirrors test_table_format.py optimize: many small files in, one
    file out, content unchanged, old versions still time-travel."""
    t = str(tmp_path / "opt")
    w = DeltaLogWriter(spark, t)
    w.create(spark.range(0, 10).select(F.col("id").alias("k")))
    for base in (100, 200, 300):
        w.append(spark.range(base, base + 5).select(F.col("id").alias("k")))
    _, _, files_before = DeltaLog(t).snapshot(None)
    assert len(files_before) > 1
    v = w.optimize(num_files=1)
    _, _, files_after = DeltaLog(t).snapshot(None)
    assert len(files_after) == 1
    want = list(range(10)) + [b + i for b in (100, 200, 300) for i in range(5)]
    assert sorted(r.k for r in read_delta(spark, t).collect()) == sorted(want)
    # time travel to the pre-optimize version sees the same rows
    assert sorted(r.k for r in read_delta(spark, t, version=v - 1).collect()) == sorted(
        want
    )


def test_optimize_is_invisible_to_streaming_source(spark, tmp_path):
    """OPTIMIZE commits carry dataChange=false on adds AND removes: the
    changelog stream must neither refuse the commit (remove) nor emit
    the rewritten rows again (add)."""
    from plankton_spark.sources.delta_log import DeltaLogStreamReader

    t = str(tmp_path / "optstream")
    w = DeltaLogWriter(spark, t)
    w.create(spark.range(0, 4).select(F.col("id").alias("k")))
    w.append(spark.range(10, 14).select(F.col("id").alias("k")))
    v_opt = w.optimize(num_files=1)
    reader = DeltaLogStreamReader(t, ignore_changes=False)
    # replaying across the optimize version raises nothing and yields
    # no files from the optimize commit itself
    added = reader._added(v_opt - 1, v_opt)
    assert added == []


def test_writer_schema_evolution_add_column(spark, tmp_path):
    """Mirrors test_table_format.py schema evolution: adds need
    merge_schema=True; old rows read the new column as null; drops and
    retypes are rejected."""
    from pyspark.sql import Row

    t = str(tmp_path / "evo")
    w = DeltaLogWriter(spark, t)
    w.create(spark.createDataFrame([Row(k=1), Row(k=2)]))
    with_extra = spark.createDataFrame([Row(k=3, tag="new")])
    with pytest.raises(ValueError, match="merge_schema"):
        w.append(with_extra)
    w.append(with_extra, merge_schema=True)
    got = read_delta(spark, t).orderBy("k").collect()
    assert [(r.k, r.tag) for r in got] == [(1, None), (2, None), (3, "new")]
    # dropping or retyping is always rejected
    with pytest.raises(ValueError, match="missing"):
        w.append(spark.createDataFrame([Row(tag="only")]))
    with pytest.raises(ValueError, match="retype"):
        w.append(
            spark.createDataFrame([Row(k="notint", tag="x")]), merge_schema=True
        )


def test_schema_evolution_survives_checkpoint_replay(spark, tmp_path):
    from pyspark.sql import Row

    from plankton_spark.sources.delta_log import write_delta_checkpoint

    t = str(tmp_path / "evocp")
    w = DeltaLogWriter(spark, t)
    w.create(spark.createDataFrame([Row(k=1)]))
    w.append(spark.createDataFrame([Row(k=2, tag="t")]), merge_schema=True)
    write_delta_checkpoint(t)
    schema, _, _ = DeltaLog(t).snapshot(None)
    assert [f.name for f in schema.fields] == ["k", "tag"]
    got = read_delta(spark, t).orderBy("k").collect()
    assert [(r.k, r.tag) for r in got] == [(1, None), (2, "t")]


def test_writer_overwrite_replaces_atomically(spark, tmp_path):
    root = str(tmp_path / "ovr")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    w.append(spark.range(5, 8).select(F.col("id").alias("k")))
    v = w.overwrite(spark.range(100, 103).select(F.col("id").alias("k")))
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [100, 101, 102]
    # time travel still sees the pre-overwrite content
    assert sorted(r.k for r in read_delta(spark, root, version=v - 1).collect()) == list(
        range(8)
    )


def test_writer_merge_upserts_and_prunes_files(spark, tmp_path):
    """MERGE: matching keys update, new keys insert — and files whose
    key range cannot overlap the source's are NOT rewritten (the
    file-stats pruning that keeps MERGE from rewriting the table)."""
    root = str(tmp_path / "mrg")
    w = DeltaLogWriter(spark, root)
    # two disjoint-range files: [0,10) and [1000,1010)
    w.create(spark.range(0, 10).coalesce(1).select(F.col("id").alias("k"), F.lit("old").alias("tag")))
    w.append(spark.range(1000, 1010).coalesce(1).select(F.col("id").alias("k"), F.lit("old").alias("tag")))
    _, _, before = DeltaLog(root).snapshot(None)
    src = spark.createDataFrame(
        [(1003, "new"), (1005, "new"), (2000, "new")], "k long, tag string"
    )
    w.merge(src, "k")
    got = {(r.k, r.tag) for r in read_delta(spark, root).collect()}
    want = {(k, "old") for k in range(10)}
    want |= {(k, "old") for k in range(1000, 1010) if k not in (1003, 1005)}
    want |= {(1003, "new"), (1005, "new"), (2000, "new")}
    assert got == want
    # pruning: the [0,10) file must still be live (never rewritten)
    _, _, after = DeltaLog(root).snapshot(None)
    before_rel = {os.path.relpath(p, root) for p, _ in before}
    after_rel = {os.path.relpath(p, root) for p, _ in after}
    survivors = before_rel & after_rel
    assert len(survivors) == 1  # exactly the non-overlapping file survived


def test_writer_merge_race_aborts_or_serializes(spark, tmp_path):
    """Two writers merging into the SAME key range: the loser must
    abort with ConcurrentDeltaModification (its overlapping file was
    rewritten), never silently undo the winner."""
    import threading

    root = str(tmp_path / "mrgrace")
    w = DeltaLogWriter(spark, root)
    w.create(
        spark.range(0, 20)
        .coalesce(1)
        .select(F.col("id").alias("k"), F.lit("old").alias("tag"))
    )
    barrier = threading.Barrier(2)
    outcomes: list[str] = []
    lock = threading.Lock()

    def worker(tag: str, keys: list[int]) -> None:
        h = DeltaLogWriter(spark, root)
        src = spark.createDataFrame([(k, tag) for k in keys], "k long, tag string")
        barrier.wait()
        try:
            h.merge(src, "k")
            with lock:
                outcomes.append("ok")
        except ConcurrentDeltaModification:
            with lock:
                outcomes.append("conflict")

    threads = [
        threading.Thread(target=worker, args=(t, ks))
        for t, ks in (("a", [1, 2]), ("b", [3, 4]))
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert sorted(outcomes) in (["conflict", "ok"], ["ok", "ok"]), outcomes
    rows = sorted((r.k, r.tag) for r in read_delta(spark, root).collect())
    ks = [k for k, _ in rows]
    assert ks == list(range(20))  # no lost/duplicated rows either way
    n_new = sum(1 for _, t in rows if t in ("a", "b"))
    assert n_new == (4 if outcomes == ["ok", "ok"] else 2)


def test_writer_vacuum_removes_only_orphans(spark, tmp_path):
    root = str(tmp_path / "vac")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    w.delete_where(F.col("k") < 2)  # historic file now unreferenced? no — still in v0
    # plant an orphan (crashed stage leftover)
    orphan = os.path.join(root, "part-deadbeef.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    os.makedirs(os.path.join(root, "_stage-crashed"), exist_ok=True)
    # default grace window: a FRESH unreferenced file may be an
    # in-flight writer's staged data — must NOT be deleted
    assert w.vacuum() == []
    removed = w.vacuum(grace_seconds=0.0)
    assert "part-deadbeef.parquet" in removed
    assert "_stage-crashed" in removed
    # historic + live files all retained: every version still reads
    assert sorted(r.k for r in read_delta(spark, root, version=0).collect()) == list(range(5))
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [2, 3, 4]


def test_vacuum_keeps_checkpoint_only_references(spark, tmp_path):
    """A compacted log may record adds ONLY in the checkpoint parquet
    (the superseded JSON commits cleaned up): vacuum must treat those
    files as referenced, not delete live data."""
    from plankton_spark.sources.delta_log import write_delta_checkpoint

    root = str(tmp_path / "vac_cp")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    w.append(spark.range(5, 8).select(F.col("id").alias("k")))
    write_delta_checkpoint(root, version=1)
    log = os.path.join(root, "_delta_log")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert w.vacuum(grace_seconds=0.0) == []
    assert sorted(r.k for r in read_delta(spark, root).collect()) == list(range(8))


def test_txn_guard_survives_checkpoint_without_txn_rows(spark, tmp_path):
    """A checkpoint written WITHOUT txn rows (external tools) must not
    hide earlier txn actions while their JSON commits still exist —
    otherwise a replayed micro-batch would be appended twice."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = str(tmp_path / "txn_cp")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 2).select(F.col("id").alias("k")))
    w.append(spark.range(10, 12).select(F.col("id").alias("k")), txn=("job", 7))
    # author a txn-less checkpoint at the current version (as an
    # external writer might)
    log = os.path.join(root, "_delta_log")
    schema, part_cols, files = DeltaLog(root).snapshot(None)
    rows = [
        {
            "metaData": {
                "id": "x",
                "schemaString": schema.json(),
                "partitionColumns": part_cols,
            },
            "add": None,
        }
    ]
    for p, pv in files:
        # parquet can't encode an EMPTY struct; the replay treats a
        # missing partitionValues as {}
        rows.append(
            {
                "metaData": None,
                "add": {"path": os.path.relpath(p, root), "partitionValues": None},
            }
        )
    _pq.write_table(
        _pa.Table.from_pylist(rows), os.path.join(log, f"{1:020d}.checkpoint.parquet")
    )
    # the JSON commit carrying the txn still exists → must be honored
    assert w.last_txn_version("job") == 7
    assert (
        w.append(spark.range(10, 12).select(F.col("id").alias("k")), txn=("job", 7))
        is None
    )
    assert read_delta(spark, root).count() == 4


def test_overwrite_replaces_schema(spark, tmp_path):
    """Overwrite with a different schema must commit a metaData action
    (overwriteSchema semantics) — otherwise reads stay governed by the
    stale schemaString and new columns are invisible."""
    from pyspark.sql import Row

    root = str(tmp_path / "ovr_schema")
    w = DeltaLogWriter(spark, root)
    w.create(spark.createDataFrame([Row(k=1)]))
    w.overwrite(spark.createDataFrame([Row(k=2, tag="x")]))
    got = read_delta(spark, root).collect()
    assert [(r.k, r.tag) for r in got] == [(2, "x")]
    # time travel still projects the OLD schema
    old = read_delta(spark, root, version=0)
    assert old.columns == ["k"]


def test_evolved_schema_reads_null_fill_via_datasource(spark, tmp_path):
    """The DSv2 reader must null-fill pre-evolution files — pyarrow's
    get_field_index returns -1 for a missing column and column(-1) is
    the file's LAST column, so a naive lookup silently returns wrong
    data."""
    from pyspark.sql import Row

    root = str(tmp_path / "evo_ds")
    w = DeltaLogWriter(spark, root)
    w.create(spark.createDataFrame([Row(k=1, props="keepme")]))
    w.append(
        spark.createDataFrame([Row(k=2, props="p2", tag="t")]), merge_schema=True
    )
    register(spark)
    got = sorted(
        (r.k, r.props, r.tag)
        for r in spark.read.format("deltalog").option("path", root).load().collect()
    )
    # old file's tag is NULL — NOT its last physical column ('keepme')
    assert got == [(1, "keepme", None), (2, "p2", "t")]


def test_stage_writes_delta_spec_stats(spark, tmp_path):
    root = str(tmp_path / "stats")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(3, 9).coalesce(1).select(F.col("id").alias("k")))
    with open(os.path.join(root, "_delta_log", "00000000000000000000.json")) as fh:
        adds = [json.loads(l)["add"] for l in fh if '"add"' in l]
    assert adds
    st = json.loads(adds[0]["stats"])
    assert st["numRecords"] == 6
    assert st["minValues"]["k"] == 3 and st["maxValues"]["k"] == 8
    assert st["nullCount"]["k"] == 0


def test_writer_optimize_zorder_tightens_file_stats(spark, tmp_path):
    """OPTIMIZE ZORDER on the Delta writer: after clustering on
    (x, y), every rewritten file's stats range is narrow in BOTH
    dimensions (the add-action stats external readers use for data
    skipping) — plain compaction leaves files spanning each domain."""
    root = str(tmp_path / "dz")
    grid = spark.range(100 * 100).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("long").alias("y"),
    )
    w = DeltaLogWriter(spark, root)
    w.create(grid.repartition(8))
    v = w.optimize(num_files=16, zorder_by=["x", "y"])
    assert read_delta(spark, root).count() == 10_000
    spans = []
    with open(os.path.join(root, "_delta_log", f"{v:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" not in a:
                continue
            st = json.loads(a["add"]["stats"])
            spans.append(
                (
                    st["maxValues"]["x"] - st["minValues"]["x"],
                    st["maxValues"]["y"] - st["minValues"]["y"],
                )
            )
    assert len(spans) == 16
    # z-clustered files are narrow in BOTH dims on average (range
    # boundaries straddle some z-cells, so individual files may span
    # wider); plain compaction leaves every file ~99 wide in both
    avg_x = sum(sx for sx, _ in spans) / len(spans)
    avg_y = sum(sy for _, sy in spans) / len(spans)
    assert avg_x < 55 and avg_y < 55, spans

    root2 = str(tmp_path / "dplain")
    w2 = DeltaLogWriter(spark, root2)
    w2.create(grid.repartition(8))
    v2 = w2.optimize(num_files=16)
    base = []
    with open(os.path.join(root2, "_delta_log", f"{v2:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" in a:
                st = json.loads(a["add"]["stats"])
                base.append(
                    (
                        st["maxValues"]["x"] - st["minValues"]["x"],
                        st["maxValues"]["y"] - st["minValues"]["y"],
                    )
                )
    avg_bx = sum(sx for sx, _ in base) / len(base)
    assert avg_x < avg_bx / 1.5, (avg_x, avg_bx)

    with pytest.raises(ValueError, match="not both"):
        w.optimize(sort_by=["x"], zorder_by=["y"])


@pytest.mark.parametrize(
    "kind",
    ["int_boundary", "int_disjoint", "timestamp", "string"],
)
def test_merge_equals_reference_semantics(spark, tmp_path, kind):
    """MERGE == (base anti-join source) UNION source, whatever the
    pruning decided — exercised at the edges where pruning bugs live:
    a source range touching a file's max exactly (inclusive bounds),
    fully disjoint ranges, and timestamp/string keys (compared via
    the ISO-8601 stat encoding, not native ordering)."""
    import datetime

    root = str(tmp_path / f"mref_{kind}")
    w = DeltaLogWriter(spark, root)
    if kind == "timestamp":
        base = spark.sql(
            "SELECT timestampadd(HOUR, id, TIMESTAMP'2024-01-01 00:00:00') AS k,"
            " 'old' AS tag FROM range(10)"
        )
        src = spark.sql(
            "SELECT timestampadd(HOUR, id, TIMESTAMP'2024-01-01 05:00:00') AS k,"
            " 'new' AS tag FROM range(10)"
        )
    elif kind == "string":
        base = spark.createDataFrame(
            [(f"k{i:03d}", "old") for i in range(10)], "k string, tag string"
        )
        src = spark.createDataFrame(
            [(f"k{i:03d}", "new") for i in range(5, 15)], "k string, tag string"
        )
    elif kind == "int_boundary":
        base = spark.createDataFrame(
            [(i, "old") for i in range(10)], "k long, tag string"
        )
        # source min == base file's max: inclusive-bound edge
        src = spark.createDataFrame(
            [(i, "new") for i in range(9, 12)], "k long, tag string"
        )
    else:  # int_disjoint
        base = spark.createDataFrame(
            [(i, "old") for i in range(10)], "k long, tag string"
        )
        src = spark.createDataFrame(
            [(i, "new") for i in range(100, 103)], "k long, tag string"
        )
    w.create(base.coalesce(1))
    w.merge(src, "k")
    got = {(r.k, r.tag) for r in read_delta(spark, root).collect()}
    want = {
        (r.k, r.tag)
        for r in base.join(src, "k", "left_anti").unionByName(src).collect()
    }
    assert got == want


def test_writer_partitioned_create_append_prune(spark, tmp_path):
    """Partitioned writes: hive-style layout, partitionValues in the
    add actions, appends inherit the layout, and read_delta's
    partitions= filter prunes at the file-list level (no non-matching
    file ever reaches Spark)."""
    root = str(tmp_path / "dpart")
    w = DeltaLogWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "AB"[i % 2], float(i)) for i in range(10)],
        "k long, status string, v double",
    )
    w.create(df, partition_by=["status"])
    w.append(
        spark.createDataFrame([(100, "C", 1.0)], "k long, status string, v double")
    )
    got = read_delta(spark, root)
    assert sorted(r.k for r in got.collect()) == list(range(10)) + [100]
    assert dict(got.dtypes)["status"] == "string"
    # add actions carry hive-style paths + partitionValues
    _, part_cols, files = DeltaLog(root).snapshot(None)
    assert part_cols == ["status"]
    assert all("status=" in p for p, _ in files)
    assert {pv["status"] for _, pv in files} == {"A", "B", "C"}
    # file-list pruning: only the A-partition files are scanned
    pruned = read_delta(spark, root, partitions={"status": "A"})
    assert sorted(r.k for r in pruned.collect()) == [0, 2, 4, 6, 8]
    assert all("status=A" in f for f in pruned.inputFiles())
    with pytest.raises(ValueError, match="not partition columns"):
        read_delta(spark, root, partitions={"nope": "x"})


def test_writer_partitioned_overwrite_and_rewrites(spark, tmp_path):
    root = str(tmp_path / "dpart2")
    w = DeltaLogWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "AB"[i % 2]) for i in range(6)], "k long, status string"
    )
    w.create(df, partition_by=["status"])
    # overwrite keeps the partition layout (it stages fresh, reads nothing)
    w.overwrite(
        spark.createDataFrame(
            [(i, "AB"[i % 2]) for i in range(50, 60)], "k long, status string"
        )
    )
    assert sorted(r.k for r in read_delta(spark, root).collect()) == list(
        range(50, 60)
    )
    _, _, files = DeltaLog(root).snapshot(None)
    assert all("status=" in p for p, _ in files)


def test_writer_partitioned_delete_on_partition_column(spark, tmp_path):
    """DELETE with a predicate ON the partition column: the raw files
    don't contain it, so evaluation must go through the assembled view
    (re-attached literals) — a bug here silently matches nothing (or
    everything via NULL semantics)."""
    root = str(tmp_path / "dpart_del")
    w = DeltaLogWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "ABC"[i % 3]) for i in range(12)], "k long, status string"
    )
    w.create(df, partition_by=["status"])
    w.delete_where(F.col("status") == "B")
    got = sorted((r.k, r.status) for r in read_delta(spark, root).collect())
    assert got == sorted(
        (i, "ABC"[i % 3]) for i in range(12) if "ABC"[i % 3] != "B"
    )
    # mixed predicate (partition + data column)
    w.delete_where((F.col("status") == "A") & (F.col("k") >= 6))
    got = sorted((r.k, r.status) for r in read_delta(spark, root).collect())
    assert got == sorted(
        (i, s)
        for i in range(12)
        for s in ["ABC"[i % 3]]
        if s == "C" or (s == "A" and i < 6)
    )


def test_writer_partitioned_merge_prunes_by_partition_value(spark, tmp_path):
    """MERGE keyed ON the partition column: pruning uses typed
    partitionValues compares (no footer stats exist for the key — it
    isn't in the files), and non-overlapping partitions carry forward
    untouched."""
    root = str(tmp_path / "dpart_mrg")
    w = DeltaLogWriter(spark, root)
    base = spark.createDataFrame(
        [(i, i % 3, "old") for i in range(12)], "k long, bucket int, tag string"
    )
    w.create(base, partition_by=["bucket"])
    _, _, before = DeltaLog(root).snapshot(None)
    untouched_before = {p for p, pv in before if pv["bucket"] == "2"}
    src = spark.createDataFrame(
        [(0, 0, "new"), (99, 1, "new")], "k long, bucket int, tag string"
    )
    w.merge(src, "bucket")  # buckets 0 and 1 rewritten, bucket 2 untouched
    got = {(r.k, r.bucket, r.tag) for r in read_delta(spark, root).collect()}
    want = {(i, 2, "old") for i in range(12) if i % 3 == 2}
    want |= {(0, 0, "new"), (99, 1, "new")}
    assert got == want
    _, _, after = DeltaLog(root).snapshot(None)
    untouched_after = {p for p, pv in after if pv["bucket"] == "2"}
    assert untouched_before == untouched_after
    # source missing the partition column is rejected up front
    with pytest.raises(ValueError, match="partition"):
        w.merge(spark.createDataFrame([(1, "x")], "k long, tag string"), "k")


def test_writer_partitioned_optimize_per_partition(spark, tmp_path):
    root = str(tmp_path / "dpart_opt")
    w = DeltaLogWriter(spark, root)
    df = spark.createDataFrame(
        [(i, "AB"[i % 2]) for i in range(20)], "k long, status string"
    ).repartition(4)
    w.create(df, partition_by=["status"])
    w.append(
        spark.createDataFrame(
            [(i, "AB"[i % 2]) for i in range(20, 40)], "k long, status string"
        ).repartition(4)
    )
    _, _, before = DeltaLog(root).snapshot(None)
    assert len(before) > 2
    w.optimize(num_files=1)
    _, _, after = DeltaLog(root).snapshot(None)
    # one file per partition value
    assert len(after) == 2, after
    assert sorted(r.k for r in read_delta(spark, root).collect()) == list(range(40))


def test_writer_partitioned_null_partition_value(spark, tmp_path):
    """NULL partition values: hive's __HIVE_DEFAULT_PARTITION__ dir
    round-trips to a JSON-null partitionValue, reads back as NULL,
    and is deletable by an isNull predicate."""
    root = str(tmp_path / "dpnull")
    w = DeltaLogWriter(spark, root)
    df = spark.createDataFrame([(1, "A"), (2, None), (3, "B")], "k long, status string")
    w.create(df, partition_by=["status"])
    got = sorted(
        (r.k, r.status) for r in read_delta(spark, root).collect()
    )
    assert got == [(1, "A"), (2, None), (3, "B")]
    _, _, files = DeltaLog(root).snapshot(None)
    assert {pv["status"] for _, pv in files} == {"A", "B", None}
    w.delete_where(F.col("status").isNull())
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [1, 3]


def test_read_delta_changes_feed(spark, tmp_path):
    from plankton_spark.sources.delta_log import read_delta_changes

    root = str(tmp_path / "cdf")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 5).select(F.col("id").alias("k")))
    v1 = w.append(spark.range(5, 8).select(F.col("id").alias("k")))
    v2 = w.delete_where(F.col("k") < 2)
    ch = read_delta_changes(spark, root, 0, v2).collect()
    got = sorted((r.k, r._change_type) for r in ch)
    assert got == [(0, "delete"), (1, "delete"), (5, "insert"), (6, "insert"), (7, "insert")]
    # a layout-only commit produces an EMPTY feed
    v3 = w.optimize(num_files=1)
    assert read_delta_changes(spark, root, v2, v3).count() == 0


def test_partitioned_read_is_single_scan(spark, tmp_path):
    """Our hive layout reads via basePath as ONE multi-path scan —
    plan size and job count stay O(1) in partition cardinality
    (the per-tuple union fallback is only for external non-hive
    layouts)."""
    import re

    root = str(tmp_path / "dsingle")
    w = DeltaLogWriter(spark, root)
    w.create(
        spark.createDataFrame(
            [(i, "ABCD"[i % 4]) for i in range(16)], "k long, status string"
        ),
        partition_by=["status"],
    )
    df = read_delta(spark, root)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", plan))) == 1, plan
    assert sorted(r.k for r in df.collect()) == list(range(16))


def test_partitioned_write_rejects_empty_string_value(spark, tmp_path):
    """'' and NULL both map to __HIVE_DEFAULT_PARTITION__ on disk, so
    an empty-string partition value would silently round-trip as NULL
    — refused at write instead."""
    w = DeltaLogWriter(spark, str(tmp_path / "dempty"))
    df = spark.createDataFrame([(1, "A"), (2, "")], "k long, status string")
    with pytest.raises(ValueError, match="empty-string"):
        w.create(df, partition_by=["status"])


def test_partitioned_special_char_values_roundtrip(spark, tmp_path):
    """Partition values with hive-escaped characters (=, /, space,
    unicode, %xx look-alikes) must round-trip exactly through the
    dir encoding, the log's partitionValues, AND the basePath
    single-scan decode."""
    weird = ["a=b", "a/b", "a b", "a:b", "ünïcode", "a%20b", "#hash"]
    rows = [(i, w) for i, w in enumerate(weird)]
    df = spark.createDataFrame(rows, "k long, status string")
    root = str(tmp_path / "dweird")
    DeltaLogWriter(spark, root).create(df, partition_by=["status"])
    got = sorted((r.k, r.status) for r in read_delta(spark, root).collect())
    assert got == sorted(rows)
    # and the pruned read finds the escaped value
    one = read_delta(spark, root, partitions={"status": "a=b"}).collect()
    assert [(r.k, r.status) for r in one] == [(0, "a=b")]


# ---------------------------------------------------------------------
# Reader protocol gate (r6 verdict #2): refuse tables whose reader
# protocol this pure-Python reader does not implement, instead of
# silently returning wrong results (DV'd deletes resurfacing, mapped
# columns mis-resolving).
# ---------------------------------------------------------------------

from plankton_spark.sources.delta_log import DeltaProtocolError  # noqa: E402


def _author_foreign_delta(tmp_path, name: str, protocol: dict) -> str:
    """Hand-author a minimal third-party Delta table: one parquet data
    file and a 0-commit carrying the given protocol action."""
    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(root, "part-0.parquet"),
    )
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    actions = [
        {"protocol": protocol},
        {
            "metaData": {
                "id": "foreign-tbl",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_str,
                "partitionColumns": [],
                "configuration": {},
            }
        },
        {
            "add": {
                "path": "part-0.parquet",
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, "part-0.parquet")),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


def test_protocol_refuses_unimplemented_v3_feature(spark, tmp_path):
    """An unimplemented v3 reader feature (collations here;
    deletionVectors graduated to SUPPORTED in r7, v2Checkpoint and
    typeWidening in r8) must refuse."""
    root = _author_foreign_delta(
        tmp_path,
        "tw_tbl",
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["collations"],
            "writerFeatures": ["collations"],
        },
    )
    with pytest.raises(DeltaProtocolError, match="collations"):
        read_delta(spark, root)


def test_protocol_accepts_deletion_vectors_feature(spark, tmp_path):
    """deletionVectors is an implemented reader feature: a v3 table
    declaring it (with no actual DVs yet) reads fine."""
    root = _author_foreign_delta(
        tmp_path,
        "dvfeat_tbl",
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        },
    )
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [1, 2, 3]


def test_protocol_accepts_v2_and_refuses_unknown_versions(spark, tmp_path):
    """minReaderVersion 2 (column mapping) is implemented in name
    mode as of r7 — a v2 table with no mapped columns reads plain; an
    unknown future version without a feature list still refuses."""
    ok = _author_foreign_delta(
        tmp_path, "cm_tbl", {"minReaderVersion": 2, "minWriterVersion": 5}
    )
    assert sorted(r.k for r in read_delta(spark, ok).collect()) == [1, 2, 3]
    bad = _author_foreign_delta(
        tmp_path, "v4_tbl", {"minReaderVersion": 4, "minWriterVersion": 9}
    )
    with pytest.raises(DeltaProtocolError, match="minReaderVersion=4"):
        read_delta(spark, bad)


def test_protocol_v3_with_only_supported_features_reads(spark, tmp_path):
    """Table-features protocol rule: the version number alone is not
    disqualifying — a v3 table listing NO unimplemented reader
    features must read fine."""
    root = _author_foreign_delta(
        tmp_path,
        "v3_ok_tbl",
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": [],
            "writerFeatures": ["appendOnly"],
        },
    )
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [1, 2, 3]


def test_protocol_v1_reads(spark, tmp_path):
    root = _author_foreign_delta(
        tmp_path, "v1_tbl", {"minReaderVersion": 1, "minWriterVersion": 2}
    )
    assert sorted(r.k for r in read_delta(spark, root).collect()) == [1, 2, 3]


def test_protocol_gate_applies_from_checkpoint(spark, tmp_path):
    """The protocol may arrive via checkpoint rows only (JSON commits
    cleaned up) — the gate must still fire."""
    import pyarrow as _pa

    root = _author_foreign_delta(
        tmp_path,
        "cp_dv_tbl",
        {"minReaderVersion": 3, "minWriterVersion": 7,
         "readerFeatures": ["collations"]},
    )
    log_dir = os.path.join(root, "_delta_log")
    # foreign checkpoint carrying the protocol (incl. readerFeatures)
    with open(os.path.join(log_dir, f"{0:020d}.json")) as f:
        actions = [json.loads(x) for x in f if x.strip()]
    rows = []
    for a in actions:
        rows.append(
            {
                "protocol": a.get("protocol"),
                "metaData": a.get("metaData"),
                "add": a.get("add"),
            }
        )
    cp_schema = _pa.schema(
        [
            _pa.field(
                "protocol",
                _pa.struct(
                    [
                        _pa.field("minReaderVersion", _pa.int32()),
                        _pa.field("minWriterVersion", _pa.int32()),
                        _pa.field("readerFeatures", _pa.list_(_pa.string())),
                    ]
                ),
            ),
            _pa.field(
                "metaData",
                _pa.struct(
                    [
                        _pa.field("id", _pa.string()),
                        _pa.field("schemaString", _pa.string()),
                        _pa.field("partitionColumns", _pa.list_(_pa.string())),
                    ]
                ),
            ),
            _pa.field(
                "add",
                _pa.struct(
                    [
                        _pa.field("path", _pa.string()),
                        _pa.field(
                            "partitionValues",
                            _pa.map_(_pa.string(), _pa.string()),
                        ),
                        _pa.field("size", _pa.int64()),
                        _pa.field("dataChange", _pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    for r in rows:
        if r["add"] is not None:
            r["add"] = {
                k: (list(v.items()) if k == "partitionValues" else v)
                for k, v in r["add"].items()
                if k in ("path", "partitionValues", "size", "dataChange")
            }
    pq.write_table(
        _pa.Table.from_pylist(rows, schema=cp_schema),
        os.path.join(log_dir, f"{0:020d}.checkpoint.parquet"),
    )
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    with pytest.raises(DeltaProtocolError, match="collations"):
        read_delta(spark, root)


def test_checkpoint_add_carries_mtime_and_stats(spark, tmp_path):
    """ADVICE r6 #1: the engine's checkpoint add struct must carry
    modificationTime (spec-required) and stats, so MERGE's log-stats
    pruning survives cleanup of pre-checkpoint JSON commits without
    degrading to driver-side footer reads."""
    from plankton_spark.sources import delta_log as dl

    root = str(tmp_path / "cp_stats")
    w = DeltaLogWriter(spark, root)
    w.create(spark.range(0, 10).select(_F.col("id").alias("k")))
    w.append(spark.range(10, 15).select(_F.col("id").alias("k")))
    out = dl.write_delta_checkpoint(root, version=1)
    cp = pq.read_table(out).to_pylist()
    adds = [r["add"] for r in cp if r.get("add") and r["add"].get("path")]
    assert adds, cp
    for a in adds:
        assert a["modificationTime"] and a["modificationTime"] > 0, a
        st = json.loads(a["stats"])
        assert "minValues" in st and "maxValues" in st, a
    # stats must come from the LOG after the superseded JSONs are gone
    for v in (0, 1):
        os.remove(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    orig = dl._file_stats

    def _boom(path):
        raise AssertionError(f"footer fallback opened {path}")

    dl._file_stats = _boom
    try:
        stats = w.live_stats()
    finally:
        dl._file_stats = orig
    assert stats and all("minValues" in s for s in stats.values())


def test_column_defaults_lifecycle(spark, tmp_path):
    """allowColumnDefaults: materialize on omission, explicit values
    win, drop removes the fallback, protocol carries the feature,
    ADD-COLUMN-with-default and non-foldable expressions refuse."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from plankton_spark.sources.delta_log import DeltaLogWriter, read_delta

    root = str(tmp_path / "t")
    w = DeltaLogWriter(spark, root)
    # nullable schema: F.lit would mark s non-nullable and the
    # explicit-NULL leg below would (correctly) hit NOT NULL instead
    w.create(
        spark.createDataFrame(
            [(i, "A") for i in range(10)], "k long, s string"
        )
    )
    with pytest.raises(ValueError, match="no column"):
        w.set_column_default("missing", "'X'")
    with pytest.raises(ValueError, match="does not evaluate standalone"):
        w.set_column_default("s", "k + 1")  # column ref: not foldable
    w.set_column_default("s", "'D'")
    w.append(spark.range(10, 15).select(F.col("id").alias("k")))
    out = read_delta(spark, root)
    assert out.where(F.col("s") == "D").count() == 5
    # explicit value (and explicit NULL) beats the default
    w.append(
        spark.range(15, 18).select(
            F.col("id").alias("k"), F.lit(None).cast("string").alias("s")
        )
    )
    assert read_delta(spark, root).where(F.col("s").isNull()).count() == 3
    # feature landed in the protocol
    logs = sorted(
        f for f in os.listdir(os.path.join(root, "_delta_log"))
        if f.endswith(".json")
    )
    feats = set()
    for lf in logs:
        for line in open(os.path.join(root, "_delta_log", lf)):
            a = json.loads(line)
            if "protocol" in a:
                feats = set(a["protocol"].get("writerFeatures") or [])
    assert "allowColumnDefaults" in feats
    # drop: with no default, omitting the column is back to being a
    # strict-schema error (the engine never silently NULL-fills)
    w.drop_column_default("s")
    with pytest.raises(ValueError, match="missing columns"):
        w.append(spark.range(18, 20).select(F.col("id").alias("k")))
    assert read_delta(spark, root).where(F.col("s") == "D").count() == 5
