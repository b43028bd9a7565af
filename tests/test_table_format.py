"""Tests for the planktable transactional table format
(plankton_spark/table_format.py): snapshot isolation, time travel,
optimistic concurrency, file-stats skipping, merge pruning, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from plankton_spark.table_format import (
    CHECKPOINT_EVERY,
    CommitConflict,
    ConcurrentModification,
    PlankTable,
    _version_file,
)


def _mk(spark, tmp_path, name="t"):
    return PlankTable(spark, str(tmp_path / name))


def test_create_append_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(0, 10).select(F.col("id").alias("k")))
    t.append(spark.range(10, 25).select(F.col("id").alias("k")))
    assert t.read(version=0).count() == 10
    assert t.read(version=1).count() == 25
    assert t.read().count() == 25
    ops = [h["operation"] for h in t.history()]
    assert ops == ["CREATE", "APPEND"]


def test_overwrite_replaces_snapshot_keeps_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(0, 10).select(F.col("id").alias("k")))
    t.overwrite(spark.range(100, 103).select(F.col("id").alias("k")))
    assert sorted(r.k for r in t.read().collect()) == [100, 101, 102]
    assert t.read(version=0).count() == 10  # old snapshot intact


def test_delete_where_rewrites_only_hit_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(0, 10).repartition(1).select(F.col("id").alias("k")))
    t.append(spark.range(100, 110).repartition(1).select(F.col("id").alias("k")))
    before = set(t.files())
    t.delete_where(F.col("k") == 105)
    after = set(t.files())
    # the file holding 0..9 must be untouched (same physical file)
    assert len(before & after) == 1
    assert sorted(r.k for r in t.read().collect()) == list(range(10)) + [
        100, 101, 102, 103, 104, 106, 107, 108, 109,
    ]


def test_merge_upserts_and_prunes_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(
        spark.range(0, 10).repartition(1).select(F.col("id").alias("k"),
                                                 F.lit("old").alias("v"))
    )
    t.append(
        spark.range(1000, 1010).repartition(1).select(F.col("id").alias("k"),
                                                      F.lit("old").alias("v"))
    )
    before = set(t.files())
    src = spark.createDataFrame([(1005, "new"), (2000, "new")], "k long, v string")
    t.merge(src, "k")
    after = set(t.files())
    # low-range file (0..9) does not overlap [1005, 2000] → untouched
    assert len(before & after) == 1
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[1005] == "new" and rows[2000] == "new" and rows[3] == "old"
    assert len(rows) == 21


def test_commit_conflict_raises_and_retry_rebases(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(3).select(F.col("id").alias("k")))
    # simulate a concurrent winner for version 1
    with open(_version_file(t.path, 1), "w") as f:
        json.dump({"version": 1, "operation": "APPEND", "add": [], "remove": []}, f)
    with pytest.raises(CommitConflict):
        t._commit(1, operation="APPEND", add=[], remove=[])
    # the retry loop lands on version 2
    v = t.append(spark.range(3, 6).select(F.col("id").alias("k")))
    assert v == 2
    assert t.read().count() == 6


def test_checkpoint_written_and_used(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(1).select(F.col("id").alias("k")))
    for i in range(1, CHECKPOINT_EVERY + 3):
        t.append(spark.range(i * 10, i * 10 + 1).select(F.col("id").alias("k")))
    ckpt = os.path.join(t.path, "_log", f"{CHECKPOINT_EVERY:08d}.checkpoint.json")
    assert os.path.exists(ckpt)
    assert t.read().count() == CHECKPOINT_EVERY + 3
    # replay starting from checkpoint equals full replay
    assert t._snapshot() == t._snapshot(t.latest_version())


def test_scan_skips_files_by_footer_stats(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(0, 100).repartition(1).select(F.col("id").alias("k")))
    t.append(spark.range(1000, 1100).repartition(1).select(F.col("id").alias("k")))
    t.append(spark.range(5000, 5100).repartition(1).select(F.col("id").alias("k")))
    pruned = t.scan({"k": (1050, 1060)})
    assert pruned.inputFiles() and len(pruned.inputFiles()) == 1
    assert pruned.where(F.col("k").between(1050, 1060)).count() == 11
    # unprunable range keeps everything
    assert len(t.scan({"k": (0, 10000)}).inputFiles()) == 3


def test_optimize_compacts_and_clusters(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(0, 100).repartition(4).select(F.col("id").alias("k")))
    for i in range(1, 4):
        t.append(
            spark.range(i * 100, i * 100 + 100)
            .repartition(4)
            .select(F.col("id").alias("k"))
        )
    assert len(t.files()) == 16
    v = t.optimize(sort_by=["k"], num_files=4)
    assert len(t.files()) == 4
    # content identical, history intact
    assert t.read().count() == 400
    assert sorted(r.k for r in t.diff(v - 1, v).collect()) == []
    # clustering → disjoint ranges → a narrow scan opens ONE file
    assert len(t.scan({"k": (150, 160)}).inputFiles()) == 1
    assert t.read(version=0).count() == 100


def test_append_txn_is_idempotent(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(3).select(F.col("id").alias("k")))
    sink = t.foreach_batch_sink("jobA")
    b0 = spark.range(10, 13).select(F.col("id").alias("k"))
    sink(b0, 0)
    sink(b0, 0)  # replayed micro-batch after simulated crash
    sink(spark.range(20, 22).select(F.col("id").alias("k")), 1)
    assert t.read().count() == 3 + 3 + 2
    assert t.last_txn_batch("jobA") == 1
    # a different app id is an independent txn line
    assert t.last_txn_batch("jobB") is None
    assert t.append_txn(b0, "jobB", 0) is not None
    assert t.read().count() == 11


def test_diff_reports_net_changes_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(
        spark.range(0, 10).repartition(1).select(F.col("id").alias("k"),
                                                 F.lit("x").alias("v"))
    )
    # merge rewrites the whole file but changes only k=5
    src = spark.createDataFrame([(5, "y"), (50, "y")], "k long, v string")
    t.merge(src, "k")
    ch = {(r.k, r.v, r._change_type) for r in t.diff(0, 1).collect()}
    assert ch == {(5, "y", "insert"), (50, "y", "insert"), (5, "x", "delete")}


def test_schema_evolution_add_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(3).select(F.col("id").alias("k")))
    wide = spark.range(3, 6).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(wide)
    t.append(wide, merge_schema=True)
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows == {0: None, 1: None, 2: None, 3: "x", 4: "x", 5: "x"}
    # time travel predates the evolution → narrow schema
    assert t.read(version=0).columns == ["k"]
    # dropping or retyping columns is always rejected
    with pytest.raises(ValueError, match="missing"):
        t.append(spark.range(9, 10).select(F.col("id").alias("v")), merge_schema=True)
    with pytest.raises(ValueError, match="retype"):
        t.append(
            spark.range(9, 10).select(
                F.col("id").cast("int").alias("k"), F.lit("x").alias("v")
            ),
            merge_schema=True,
        )


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create(spark.range(5).select(F.col("id").alias("k")))
    t.overwrite(spark.range(7).select(F.col("id").alias("k")))
    # drop a crash leftover
    orphan = os.path.join(t.path, "data-deadbeef-orphan.parquet")
    open(orphan, "wb").close()
    removed = t.vacuum()
    assert removed == ["data-deadbeef-orphan.parquet"]
    assert t.read(version=0).count() == 5  # historic files survive vacuum
    assert t.read().count() == 7


def test_planktable_datasource_format(spark, tmp_path):
    from plankton_spark.sources.planktable_ds import register

    register(spark)
    t = _mk(spark, tmp_path)
    t.create(spark.range(0, 5).select(F.col("id").alias("k")))
    t.append(
        spark.range(5, 8).select(F.col("id").alias("k"), F.lit("x").alias("v")),
        merge_schema=True,
    )
    df = spark.read.format("planktable").option("path", t.path).load()
    rows = {r.k: r.v for r in df.collect()}
    assert rows == {0: None, 1: None, 2: None, 3: None, 4: None,
                    5: "x", 6: "x", 7: "x"}
    # one partition per data file → the scan fans out like parquet
    assert df.rdd.getNumPartitions() == len(t.files())
    # versionAsOf through the reader API
    old = (
        spark.read.format("planktable")
        .option("path", t.path)
        .option("versionAsOf", 0)
        .load()
    )
    assert old.columns == ["k"] and old.count() == 5


def test_planktable_streaming_source(spark, tmp_path):
    from plankton_spark.sources.planktable_ds import register

    register(spark)
    t = _mk(spark, tmp_path)
    t.create(spark.range(0, 5).select(F.col("id").alias("k")))
    t.append(spark.range(5, 9).select(F.col("id").alias("k")))

    seen: dict[int, list[int]] = {}

    def grab(bdf, bid):
        seen.setdefault(bid, []).extend(r.k for r in bdf.collect())

    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("planktable")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(grab)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(v for vs in seen.values() for v in vs) == list(range(9))
    # new commits stream incrementally from the checkpointed offset
    seen.clear()
    t.append(spark.range(100, 103).select(F.col("id").alias("k")))
    t.optimize(num_files=1)  # rewrite-only commit must NOT re-emit rows
    run_once()
    assert sorted(v for vs in seen.values() for v in vs) == [100, 101, 102]


def test_concurrent_appends_race_no_lost_update(spark, tmp_path):
    """VERDICT r2 #4: real multithreaded writers racing versions.
    4 threads × 3 appends each through separate table handles; the
    optimistic-concurrency loop must serialize all 12 commits with no
    lost update and a linear, gap-free version history."""
    import threading

    t = _mk(spark, tmp_path, "race")
    t.create(spark.range(0, 10).select(F.col("id").alias("k")))
    n_threads, n_appends = 4, 3
    barrier = threading.Barrier(n_threads)
    errors: list[Exception] = []

    def worker(i: int) -> None:
        try:
            handle = PlankTable(spark, t.path)
            barrier.wait()
            for j in range(n_appends):
                base = 1000 * (i * n_appends + j + 1)
                handle.append(
                    spark.range(base, base + 5).select(F.col("id").alias("k"))
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    # linear history: versions 0..12 with no gaps, one CREATE + 12 APPENDs
    assert t.versions() == list(range(n_threads * n_appends + 1))
    ops = [h["operation"] for h in t.history()]
    assert ops == ["CREATE"] + ["APPEND"] * (n_threads * n_appends)
    # no lost update: every appended range present exactly once
    rows = sorted(r.k for r in t.read().collect())
    expected = sorted(
        list(range(10))
        + [
            base + d
            for i in range(n_threads)
            for j in range(n_appends)
            for base in [1000 * (i * n_appends + j + 1)]
            for d in range(5)
        ]
    )
    assert rows == expected


def test_concurrent_delete_of_same_files_fails_not_clobbers(spark, tmp_path):
    """Two writers deleting overlapping rows: the loser must raise
    ConcurrentModification (its target files were rewritten), never
    commit stale actions. Final state equals a serial execution."""
    import threading

    t = _mk(spark, tmp_path, "delrace")
    t.create(spark.range(0, 20).coalesce(1).select(F.col("id").alias("k")))
    barrier = threading.Barrier(2)
    outcomes: list[str] = []
    lock = threading.Lock()

    def worker(hi: int) -> None:
        handle = PlankTable(spark, t.path)
        # both handles resolve their rewrite against version 0,
        # then race the commit
        barrier.wait()
        try:
            handle.delete_where(F.col("k") < hi)
            with lock:
                outcomes.append("ok")
        except ConcurrentModification:
            with lock:
                outcomes.append("conflict")

    threads = [threading.Thread(target=worker, args=(hi,)) for hi in (5, 8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert sorted(outcomes) in (["conflict", "ok"], ["ok", "ok"]), outcomes
    rows = sorted(r.k for r in t.read().collect())
    if outcomes == ["ok", "ok"]:
        # commits serialized without overlap: both deletes applied
        assert rows == list(range(8, 20))
    else:
        # loser aborted: exactly one delete applied
        assert rows in (list(range(5, 20)), list(range(8, 20))), rows
    # whatever happened, no duplicate rows and no resurrected rows
    assert len(rows) == len(set(rows))


def test_append_during_delete_rebases_cleanly(spark, tmp_path):
    """An APPEND landing between a DELETE's snapshot and its commit:
    the delete retries (its target files are still live — appends
    are always compatible) and both commits survive."""
    t = _mk(spark, tmp_path, "adrace")
    t.create(spark.range(0, 10).coalesce(1).select(F.col("id").alias("k")))
    orig_commit = t._commit
    injected = {"done": False}

    def racing_commit(version, **kw):
        if not injected["done"] and kw.get("operation") == "DELETE":
            injected["done"] = True
            # a concurrent writer claims this version first
            other = PlankTable(spark, t.path)
            other.append(spark.range(100, 103).select(F.col("id").alias("k")))
        return orig_commit(version, **kw)

    t._commit = racing_commit
    t.delete_where(F.col("k") < 4)
    t._commit = orig_commit
    rows = sorted(r.k for r in t.read().collect())
    assert rows == list(range(4, 10)) + [100, 101, 102]
    ops = [h["operation"] for h in t.history()]
    assert ops == ["CREATE", "APPEND", "DELETE"]


def test_optimize_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-ORDER: after clustering on (x, y), a narrow scan on EITHER
    dimension must skip most files — range clustering on x alone
    leaves every file spanning y's full domain."""
    grid = spark.range(100 * 100).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("long").alias("y"),
    )
    tz = _mk(spark, tmp_path, "tz")
    tz.create(grid.repartition(8))
    tz.optimize(zorder_by=["x", "y"], num_files=16)
    assert len(tz.files()) == 16
    assert tz.read().count() == 10_000
    x_files = len(tz.scan({"x": (0, 5)}).inputFiles())
    y_files = len(tz.scan({"y": (0, 5)}).inputFiles())
    assert x_files <= 8, x_files
    assert y_files <= 8, y_files

    # contrast: 1-D range clustering on x cannot prune y-scans
    tx = _mk(spark, tmp_path, "tx")
    tx.create(grid.repartition(8))
    tx.optimize(sort_by=["x"], num_files=16)
    assert len(tx.scan({"x": (0, 5)}).inputFiles()) <= 2
    assert len(tx.scan({"y": (0, 5)}).inputFiles()) == 16

    with pytest.raises(ValueError, match="not both"):
        tz.optimize(sort_by=["x"], zorder_by=["y"])


def test_rename_column_rewrites_and_time_travels(spark, tmp_path):
    """planktable rename = content rewrite (file-derived schemas —
    the deliberate tradeoff vs Delta/Iceberg metadata-only renames);
    historic snapshots keep the old name."""
    from plankton_spark.table_format import PlankTable

    t = PlankTable(spark, str(tmp_path / "pt_rename"))
    t.create(spark.range(3).selectExpr("id AS k", "id*2 AS v"))
    v = t.rename_column("v", "val")
    got = sorted((r.k, r.val) for r in t.read().collect())
    assert got == [(0, 0), (1, 2), (2, 4)]
    old = t.read(version=v - 1)
    assert "v" in old.columns and "val" not in old.columns
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no column"):
        t.rename_column("zz", "yy")
    with _pytest.raises(ValueError, match="exists"):
        t.rename_column("k", "val")


def test_rename_column_aborts_on_concurrent_append(spark, tmp_path):
    """rename must preserve content EXACTLY: a concurrent append
    landing between the rewrite's read and its commit aborts the
    rename instead of silently tombstoning the new rows (r7 review-2
    #2)."""
    from plankton_spark.table_format import ConcurrentModification, PlankTable

    root = str(tmp_path / "pt_rename_race")
    t = PlankTable(spark, root)
    t.create(spark.range(3).selectExpr("id AS k", "id*2 AS v"))
    raced = {"done": False}
    orig = PlankTable._stage

    def stage_with_race(self, df):
        adds = orig(self, df)
        if not raced["done"]:
            raced["done"] = True
            PlankTable(spark, root).append(
                spark.createDataFrame([(100, 200)], "k long, v long")
            )
        return adds

    import plankton_spark.table_format as tf
    import pytest as _pytest

    try:
        tf.PlankTable._stage = stage_with_race
        with _pytest.raises(ConcurrentModification, match="rename"):
            t.rename_column("v", "val")
    finally:
        tf.PlankTable._stage = orig
    # the concurrent append's rows are intact, schema unchanged
    got = sorted((r.k, r.v) for r in PlankTable(spark, root).read().collect())
    assert got == [(0, 0), (1, 2), (2, 4), (100, 200)]


def test_drop_column_rewrites_and_time_travels(spark, tmp_path):
    """planktable drop = content rewrite (file-derived schemas);
    historic snapshots keep the column."""
    from plankton_spark.table_format import PlankTable

    t = PlankTable(spark, str(tmp_path / "pt_drop"))
    t.create(spark.range(3).selectExpr("id AS k", "id*2 AS v", "id*3 AS x"))
    v = t.drop_column("v")
    assert t.read().columns == ["k", "x"]
    got = sorted((r.k, r.x) for r in t.read().collect())
    assert got == [(0, 0), (1, 3), (2, 6)]
    old = t.read(version=v - 1)
    assert "v" in old.columns
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no column"):
        t.drop_column("zz")
    t2 = PlankTable(spark, str(tmp_path / "pt_drop1"))
    t2.create(spark.range(2).selectExpr("id AS k"))
    with _pytest.raises(ValueError, match="only column"):
        t2.drop_column("k")


def test_widen_column_rewrites_losslessly(spark, tmp_path):
    from plankton_spark.table_format import PlankTable

    t = PlankTable(spark, str(tmp_path / "pt_widen"))
    t.create(
        spark.range(3).selectExpr(
            "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS v"
        )
    )
    t.widen_column("k", "long")
    t.widen_column("v", "double")
    df = t.read()
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}
    assert sorted((r.k, r.v) for r in df.collect()) == [
        (0, 0.0), (1, 1.0), (2, 2.0)
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a lossless"):
        t.widen_column("k", "int")
    with _pytest.raises(ValueError, match="no column"):
        t.widen_column("zz", "long")
